"""vmas_tpu — a TPU-native vectorized multi-agent 2D physics simulator.

A from-scratch JAX/XLA re-design with the capabilities of VMAS
(/root/reference, robj0nes fork of proroklab/VectorizedMultiAgentSimulator
v1.5.0): fixed-shape [B, E] world state, one jitted step for physics +
observations + rewards, masked partial resets, env-axis sharding over TPU
meshes, and end-to-end differentiability.
"""

__version__ = "1.5.0"
__all__ = [
    "make_env",
    "render_interactively",
    "scenarios",
    "debug_scenarios",
    "mpe_scenarios",
]

from vmas_tpu.make_env import make_env
from vmas_tpu.environment import Wrapper
from vmas_tpu.scenarios import _DEBUG, _MAIN, _MPE

# Public name lists (reference vmas/__init__.py:22-82). Like the reference,
# the `scenarios` attribute shadows the scenarios subpackage.
scenarios = sorted(_MAIN)
debug_scenarios = sorted(_DEBUG)
mpe_scenarios = sorted(_MPE)


def render_interactively(*args, **kwargs):
    from vmas_tpu.render.interactive import render_interactively as _ri

    return _ri(*args, **kwargs)
