"""Cross-scenario smoke/property matrix (reference tests/test_vmas.py:17-75).

Every implemented scenario x {continuous, discrete} stepped with random
actions; partial reset on each; obs/rew finite and correctly shaped.
"""

import os
import importlib

import numpy as np
import pytest

from vmas_tpu import make_env
from vmas_tpu.scenarios import _names


def implemented_scenarios():
    out = []
    for name, module in sorted(_names().items()):
        try:
            importlib.import_module(module)
            out.append(name)
        except ModuleNotFoundError:
            pass
    return out

IMPLEMENTED = implemented_scenarios()


@pytest.mark.parametrize("scenario", IMPLEMENTED)
@pytest.mark.parametrize("continuous", [True, False])
def test_scenario_smoke(scenario, continuous):
    env = make_env(scenario, num_envs=3, seed=0, continuous_actions=continuous)
    # scratch whose keys/shapes/dtypes change after reset breaks lax.scan
    # carries (CLAUDE.md invariant); catch it at the smoke level
    import jax

    def scratch_sig(state):
        return jax.tree.map(lambda v: (v.shape, str(v.dtype)), state.scenario)

    sig_at_reset = scratch_sig(env.state)
    for _ in range(5):
        obs, rews, dones, infos = env.step(env.get_random_actions())
    sig_now = scratch_sig(env.state)
    assert sig_now == sig_at_reset, (
        f"{scenario}: scenario scratch structure changed after reset: "
        f"{ {k: (sig_at_reset.get(k), sig_now.get(k)) for k in set(sig_now) | set(sig_at_reset) if sig_at_reset.get(k) != sig_now.get(k)} }"
    )
    assert len(obs) == env.n_agents
    for o, r in zip(obs, rews):
        o = np.asarray(o)
        assert o.shape[0] == 3 and o.ndim == 2
        assert np.isfinite(o).all(), f"{scenario}: non-finite obs"
        r = np.asarray(r)
        assert r.shape == (3,)
        assert np.isfinite(r).all(), f"{scenario}: non-finite rew"
    assert np.asarray(dones).shape == (3,)
    # partial reset keeps other envs intact
    before = np.asarray(env.state.pos).copy()
    env.reset_at(2)
    after = np.asarray(env.state.pos)
    np.testing.assert_array_equal(before[0], after[0])


def test_registry_has_all_reference_scenarios():
    """Registry completeness (reference test_all_scenarios_included)."""
    names = set(_names())
    assert len(names) == 23 + 11 + 9


def test_scenario_kwargs_cover_reference():
    """Every scenario consumes at least the kwarg names its reference
    counterpart consumes (commented-out reference pops excluded) — a silent
    config gap would be invisible to the golden parity tests, which only
    replay recorded configs. Extra TPU-side kwargs (pallas_sweeps, ...) are
    fine."""
    import re

    refdir = "/root/reference/vmas/scenarios"
    if not os.path.isdir(refdir):
        pytest.skip("reference tree not mounted")

    def pops(path):
        names = set()
        for line in open(path):
            if line.lstrip().startswith("#"):
                continue
            names |= set(re.findall(r"kwargs\.pop\(\s*['\"]([a-z0-9_]+)['\"]", line))
        return names

    ours_dirs = [
        os.path.join(os.path.dirname(__file__), "..", "vmas_tpu", "scenarios", d)
        for d in ("", "mpe", "debug")
    ]
    gaps = {}
    for root, _, files in os.walk(refdir):
        for f in sorted(files):
            if not f.endswith(".py") or f == "__init__.py":
                continue
            ours = next(
                (os.path.join(d, f) for d in ours_dirs
                 if os.path.exists(os.path.join(d, f))), None
            )
            assert ours is not None, f"reference scenario {f} has no file here"
            missing = pops(os.path.join(root, f)) - pops(ours)
            if missing:
                gaps[f] = sorted(missing)
    assert not gaps, f"reference kwargs not consumed: {gaps}"
