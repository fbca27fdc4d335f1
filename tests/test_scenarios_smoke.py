"""Cross-scenario smoke/property matrix (reference tests/test_vmas.py:17-75).

Every implemented scenario x {continuous, discrete} stepped with random
actions; partial reset on each; obs/rew finite and correctly shaped.
"""

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
    # scratch keys created later than reset break lax.scan carries
    # (CLAUDE.md invariant); catch it at the smoke level
    keys_at_reset = sorted(env.state.scenario)
    for _ in range(5):
        obs, rews, dones, infos = env.step(env.get_random_actions())
    assert sorted(env.state.scenario) == keys_at_reset, (
        f"{scenario}: scenario scratch keys changed after reset "
        f"({sorted(set(env.state.scenario) ^ set(keys_at_reset))})"
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
