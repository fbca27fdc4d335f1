"""Differentiability matrix (reference test_vmas_differentiable,
tests/test_vmas.py:277-304).

Gradients must flow from late-rollout observations+rewards back to the FIRST
step's actions through the full env step (action decode -> dynamics ->
physics incl. contacts/joints -> obs/rew). The reference runs 10 torch steps
with grad_enabled for every main+MPE scenario except
football/simple_crypto/road_traffic; this matrix covers the same set at the
same depth. The rollout is a lax.scan over the env's own step (so each
scenario compiles one step, not ten) differentiated wrt the whole [T]-stacked
action sequence; the slice at t=0 is the reference's first-action gradient.

Scenarios in ZERO_GRAD_OK get finite-but-zero first-step gradients by
construction (rewards flow through argmin/boolean grid events whose gradient
is zero in torch as well); they still must be finite.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vmas_tpu import make_env
from vmas_tpu.scenarios import _names

T = 10
B = 2

# the reference's own exclusions (tests/test_vmas.py:279-283)
EXCLUDED = {"football", "simple_crypto", "road_traffic"}

# debug scenarios are not part of the reference matrix (it sweeps
# vmas.scenarios + vmas.mpe_scenarios only)
DEBUG = {
    "asym_joint", "circle_trajectory", "goal", "het_mass", "line_trajectory",
    "vel_control", "waterfall", "diff_drive", "kinematic_bicycle", "pollock",
    "drone",
}

# zero first-action gradient by construction (documented per scenario):
#   sampling    reward = visited-cell grid events (boolean)
#   discovery   covering reward = argmin/threshold target matching
ZERO_GRAD_OK = {"sampling", "discovery"}

MATRIX = sorted(set(_names()) - EXCLUDED - DEBUG)

# keep scenarios with huge worlds tractable on the CI host
SMALL_KWARGS = {
    "painting": dict(n_agents=2, n_goals=2),
}


def _random_action_stack(env, key):
    """[T, B, n]-stacked uniform continuous actions per agent (incl. comm)."""
    stacks = []
    for i, a in enumerate(env.agents):
        k = jax.random.fold_in(key, i)
        u = jax.random.uniform(
            k, (T, B, a.action_size), minval=-1.0, maxval=1.0
        ) * jnp.asarray(a.u_range_array)[None, None]
        if env.world.dim_c != 0 and not a.silent:
            comm = jax.random.uniform(
                jax.random.fold_in(k, 1), (T, B, env.world.dim_c)
            )
            u = jnp.concatenate([u, comm], axis=-1)
        stacks.append(u)
    return tuple(stacks)


@pytest.mark.parametrize("scenario", MATRIX)
def test_differentiable(scenario):
    env = make_env(scenario, num_envs=B, seed=0, grad_enabled=True,
                   **SMALL_KWARGS.get(scenario, {}))
    state0, steps0 = env.state, env.steps
    action_stack = _random_action_stack(env, jax.random.PRNGKey(7))
    step_keys = jax.random.split(jax.random.PRNGKey(8), T)

    def loss(action_stack):
        def body(carry, xs):
            state, steps = carry
            actions, k = xs
            state, obs, rews, terminated, truncated, infos, steps = (
                env._step_fn_raw(state, steps, actions, k)
            )
            if isinstance(obs[0], dict):
                obs_mean = sum(
                    jnp.mean(v) for o in obs for v in o.values()
                ) / sum(len(o) for o in obs)
            else:
                obs_mean = jnp.mean(jnp.concatenate([jnp.ravel(o) for o in obs]))
            rew_mean = jnp.mean(jnp.stack(rews))
            return (state, steps), obs_mean + rew_mean
        (_, _), per_step = jax.lax.scan(
            body, (state0, steps0), (action_stack, step_keys)
        )
        # the reference's loss: LAST step's obs.mean + rews.mean
        return per_step[-1]

    grads = jax.jit(jax.grad(loss))(action_stack)
    g_first = np.concatenate([np.asarray(g[0]).ravel() for g in grads])
    assert np.isfinite(g_first).all(), f"{scenario}: non-finite first-action grad"
    if scenario not in ZERO_GRAD_OK:
        assert np.abs(g_first).sum() > 0, f"{scenario}: zero first-action grad"


def test_matrix_matches_reference_sweep():
    """The matrix covers every main+MPE scenario the reference differentiates."""
    assert len(MATRIX) == 23 + 9 - len(EXCLUDED)
