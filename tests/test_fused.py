"""Fused pallas physics step vs the XLA path (vmas_tpu/core/fused.py).

Runs both paths from identical randomized states on scenarios covering every
shape-pair kernel, and asserts near-bitwise agreement over multi-step
rollouts. On CPU the pallas kernel executes in interpret mode — same math,
same unrolled program.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vmas_tpu import make_env

# scenario -> pair kernels it exercises
CASES = {
    "dispersion": "ss (agents)",
    "transport": "ss + box-sphere (movable box, clamps)",
    "balance": "line-sphere + box walls + gravity",
    "wheel": "line torque dynamics",
    "reverse_transport": "box-sphere non-hollow + box-box",
    "passage": "box landmarks + ss",
    "kinematic_bicycle": "box-box contact, substeps=10",
    "pollock": "ss + ls + ll + bs + bl + bb soup",
    "wind_flocking": "per-env dynamic gravity + linear friction",
}
KWARGS = {
    "pollock": dict(n_agents=4, n_lines=4, n_boxes=4),
    "transport": dict(n_agents=3),
}


def _randomized(env, key):
    st = env.state
    k1, k2, k3, k4 = jax.random.split(key, 4)
    B, E = st.pos.shape[:2]
    return st.replace(
        pos=st.pos + jax.random.normal(k1, st.pos.shape) * 0.05,
        vel=jax.random.normal(k2, st.vel.shape) * 0.3,
        ang_vel=st.ang_vel + jax.random.normal(k3, st.ang_vel.shape) * 0.2,
        force=jax.random.normal(k4, st.force.shape) * 0.5,
        torque=jax.random.normal(k4, st.torque.shape) * 0.2,
    )


@pytest.mark.parametrize("scenario", sorted(CASES))
def test_fused_matches_xla(scenario):
    env = make_env(scenario, num_envs=7, seed=3, **KWARGS.get(scenario, {}))
    world = env.world
    state = _randomized(env, jax.random.PRNGKey(42))

    ref = state
    fus = state
    world.fused = False
    step_ref = jax.jit(world.step)
    world.fused = True
    step_fus = jax.jit(world.step)
    world.fused = False

    for t in range(5):
        ref = step_ref(ref)
        fus = step_fus(fus)
        for name in ("pos", "vel", "rot", "ang_vel", "force", "torque"):
            np.testing.assert_allclose(
                np.asarray(getattr(fus, name)),
                np.asarray(getattr(ref, name)),
                atol=1e-5, rtol=1e-5,
                err_msg=f"{scenario}: {name} diverged at step {t}",
            )


def test_fused_composes_with_env_sharding():
    """fused physics under an env-axis mesh: the pallas grid only blocks the
    lane (env) axis, so pjit partitions it per shard."""
    from vmas_tpu.parallel import distribute

    env = make_env("transport", num_envs=64, seed=0, fused_physics=True)
    distribute(env)
    for _ in range(2):
        obs, rews, dones, infos = env.step(env.get_random_actions())
    assert np.isfinite(np.asarray(obs[0])).all()
    assert "env" in str(env.state.pos.sharding)


def test_fused_joints_match_xla():
    """joint constraint forces + fixed-rotation torques in the fused kernel
    (joint_passage: rigid two-agent joint through a passage, substeps)."""
    env = make_env("joint_passage", num_envs=5, seed=1)
    world = env.world
    state = _randomized(env, jax.random.PRNGKey(8))
    world.fused = False
    step_ref = jax.jit(world.step)
    world.fused = True
    step_fus = jax.jit(world.step)
    world.fused = False
    ref = fus = state
    for t in range(4):
        ref = step_ref(ref)
        fus = step_fus(fus)
        for name in ("pos", "vel", "rot", "ang_vel"):
            np.testing.assert_allclose(
                np.asarray(getattr(fus, name)), np.asarray(getattr(ref, name)),
                atol=2e-5, rtol=1e-5, err_msg=f"joints: {name} diverged at step {t}",
            )

