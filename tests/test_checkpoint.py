"""Checkpoint/resume + profiling-helper tests (SURVEY.md §5 aux subsystems)."""

import numpy as np
import pytest

from vmas_tpu import make_env
from vmas_tpu.checkpoint import load_env, load_state, save_env, save_state
from vmas_tpu.profiling import StepTimer, benchmark_fn


def test_env_checkpoint_roundtrip(tmp_path):
    """Resumed env replays the exact same trajectory as the original."""
    path = str(tmp_path / "ckpt.npz")
    env = make_env("transport", num_envs=3, seed=4)
    env.step(env.get_random_actions())
    save_env(env, path)

    # diverge the original, then restore and replay with reseeded actions
    ref = make_env("transport", num_envs=3, seed=4)
    load_env(ref, path)
    np.testing.assert_array_equal(np.asarray(ref.state.pos), np.asarray(env.state.pos))
    np.testing.assert_array_equal(np.asarray(ref.steps), np.asarray(env.steps))

    obs_a = env.step(env.get_random_actions())[0]
    obs_b = ref.step(ref.get_random_actions())[0]
    for a, b in zip(obs_a, obs_b):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_checkpoint_extensionless_path(tmp_path):
    """save/load round-trip when the caller omits .npz (np.savez appends the
    suffix on save but np.load would not on load)."""
    path = str(tmp_path / "ckpt")  # no extension
    env = make_env("dispersion", num_envs=2, seed=1)
    save_env(env, path)
    load_env(env, path)


def test_env_checkpoint_orbax_roundtrip(tmp_path):
    """The orbax backend must handle zero-size leaves (comm state c[B,A,0]
    when dim_c=0 — orbax refuses zero-size arrays natively)."""
    path = str(tmp_path / "orbax_ck")
    env = make_env("transport", num_envs=2, seed=3)
    env.step(env.get_random_actions())
    pos_before = np.asarray(env.state.pos).copy()
    save_env(env, path, backend="orbax")
    other = make_env("transport", num_envs=2, seed=9)
    load_env(other, path, backend="orbax")
    np.testing.assert_array_equal(np.asarray(other.state.pos), pos_before)
    assert other.state.c.shape == env.state.c.shape  # zero-size leaf kept


def test_state_checkpoint_shape_mismatch(tmp_path):
    path = str(tmp_path / "ckpt.npz")
    env = make_env("transport", num_envs=3, seed=0)
    save_state(env.state, path)
    other = make_env("balance", num_envs=3, seed=0)
    with pytest.raises(ValueError):
        load_state(other.state, path)


def test_step_timer_and_benchmark():
    env = make_env("dispersion", num_envs=2, seed=0)
    timer = StepTimer()
    acts = env.get_random_actions()
    with timer.phase("step"):
        env.step(acts)
    s = timer.summary()
    assert s["step"]["count"] == 1 and s["step"]["total_s"] > 0

    mean_s, _ = benchmark_fn(lambda: env.step(acts), iters=2, warmup=1)
    assert mean_s > 0
    # warmup=0 measures the first call; iters<1 is rejected
    mean_s0, _ = benchmark_fn(lambda: env.step(acts), iters=1, warmup=0)
    assert mean_s0 > 0
    with pytest.raises(ValueError):
        benchmark_fn(lambda: None, iters=0)


def test_save_video_empty_raises(tmp_path):
    from vmas_tpu.render.video import save_video

    with pytest.raises(ValueError):
        save_video(str(tmp_path / "v"), [], fps=10)


def test_save_video_roundtrip(tmp_path):
    from vmas_tpu.render.video import save_video

    frames = [np.zeros((16, 16, 3), np.uint8) for _ in range(3)]
    out = save_video(str(tmp_path / "v"), frames, fps=10)
    import os

    assert os.path.exists(out) and os.path.getsize(out) > 0


def test_checkpoint_restores_onto_sharded_env(tmp_path):
    """Restoring into a mesh-distributed env keeps the env-axis sharding
    (a de-sharding restore would silently drop SPMD on the next step) and
    the resumed trajectory matches the original exactly."""
    import jax

    from vmas_tpu.parallel import distribute

    path = str(tmp_path / "sharded.npz")
    env = make_env("transport", num_envs=16, seed=4)
    distribute(env)
    env.step(env.get_random_actions())
    save_env(env, path)
    next_obs = env.step(env.get_random_actions())[0]

    other = make_env("transport", num_envs=16, seed=4)
    distribute(other)
    load_env(other, path)
    assert "env" in str(other.state.pos.sharding), other.state.pos.sharding
    # the PRNG key restored too, so the next random-action step replays
    resumed_obs = other.step(other.get_random_actions())[0]
    for a, b in zip(next_obs, resumed_obs):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # orbax backend: same sharding preservation, and the restored key must
    # not come back COMMITTED to one device (it would poison later jit calls)
    save_env(env, str(tmp_path / "orb"), backend="orbax")
    load_env(other, str(tmp_path / "orb"), backend="orbax")
    assert "env" in str(other.state.pos.sharding)
    other.step(other.get_random_actions())  # must not raise device conflicts
