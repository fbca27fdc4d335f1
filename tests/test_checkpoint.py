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


def test_state_checkpoint_shape_mismatch(tmp_path):
    path = str(tmp_path / "ckpt.npz")
    env = make_env("transport", num_envs=3, seed=0)
    save_state(env.state, path)
    other = make_env("balance", num_envs=3, seed=0)
    with pytest.raises(AssertionError):
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
