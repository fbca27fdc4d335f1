"""checkify-wrapped step (vmas_tpu/debug.py — SURVEY.md §5 sanitizer row)."""

import jax.numpy as jnp
import numpy as np
import pytest

from vmas_tpu import make_env
from vmas_tpu.debug import checked_step


def test_checked_step_clean():
    env = make_env("transport", num_envs=2, seed=0)
    step = checked_step(env)
    obs, rews, dones, infos = step(env.get_random_actions())
    assert np.isfinite(np.asarray(obs[0])).all()


def test_checked_step_catches_nan():
    env = make_env("transport", num_envs=2, seed=0)
    step = checked_step(env)
    env.state = env.state.replace(pos=env.state.pos.at[0, 0, 0].set(jnp.nan))
    with pytest.raises(Exception, match="non-finite|nan"):
        step(env.get_random_actions())


def test_checked_step_catches_inf():
    """Inf from overflow produces no NaN and no division — only the explicit
    output isfinite invariants can catch it."""
    env = make_env("transport", num_envs=2, seed=0)
    step = checked_step(env)
    env.state = env.state.replace(pos=env.state.pos.at[0, 0, 0].set(jnp.inf))
    with pytest.raises(Exception, match="non-finite|nan"):
        step(env.get_random_actions())
