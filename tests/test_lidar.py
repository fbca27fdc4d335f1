"""Lidar / ray-cast correctness.

1. Batched cast_rays vs the recorded PyTorch-reference oracle on a mixed
   box/sphere/line world.
2. Vectorized-vs-loop lidar equivalence on the pollock scenario
   (reference tests/test_lidar.py:10-28).
"""

import os

import jax.numpy as jnp
import numpy as np
import pytest

from vmas_tpu import make_env
from vmas_tpu.core import Agent, Box, Landmark, Line, Sphere, World

DATA = os.path.join(os.path.dirname(__file__), "golden", "data", "raycast.npz")


def test_cast_rays_vs_reference_oracle():
    gold = np.load(DATA)
    B = gold["angles"].shape[0]
    w = World(B)
    w.add_agent(Agent("a0", shape=Sphere(0.05)))
    w.add_landmark(Landmark("box", shape=Box(length=0.4, width=0.2)))
    w.add_landmark(Landmark("sph", shape=Sphere(0.25)))
    w.add_landmark(Landmark("lin", shape=Line(length=0.7)))
    w.finalize()
    state = w.spawn_state()
    state = state.replace(pos=jnp.asarray(gold["pos"]), rot=jnp.asarray(gold["rot"]))
    dist = w.cast_rays(
        state, w.agents[0], jnp.asarray(gold["angles"]), max_range=2.0,
        entity_filter=lambda e: True,
    )
    np.testing.assert_allclose(np.asarray(dist), gold["dist"], atol=1e-4)


@pytest.mark.parametrize("scenario_kwargs", [dict(vectorized_lidar=True), dict(vectorized_lidar=False)])
def test_pollock_lidar_runs(scenario_kwargs):
    env = make_env(
        "pollock", num_envs=2, seed=0, lidar=True,
        n_agents=4, n_lines=3, n_boxes=3, **scenario_kwargs
    )
    obs = env.step(env.get_random_actions())[0]
    assert np.isfinite(np.asarray(obs[0])).all()


def test_pollock_vectorized_lidar_equivalence():
    """Vectorized and per-ray lidar must agree (reference test_lidar.py:10-28)."""
    kwargs = dict(lidar=True, n_agents=4, n_lines=3, n_boxes=3)
    env_v = make_env("pollock", num_envs=2, seed=5, vectorized_lidar=True, **kwargs)
    env_l = make_env("pollock", num_envs=2, seed=5, vectorized_lidar=False, **kwargs)
    o_v = env_v.reset(seed=5)
    o_l = env_l.reset(seed=5)
    for a, b in zip(o_v, o_l):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)
    acts = env_v.get_random_actions()
    o_v = env_v.step(acts)[0]
    o_l = env_l.step(acts)[0]
    for a, b in zip(o_v, o_l):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)
