"""Physics-step parity vs recorded PyTorch-reference trajectories.

Worlds here mirror tests/golden/gen_world_cases.py exactly. Constant action
forces/torques are written into state, the world is stepped T times, and every
entity's (pos, vel, rot, ang_vel) trajectory must match the reference within
float32 tolerance — the core of the fixed-seed trajectory-parity harness
(BASELINE.json "north_star").
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vmas_tpu.core import Agent, Box, Joint, Landmark, Line, Sphere, World

DATA = os.path.join(os.path.dirname(__file__), "golden", "data", "world_cases.npz")
B, T = 8, 25


def mk_world(name):
    if name == "free_body":
        w = World(B, gravity=(0.0, -0.05), drag=0.25)
        w.add_agent(Agent("a0", shape=Sphere(0.05), mass=2.0, gravity=(0.1, 0.0)))
        return w
    if name == "spheres_collide":
        w = World(B)
        w.add_agent(Agent("a0", shape=Sphere(0.1), mass=1.0))
        w.add_agent(Agent("a1", shape=Sphere(0.15), mass=2.0))
        return w
    if name == "sphere_box":
        w = World(B)
        w.add_agent(Agent("a0", shape=Sphere(0.05)))
        w.add_landmark(Landmark("box", shape=Box(length=0.3, width=0.2), movable=True, rotatable=True, mass=3.0))
        return w
    if name == "line_torque":
        w = World(B)
        w.add_agent(Agent("a0", shape=Sphere(0.05)))
        w.add_landmark(Landmark("line", shape=Line(length=0.6), movable=True, rotatable=True, mass=1.5))
        return w
    if name == "boxes":
        w = World(B)
        w.add_agent(Agent("a0", shape=Box(length=0.25, width=0.15), rotatable=True))
        w.add_landmark(Landmark("b2", shape=Box(length=0.3, width=0.1), movable=True, rotatable=True))
        return w
    if name == "box_line":
        w = World(B)
        w.add_agent(Agent("a0", shape=Box(length=0.25, width=0.15), rotatable=True))
        w.add_landmark(Landmark("l", shape=Line(length=0.5), movable=True, rotatable=True))
        return w
    if name == "friction":
        w = World(B, linear_friction=0.1, angular_friction=0.05)
        w.add_agent(Agent("a0", shape=Sphere(0.05), mass=1.5))
        return w
    if name == "clamps":
        w = World(B, x_semidim=0.8, y_semidim=0.6)
        w.add_agent(Agent("a0", shape=Sphere(0.05), max_speed=0.7, f_range=0.4))
        w.add_agent(Agent("a1", shape=Sphere(0.05), v_range=0.3, max_f=0.5, collide=False))
        return w
    if name == "joint_line":
        w = World(B, substeps=4)
        a0 = Agent("a0", shape=Sphere(0.05), mass=1.0)
        a1 = Agent("a1", shape=Sphere(0.05), mass=2.0)
        w.add_agent(a0)
        w.add_agent(a1)
        w.add_joint(Joint(a0, a1, anchor_a=(0, 0), anchor_b=(0, 0), dist=0.5, rotate_a=True, rotate_b=True))
        return w
    if name == "joint_fixed":
        w = World(B, substeps=4)
        a0 = Agent("a0", shape=Sphere(0.05), rotatable=True)
        a1 = Agent("a1", shape=Sphere(0.05), rotatable=True)
        w.add_agent(a0)
        w.add_agent(a1)
        w.add_joint(Joint(a0, a1, anchor_a=(0, 0), anchor_b=(0, 0), dist=0.4, rotate_a=False, rotate_b=True))
        return w
    raise KeyError(name)


CASES = [
    "free_body", "spheres_collide", "sphere_box", "line_torque", "boxes",
    "box_line", "friction", "clamps", "joint_line", "joint_fixed",
]


@pytest.fixture(scope="module")
def gold():
    return np.load(DATA)


@pytest.mark.parametrize("name", CASES)
def test_world_parity(gold, name):
    w = mk_world(name).finalize()
    E, A = len(w.entities), len(w.agents)

    state = w.spawn_state()
    state = state.replace(
        pos=jnp.asarray(gold[f"{name}_init_pos"]),
        vel=jnp.asarray(gold[f"{name}_init_vel"]),
        rot=jnp.asarray(gold[f"{name}_init_rot"]),
        ang_vel=jnp.asarray(gold[f"{name}_init_ang_vel"]),
    )
    state = w.sync_joints(state)

    force = jnp.asarray(gold[f"{name}_force"])
    torque = jnp.asarray(gold[f"{name}_torque"])
    agent_idx = np.asarray([a.index for a in w.agents], np.int32)

    def step(state, _):
        state = state.replace(
            force=state.force.at[:, agent_idx].set(force),
            torque=state.torque.at[:, agent_idx].set(torque),
        )
        state = w.step(state)
        out = jnp.concatenate(
            [state.pos, state.vel, state.rot[..., None], state.ang_vel[..., None]], axis=-1
        )
        return state, out

    _, traj = jax.jit(lambda s: jax.lax.scan(step, s, None, length=T))(state)
    traj = np.asarray(traj)
    ref = gold[f"{name}_traj"]

    # Contact dynamics are exponentially sensitive; f32 drift accumulates over
    # 25 steps, so tolerance loosens for the collision-heavy cases.
    atol = 2e-3 if any(k in name for k in ("joint", "box", "line", "spheres")) else 1e-4
    np.testing.assert_allclose(traj, ref, atol=atol, err_msg=name)


def test_gradients_through_rollout(gold):
    """Differentiability end-to-end (reference grad_enabled,
    tests/test_vmas.py:277-304): d(final pos)/d(initial force) is finite."""
    w = mk_world("spheres_collide").finalize()
    state = w.spawn_state()
    state = state.replace(
        pos=jnp.asarray(gold["spheres_collide_init_pos"]),
        vel=jnp.asarray(gold["spheres_collide_init_vel"]),
        rot=jnp.asarray(gold["spheres_collide_init_rot"]),
        ang_vel=jnp.asarray(gold["spheres_collide_init_ang_vel"]),
    )
    agent_idx = np.asarray([a.index for a in w.agents], np.int32)

    def loss(force):
        s = state
        for _ in range(5):
            s = s.replace(force=s.force.at[:, agent_idx].set(force))
            s = w.step(s)
        return jnp.sum(s.pos**2)

    g = jax.grad(loss)(jnp.asarray(gold["spheres_collide_force"]))
    assert np.isfinite(np.asarray(g)).all()
    assert np.abs(np.asarray(g)).sum() > 0
