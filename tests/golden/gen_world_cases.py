"""Record reference world-step trajectories as golden data.

Builds small PyTorch-reference worlds (via the stub-package bootstrap in
gen_reference_oracle), writes constant action forces/torques directly into the
agent states, steps N times, and records every entity's trajectory. The test
suite rebuilds the identical worlds with vmas_tpu and compares trajectories —
the fixed-seed physics-parity harness demanded by BASELINE.json.

Run manually:  python tests/golden/gen_world_cases.py
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(__file__))
from gen_reference_oracle import OUT, bootstrap_reference  # noqa: E402

B = 8
T = 25
SEED = 7


def case_worlds():
    """Yield (name, world, agents). Mirrored exactly in tests/test_world_parity.py."""
    import torch

    from vmas.simulator.core import Agent, Box, Landmark, Line, Sphere, World
    from vmas.simulator.joints import Joint

    def mk(name):
        if name == "free_body":
            w = World(B, "cpu", gravity=(0.0, -0.05), drag=0.25)
            a = Agent("a0", shape=Sphere(0.05), mass=2.0)
            a.gravity = torch.tensor([0.1, 0.0])
            w.add_agent(a)
            return w
        if name == "spheres_collide":
            w = World(B, "cpu")
            w.add_agent(Agent("a0", shape=Sphere(0.1), mass=1.0))
            w.add_agent(Agent("a1", shape=Sphere(0.15), mass=2.0))
            return w
        if name == "sphere_box":
            w = World(B, "cpu")
            w.add_agent(Agent("a0", shape=Sphere(0.05)))
            w.add_landmark(
                Landmark("box", shape=Box(length=0.3, width=0.2), movable=True, rotatable=True, mass=3.0)
            )
            return w
        if name == "line_torque":
            w = World(B, "cpu")
            w.add_agent(Agent("a0", shape=Sphere(0.05)))
            w.add_landmark(Landmark("line", shape=Line(length=0.6), movable=True, rotatable=True, mass=1.5))
            return w
        if name == "boxes":
            w = World(B, "cpu")
            w.add_agent(Agent("a0", shape=Box(length=0.25, width=0.15), rotatable=True))
            w.add_landmark(Landmark("b2", shape=Box(length=0.3, width=0.1), movable=True, rotatable=True))
            return w
        if name == "box_line":
            w = World(B, "cpu")
            w.add_agent(Agent("a0", shape=Box(length=0.25, width=0.15), rotatable=True))
            w.add_landmark(Landmark("l", shape=Line(length=0.5), movable=True, rotatable=True))
            return w
        if name == "friction":
            w = World(B, "cpu", linear_friction=0.1, angular_friction=0.05)
            w.add_agent(Agent("a0", shape=Sphere(0.05), mass=1.5))
            return w
        if name == "clamps":
            w = World(B, "cpu", x_semidim=0.8, y_semidim=0.6)
            w.add_agent(Agent("a0", shape=Sphere(0.05), max_speed=0.7, f_range=0.4))
            w.add_agent(Agent("a1", shape=Sphere(0.05), v_range=0.3, max_f=0.5, collide=False))
            return w
        if name == "joint_line":
            w = World(B, "cpu", substeps=4)
            a0 = Agent("a0", shape=Sphere(0.05), mass=1.0)
            a1 = Agent("a1", shape=Sphere(0.05), mass=2.0)
            w.add_agent(a0)
            w.add_agent(a1)
            w.add_joint(
                Joint(a0, a1, anchor_a=(0, 0), anchor_b=(0, 0), dist=0.5, rotate_a=True, rotate_b=True)
            )
            return w
        if name == "joint_fixed":
            w = World(B, "cpu", substeps=4)
            a0 = Agent("a0", shape=Sphere(0.05), rotatable=True)
            a1 = Agent("a1", shape=Sphere(0.05), rotatable=True)
            w.add_agent(a0)
            w.add_agent(a1)
            w.add_joint(
                Joint(a0, a1, anchor_a=(0, 0), anchor_b=(0, 0), dist=0.4, rotate_a=False, rotate_b=True)
            )
            return w
        raise KeyError(name)

    for name in [
        "free_body", "spheres_collide", "sphere_box", "line_torque", "boxes",
        "box_line", "friction", "clamps", "joint_line", "joint_fixed",
    ]:
        yield name, mk(name)


def main():
    import torch

    bootstrap_reference()

    rng = np.random.RandomState(SEED)
    data = {}
    for name, world in case_worlds():
        entities = world.entities
        E, A = len(entities), len(world.agents)
        init_pos = rng.uniform(-0.5, 0.5, (B, E, 2)).astype(np.float32)
        init_vel = rng.uniform(-0.3, 0.3, (B, E, 2)).astype(np.float32)
        init_rot = rng.uniform(-np.pi, np.pi, (B, E)).astype(np.float32)
        init_ang_vel = rng.uniform(-0.5, 0.5, (B, E)).astype(np.float32)
        force = rng.uniform(-0.5, 0.5, (B, A, 2)).astype(np.float32)
        torque = rng.uniform(-0.2, 0.2, (B, A)).astype(np.float32)
        if name.startswith("joint"):
            # Entity order is [joint landmark, a0, a1]; keep the joined agents
            # near the joint distance so constraint forces stay well-behaved.
            init_pos[:, 2] = init_pos[:, 1] + np.float32(
                [0.5 if name == "joint_line" else 0.4, 0.0]
            ) + rng.uniform(-0.05, 0.05, (B, 2)).astype(np.float32)

        for i, e in enumerate(entities):
            e.state.pos = torch.from_numpy(init_pos[:, i].copy())
            e.state.vel = torch.from_numpy(init_vel[:, i].copy())
            e.state.rot = torch.from_numpy(init_rot[:, i : i + 1].copy())
            e.state.ang_vel = torch.from_numpy(init_ang_vel[:, i : i + 1].copy())
        # Joint landmarks get re-posed by the Observer on set_pos; do it the
        # reference way by notifying via set_pos on the joined entities.
        for i, e in enumerate(entities):
            e.set_pos(torch.from_numpy(init_pos[:, i].copy()), batch_index=None)
            e.set_rot(torch.from_numpy(init_rot[:, i : i + 1].copy()), batch_index=None)

        traj = np.zeros((T, B, E, 6), np.float32)
        for t in range(T):
            for s, agent in enumerate(world.agents):
                agent.state.force = torch.from_numpy(force[:, s].copy())
                agent.state.torque = torch.from_numpy(torque[:, s : s + 1].copy())
            world.step()
            for i, e in enumerate(entities):
                traj[t, :, i, 0:2] = e.state.pos.numpy()
                traj[t, :, i, 2:4] = e.state.vel.numpy()
                traj[t, :, i, 4] = e.state.rot.numpy()[:, 0]
                traj[t, :, i, 5] = e.state.ang_vel.numpy()[:, 0]

        data[f"{name}_init_pos"] = init_pos
        data[f"{name}_init_vel"] = init_vel
        data[f"{name}_init_rot"] = init_rot
        data[f"{name}_init_ang_vel"] = init_ang_vel
        data[f"{name}_force"] = force
        data[f"{name}_torque"] = torque
        data[f"{name}_traj"] = traj
        print(f"{name}: E={E} A={A} traj={traj.shape}")

    os.makedirs(OUT, exist_ok=True)
    np.savez_compressed(os.path.join(OUT, "world_cases.npz"), **data)
    print("wrote world_cases.npz")


if __name__ == "__main__":
    main()
