"""Measure the PyTorch reference's physics throughput on this host's CPU.

Builds the BASELINE.json north-star config (transport: 4 sphere agents,
1 box package mass 50, goal) directly against the bootstrapped reference core
(the full reference env needs gym/pyglet, absent here) and times
World.step + the transport reward/observation math equivalents.

The resulting number is cached in bench.py as the vs_baseline denominator.
Run manually:  python tests/golden/measure_reference_cpu.py [num_envs]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(__file__))
from gen_reference_oracle import bootstrap_reference  # noqa: E402


def main(num_envs=4096, n_steps=50):
    import torch

    bootstrap_reference()
    from vmas.simulator.core import Agent, Box, Landmark, Sphere, World

    B = num_envs
    w = World(
        B, "cpu",
        x_semidim=1 + 2 * 0.03 + 0.15,
        y_semidim=1 + 2 * 0.03 + 0.15,
    )
    agents = [Agent(f"agent_{i}", shape=Sphere(0.03), u_multiplier=0.6) for i in range(4)]
    for a in agents:
        w.add_agent(a)
    goal = Landmark("goal", collide=False, shape=Sphere(radius=0.15))
    w.add_landmark(goal)
    package = Landmark(
        "package 0", collide=True, movable=True, mass=50, shape=Box(length=0.15, width=0.15)
    )
    w.add_landmark(package)

    torch.manual_seed(0)
    for e in w.entities:
        e.state.pos = torch.rand(B, 2) * 2 - 1
        e.state.vel = torch.zeros(B, 2)
        e.state.rot = torch.zeros(B, 1)
        e.state.ang_vel = torch.zeros(B, 1)

    def step_once():
        for a in agents:
            a.state.force = torch.rand(B, 2) * 1.2 - 0.6
            a.state.torque = torch.zeros(B, 1)
        w.step()
        # transport obs/reward equivalents (dist + overlap + per-agent obs cat)
        dist = torch.linalg.vector_norm(package.state.pos - goal.state.pos, dim=1)
        on_goal = w.is_overlapping(package, goal)
        for a in agents:
            torch.cat(
                [a.state.pos, a.state.vel,
                 package.state.pos - goal.state.pos,
                 package.state.pos - a.state.pos,
                 package.state.vel, on_goal.unsqueeze(-1)],
                dim=-1,
            )
        return dist

    step_once()  # warmup
    t0 = time.perf_counter()
    for _ in range(n_steps):
        step_once()
    dt = time.perf_counter() - t0
    rate = B * n_steps / dt
    print(f"reference torch-cpu transport: {rate:,.0f} env-steps/s "
          f"({n_steps} steps x {B} envs in {dt:.2f}s)")
    return rate


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 4096)
