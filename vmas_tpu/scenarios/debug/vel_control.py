"""Debug: PID velocity-controller tracking.

Behavioral reference: /root/reference/vmas/scenarios/debug/vel_control.py.
"""

from __future__ import annotations

import jax.numpy as jnp

from vmas_tpu.controllers import VelocityController
from vmas_tpu.core import Agent, Color, Landmark, World
from vmas_tpu.core.utils import JaxUtils, X, safe_norm
from vmas_tpu.scenario import BaseScenario
from vmas_tpu.utils import ScenarioUtils


class Scenario(BaseScenario):
    def make_world(self, batch_dim: int, device=None, **kwargs):
        self.green_mass = kwargs.pop("green_mass", 1)
        ScenarioUtils.check_kwargs_consumed(kwargs)
        self.plot_grid = True
        self.agent_radius = 0.16

        controller_params = [2, 6, 0.002]
        linear_friction = 0.1
        v_range = 1
        a_range = 1
        f_range = linear_friction + a_range
        u_range = v_range

        world = World(batch_dim, device, linear_friction=linear_friction, drag=0, dt=0.05, substeps=4)

        self.controllers = {}
        specs = [
            dict(name="agent 0", color=Color.GREEN, mass=self.green_mass, f_range=f_range),
            dict(name="agent 1", color=Color.BLUE, mass=1.0, f_range=None),
            dict(name="agent 2", color=Color.BLUE, mass=1.0, f_range=30),
        ]
        for s in specs:
            agent = Agent(
                name=s["name"], collide=False, color=s["color"], render_action=True,
                mass=s["mass"], f_range=s["f_range"], u_range=u_range,
            )
            world.add_agent(agent)
            self.controllers[agent.name] = VelocityController(agent, world, controller_params, "standard")

        self.landmark = Landmark("landmark 0", collide=False, movable=True)
        world.add_landmark(self.landmark)
        self.u_range = u_range
        return world

    def reset_world_at(self, state, key):
        B = state.batch_dim
        for agent in self.world.agents:
            state = self.controllers[agent.name].reset(state)
            state = agent.set_pos(state, jnp.broadcast_to(jnp.asarray([-1.0, 0.0]), (B, 2)))
        scratch = dict(state.scenario)
        scratch["energy_expenditure"] = jnp.zeros((B,), jnp.float32)
        return state.replace(scenario=scratch)

    def process_action(self, agent, state):
        u = JaxUtils.clamp_with_norm(agent.u(state), self.u_range)
        u = jnp.where((safe_norm(u) < 0.08)[:, None], 0.0, u)
        if agent is self.world.agents[1]:
            max_a = 1.0
            vel_goal = u[:, X]
            requested_a = (vel_goal - agent.vel(state)[:, X]) / self.world.dt
            achievable_a = jnp.clip(requested_a, -max_a, max_a)
            u = u.at[:, X].set(achievable_a * self.world.dt + agent.vel(state)[:, X])
        state = agent.set_u(state, u)
        return self.controllers[agent.name].process_force(state)

    def pre_rewards(self, state):
        scratch = dict(state.scenario)
        scratch["energy_expenditure"] = (
            -jnp.stack([safe_norm(a.u(state)) for a in self.world.agents], axis=1).sum(-1) * 3
        )
        return state.replace(scenario=scratch)

    def reward(self, agent, state):
        return state.scenario["energy_expenditure"]

    def observation(self, agent, state):
        return jnp.concatenate([agent.pos(state), agent.vel(state)], axis=-1)

    def info(self, agent, state):
        return {"energy_expenditure": state.scenario["energy_expenditure"]}
