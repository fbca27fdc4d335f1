"""Multi give-way scenario (4-way intersection swap with PID control).

Behavioral reference: /root/reference/vmas/scenarios/multi_give_way.py.
"""

from __future__ import annotations

import math

import jax.numpy as jnp

from vmas_tpu.controllers import VelocityController
from vmas_tpu.core import Agent, Box, Color, Landmark, Line, Sphere, World
from vmas_tpu.core.utils import JaxUtils, safe_norm
from vmas_tpu.scenario import BaseScenario
from vmas_tpu.utils import ScenarioUtils


class Scenario(BaseScenario):
    def make_world(self, batch_dim: int, device=None, **kwargs):
        self.u_range = kwargs.pop("u_range", 0.5)
        self.a_range = kwargs.pop("a_range", 1)
        self.obs_noise = kwargs.pop("obs_noise", 0)
        self.box_agents = kwargs.pop("box_agents", False)
        self.linear_friction = kwargs.pop("linear_friction", 0.1)
        self.min_input_norm = kwargs.pop("min_input_norm", 0.08)
        self.comms_range = kwargs.pop("comms_range", 5)
        self.shared_rew = kwargs.pop("shared_rew", True)
        kwargs.pop("n_agents", 4)
        self.pos_shaping_factor = kwargs.pop("pos_shaping_factor", 1)
        self.final_reward = kwargs.pop("final_reward", 0.01)
        self.agent_collision_penalty = kwargs.pop("agent_collision_penalty", -0.1)
        ScenarioUtils.check_kwargs_consumed(kwargs)

        self.viewer_zoom = 1.7
        controller_params = [2, 6, 0.002]
        self.n_agents = 4
        self.f_range = self.a_range + self.linear_friction

        world = World(
            batch_dim, device, drag=0, dt=0.1, linear_friction=self.linear_friction,
            substeps=16 if self.box_agents else 5,
            collision_force=10000 if self.box_agents else 500,
        )

        self.agent_radius = 0.16
        self.agent_box_length = 0.32
        self.agent_box_width = 0.24
        self.min_collision_distance = 0.005
        colors = [Color.GREEN, Color.BLUE, Color.RED, Color.GRAY]

        self.controllers = {}
        for i in range(self.n_agents):
            agent = Agent(
                name=f"agent_{i}", rotatable=False, linear_friction=self.linear_friction,
                shape=(
                    Sphere(radius=self.agent_radius)
                    if not self.box_agents
                    else Box(length=self.agent_box_length, width=self.agent_box_width)
                ),
                u_range=self.u_range, f_range=self.f_range, render_action=True,
                color=colors[i],
            )
            self.controllers[agent.name] = VelocityController(agent, world, controller_params, "standard")
            goal = Landmark(
                name=f"goal {i}", collide=False,
                shape=Sphere(radius=self.agent_radius / 2), color=colors[i],
            )
            agent.goal = goal
            world.add_agent(agent)
            world.add_landmark(goal)

        self.spawn_map(world)
        return world

    def spawn_map(self, world):
        self.scenario_length = 5
        self.scenario_width = 0.4
        self.long_wall_length = (self.scenario_length / 2) - (self.scenario_width / 2)
        self.short_wall_length = self.scenario_width
        self.goal_dist_from_wall = self.agent_radius + 0.05
        self.agent_dist_from_wall = 0.5
        self.long_walls = []
        for i in range(8):
            lm = Landmark(name=f"wall {i}", collide=True, shape=Line(length=self.long_wall_length), color=Color.BLACK)
            self.long_walls.append(lm)
            world.add_landmark(lm)
        self.short_walls = []
        for i in range(4):
            lm = Landmark(name=f"short wall {i}", collide=True, shape=Line(length=self.short_wall_length), color=Color.BLACK)
            self.short_walls.append(lm)
            world.add_landmark(lm)

    def reset_map(self, state):
        half = self.scenario_length / 2
        for i, lm in enumerate(self.short_walls):
            if i < 2:
                state = lm.set_pos(state, jnp.asarray([-half if i % 2 == 0 else half, 0.0], jnp.float32))
                state = lm.set_rot(state, jnp.asarray(math.pi / 2, jnp.float32))
            else:
                state = lm.set_pos(state, jnp.asarray([0.0, -half if i % 2 == 0 else half], jnp.float32))
        long_wall_pos = self.long_wall_length / 2 - half
        for i, lm in enumerate(self.long_walls):
            if i < 4:
                state = lm.set_pos(
                    state,
                    jnp.asarray(
                        [long_wall_pos * (1 if i < 2 else -1),
                         self.scenario_width / 2 * (-1 if i % 2 == 0 else 1)],
                        jnp.float32,
                    ),
                )
            else:
                state = lm.set_pos(
                    state,
                    jnp.asarray(
                        [self.scenario_width / 2 * (-1 if i % 2 == 0 else 1),
                         long_wall_pos * (1 if i < 6 else -1)],
                        jnp.float32,
                    ),
                )
                state = lm.set_rot(state, jnp.asarray(math.pi / 2, jnp.float32))
        return state

    def reset_world_at(self, state, key):
        B = state.batch_dim
        start = self.scenario_length / 2 - self.agent_dist_from_wall
        goal_d = self.scenario_length / 2 - self.goal_dist_from_wall
        for i, agent in enumerate(self.world.agents):
            state = self.controllers[agent.name].reset(state)
            next_i = (i + 1) % self.n_agents
            if i in [0, 2]:
                state = agent.set_pos(state, jnp.asarray([start * (-1 if i == 0 else 1), 0.0], jnp.float32))
                state = self.world.agents[next_i].goal.set_pos(
                    state, jnp.asarray([goal_d * (-1 if i == 0 else 1), 0.0], jnp.float32)
                )
            else:
                state = agent.set_pos(state, jnp.asarray([0.0, start * (1 if i == 1 else -1)], jnp.float32))
                state = self.world.agents[next_i].goal.set_pos(
                    state, jnp.asarray([0.0, goal_d * (1 if i == 1 else -1)], jnp.float32)
                )
        state = self.reset_map(state)

        scratch = dict(state.scenario)
        scratch["shaping"] = jnp.stack(
            [
                safe_norm(a.pos(state) - a.goal.pos(state)) * self.pos_shaping_factor
                for a in self.world.agents
            ],
            axis=-1,
        )
        scratch["reached_goal"] = jnp.zeros((B,), bool)
        scratch["pos_rew"] = jnp.zeros((B,), jnp.float32)
        scratch["pos_rew_per_agent"] = jnp.zeros((B, self.n_agents), jnp.float32)
        scratch["final_rew"] = jnp.zeros((B,), jnp.float32)
        return state.replace(scenario=scratch)

    def process_action(self, agent, state):
        u = JaxUtils.clamp_with_norm(agent.u(state), self.u_range)
        u = jnp.where((safe_norm(u) < self.min_input_norm)[:, None], 0.0, u)
        state = agent.set_u(state, u)
        vc = self.controllers[agent.name]
        state = vc.reset(state, env_mask=safe_norm(u) < 1e-3)
        return vc.process_force(state)

    def pre_rewards(self, state):
        scratch = dict(state.scenario)
        dist = jnp.stack(
            [safe_norm(a.pos(state) - a.goal.pos(state)) for a in self.world.agents], axis=-1
        )
        on_goal = dist < jnp.asarray([a.goal.shape.radius for a in self.world.agents])[None]
        pos_shaping = dist * self.pos_shaping_factor
        if self.pos_shaping_factor != 0:
            per_agent = scratch["shaping"] - pos_shaping
        else:
            per_agent = -dist * 0.0001
        scratch["shaping"] = pos_shaping
        scratch["pos_rew_per_agent"] = per_agent
        scratch["pos_rew"] = per_agent.sum(-1)
        all_reached = jnp.all(on_goal, axis=-1)
        scratch["final_rew"] = jnp.where(all_reached, self.final_reward, 0.0)
        scratch["reached_goal"] = scratch["reached_goal"] | all_reached
        return state.replace(scenario=scratch)

    def reward(self, agent, state):
        s = state.scenario
        B = state.batch_dim
        coll = jnp.zeros((B,), jnp.float32)
        for a in self.world.agents:
            if a is not agent:
                hit = self.world.get_distance(state, agent, a) <= self.min_collision_distance
                coll = coll + self.agent_collision_penalty * hit.astype(jnp.float32)
        pos = s["pos_rew"] if self.shared_rew else s["pos_rew_per_agent"][:, agent.slot]
        return pos + coll + s["final_rew"]

    def observation(self, agent, state):
        observations = [
            agent.pos(state),
            agent.vel(state),
            agent.pos(state) - agent.goal.pos(state),
            safe_norm(agent.pos(state) - agent.goal.pos(state))[:, None],
        ]
        if self.obs_noise > 0:
            import jax

            observations = [
                o + jax.random.uniform(
                    self.obs_key(state, agent.slot * 10 + i), o.shape,
                    minval=-self.obs_noise, maxval=self.obs_noise,
                )
                for i, o in enumerate(observations)
            ]
        return jnp.concatenate(observations, axis=-1)

    def info(self, agent, state):
        s = state.scenario
        return {
            "pos_rew": s["pos_rew"] if self.shared_rew else s["pos_rew_per_agent"][:, agent.slot],
            "final_rew": s["final_rew"],
        }

    def extra_render(self, env, ax, env_index: int = 0):
        """Agent communication lines (reference multi_give_way.py extra_render)."""
        from vmas_tpu.render import draw

        draw.draw_comm_lines(ax, env, env.state, env_index, self.comms_range)
