"""Transport scenario — the north-star benchmark config (BASELINE.json).

Behavioral reference: /root/reference/vmas/scenarios/transport.py:14-190.
N agents push heavy box packages onto a goal; dense shaping reward. The
reference's per-package attributes (on_goal, global_shaping,
transport.py:112-161) are ``[B, P]`` scratch arrays and the ``is_first``
reward block is the pre_rewards hook.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from vmas_tpu.core import Agent, Box, Color, Landmark, Sphere, World
from vmas_tpu.core.utils import safe_norm
from vmas_tpu.scenario import BaseHeuristicPolicy, BaseScenario
from vmas_tpu.utils import ScenarioUtils


class Scenario(BaseScenario):
    def make_world(self, batch_dim: int, device=None, **kwargs):
        n_agents = kwargs.pop("n_agents", 4)
        self.n_packages = kwargs.pop("n_packages", 1)
        self.package_width = kwargs.pop("package_width", 0.15)
        self.package_length = kwargs.pop("package_length", 0.15)
        self.package_mass = kwargs.pop("package_mass", 50)
        ScenarioUtils.check_kwargs_consumed(kwargs)

        self.shaping_factor = 100
        self.world_semidim = 1
        self.agent_radius = 0.03

        world = World(
            batch_dim,
            device,
            x_semidim=self.world_semidim + 2 * self.agent_radius + max(self.package_length, self.package_width),
            y_semidim=self.world_semidim + 2 * self.agent_radius + max(self.package_length, self.package_width),
        )
        for i in range(n_agents):
            world.add_agent(
                Agent(name=f"agent_{i}", shape=Sphere(self.agent_radius), u_multiplier=0.6)
            )
        self.goal = Landmark(
            name="goal", collide=False, shape=Sphere(radius=0.15), color=Color.LIGHT_GREEN
        )
        world.add_landmark(self.goal)
        self.packages = []
        for i in range(self.n_packages):
            package = Landmark(
                name=f"package {i}",
                collide=True,
                movable=True,
                mass=self.package_mass,
                shape=Box(length=self.package_length, width=self.package_width),
                color=Color.RED,
            )
            package.goal = self.goal
            self.packages.append(package)
            world.add_landmark(package)
        return world

    # ------------------------------------------------------------------
    def reset_world_at(self, state, key):
        k1, k2 = jax.random.split(key)
        state = ScenarioUtils.spawn_entities_randomly(
            self.world.agents, self.world, state, k1,
            min_dist_between_entities=self.agent_radius * 2,
            x_bounds=(-self.world_semidim, self.world_semidim),
            y_bounds=(-self.world_semidim, self.world_semidim),
        )
        agent_idx = jnp.asarray([a.index for a in self.world.agents])
        agent_occupied = state.pos[:, agent_idx]
        state = ScenarioUtils.spawn_entities_randomly(
            [self.goal] + self.packages, self.world, state, k2,
            min_dist_between_entities=max(
                p.shape.circumscribed_radius() + self.goal.shape.radius + 0.01
                for p in self.packages
            ),
            x_bounds=(-self.world_semidim, self.world_semidim),
            y_bounds=(-self.world_semidim, self.world_semidim),
            occupied_positions=agent_occupied,
        )

        on_goal = jnp.stack(
            [self.world.is_overlapping(state, p, self.goal) for p in self.packages], axis=-1
        )
        global_shaping = (
            jnp.stack(
                [safe_norm(p.pos(state) - self.goal.pos(state)) for p in self.packages], axis=-1
            )
            * self.shaping_factor
        )
        scratch = dict(state.scenario)
        scratch["on_goal"] = on_goal  # [B, P]
        scratch["global_shaping"] = global_shaping  # [B, P]
        scratch["rew"] = jnp.zeros((state.batch_dim,), jnp.float32)
        return state.replace(scenario=scratch)

    # ------------------------------------------------------------------
    def pre_rewards(self, state):
        """The reference's is_first block (transport.py:131-161)."""
        scratch = dict(state.scenario)
        rew = jnp.zeros((state.batch_dim,), jnp.float32)
        dist_to_goal = jnp.stack(
            [safe_norm(p.pos(state) - self.goal.pos(state)) for p in self.packages], axis=-1
        )
        on_goal = jnp.stack(
            [self.world.is_overlapping(state, p, self.goal) for p in self.packages], axis=-1
        )
        package_shaping = dist_to_goal * self.shaping_factor
        rew = rew + jnp.where(
            ~on_goal, scratch["global_shaping"] - package_shaping, 0.0
        ).sum(axis=-1)
        scratch["global_shaping"] = package_shaping
        scratch["on_goal"] = on_goal
        scratch["rew"] = rew
        return state.replace(scenario=scratch)

    def reward(self, agent, state):
        return state.scenario["rew"]

    def observation(self, agent, state):
        obs = [agent.pos(state), agent.vel(state)]
        for i, package in enumerate(self.packages):
            obs.append(package.pos(state) - self.goal.pos(state))
            obs.append(package.pos(state) - agent.pos(state))
            obs.append(package.vel(state))
            obs.append(state.scenario["on_goal"][:, i : i + 1].astype(jnp.float32))
        return jnp.concatenate(obs, axis=-1)

    def done(self, state):
        return jnp.all(state.scenario["on_goal"], axis=-1)

    # ------------------------------------------------------------------
    def make_fused_outputs(self, world):
        """Emit transport's observations/reward/done as extra rows of the
        fused physics kernel (fused.FusedOutputs) — the output half of the
        step costs as much as the physics at bench scale. The row math
        mirrors pre_rewards/observation/done above line for line and is
        asserted equal to them by tests/test_fused.py."""
        from vmas_tpu.core import fused as F
        from vmas_tpu.core.utils import LINE_MIN_DIST

        agents = world.policy_agents
        A, P = len(agents), len(self.packages)
        goal_i = self.goal.index
        pkg_i = [p.index for p in self.packages]
        pkg_hw = [p.shape.width / 2 for p in self.packages]
        pkg_hl = [p.shape.length / 2 for p in self.packages]
        radius = float(self.goal.shape.radius)
        factor = float(self.shaping_factor)
        obs_w = 4 + 7 * P

        class TransportOutputs(F.FusedOutputs):
            n_scratch_in = P  # previous global_shaping per package
            n_out = A * obs_w + 1 + 2 * P
            # rows-carried rollout (fused.rows_step_supported): the next
            # step's scratch inputs are this step's emitted shaping rows
            carry_extra_idx = tuple(
                range(A * obs_w + 1 + P, A * obs_w + 1 + 2 * P)
            )

            @staticmethod
            def scratch_rows(state):
                return state.scenario["global_shaping"].T  # [P, B]

            @staticmethod
            def emit(ctx):
                px, py = ctx["px"], ctx["py"]
                vx, vy = ctx["vx"], ctx["vy"]
                rot = ctx["rot"]
                prev = ctx["scratch"]
                gx, gy = px[goal_i], py[goal_i]

                og, shaping, rew = [], [], None
                for k, pi in enumerate(pkg_i):
                    dx, dy = px[pi] - gx, py[pi] - gy
                    dist = F._norm(dx, dy)
                    # is_overlapping box-sphere (queries.py:82-93)
                    cos, sin = jnp.cos(rot[pi]), jnp.sin(rot[pi])
                    cx, cy = F._closest_point_box(
                        px[pi], py[pi], cos, sin, pkg_hw[k], pkg_hl[k], gx, gy
                    )
                    d_sphere_closest = F._norm(gx - cx, gy - cy)
                    d_closest_box = F._norm(px[pi] - cx, py[pi] - cy)
                    og_k = (dist < d_closest_box) | (
                        d_sphere_closest < radius + LINE_MIN_DIST
                    )
                    shaping_k = dist * factor
                    contrib = jnp.where(og_k, 0.0, prev[k] - shaping_k)
                    rew = contrib if rew is None else rew + contrib
                    og.append(og_k)
                    shaping.append(shaping_k)

                rows = []
                for a in agents:
                    ai = a.index
                    rows += [px[ai], py[ai], vx[ai], vy[ai]]
                    for k, pi in enumerate(pkg_i):
                        rows += [
                            px[pi] - gx, py[pi] - gy,
                            px[pi] - px[ai], py[pi] - py[ai],
                            vx[pi], vy[pi],
                            og[k].astype(jnp.float32),
                        ]
                rows.append(rew)
                rows += [o.astype(jnp.float32) for o in og]
                rows += shaping
                return rows

            @staticmethod
            def unpack(extra, state):
                obs = tuple(
                    extra[i * obs_w : (i + 1) * obs_w].T for i in range(A)
                )
                base = A * obs_w
                rew = extra[base]
                og = extra[base + 1 : base + 1 + P].T > 0.5  # [B, P]
                shaping = extra[base + 1 + P : base + 1 + 2 * P].T
                rews = tuple(rew for _ in range(A))
                terminated = jnp.all(og, axis=-1)
                updates = {"on_goal": og, "global_shaping": shaping, "rew": rew}
                return obs, rews, terminated, updates

        return TransportOutputs()


class HeuristicPolicy(BaseHeuristicPolicy):
    """Hermite-spline dribbling policy (reference transport.py:193-347)."""

    def __init__(self, *args, **kwargs):
        super().__init__(*args, **kwargs)
        self.lookahead = 0.0
        self.start_vel_dist_from_target_ratio = 0.5
        self.start_vel_behind_ratio = 0.5
        self.start_vel_mag = 1.0
        self.hit_vel_mag = 1.0
        self.package_radius = 0.15 / 2
        self.agent_radius = -0.02
        self.dribble_slowdown_dist = 0.0
        self.speed = 0.95

    def compute_action(self, observation, u_range):
        agent_pos = observation[:, :2]
        package_pos = observation[:, 6:8] + agent_pos
        goal_pos = -observation[:, 4:6] + package_pos
        control = self.dribble(agent_pos, package_pos, goal_pos)
        control = control * (self.speed * u_range)
        return jnp.clip(control, -u_range, u_range)

    @staticmethod
    def _unit(v):
        n = safe_norm(v)[:, None]
        return jnp.where(n == 0, 0.0, v / jnp.where(n == 0, 1.0, n))

    def dribble(self, agent_pos, package_pos, goal_pos):
        package_disp = goal_pos - package_pos
        direction = self._unit(package_disp)
        hit_pos = package_pos - direction * (self.package_radius + self.agent_radius)
        hit_vel = direction * self.hit_vel_mag
        start_vel = self.get_start_vel(hit_pos, hit_vel, agent_pos, self.start_vel_mag * 2)
        return self.get_action(
            target_pos=hit_pos, target_vel=hit_vel, curr_pos=agent_pos, start_vel=start_vel
        )

    def get_start_vel(self, pos, vel, start_pos, start_vel_mag):
        goal_disp = pos - start_pos
        goal_dist = safe_norm(goal_disp)
        vel_dir = self._unit(vel)
        goal_dir = self._unit(goal_disp)
        vel_dir_normal = jnp.stack([-vel_dir[:, 1], vel_dir[:, 0]], axis=1)
        dot_prod = jnp.sum(goal_dir * vel_dir_normal, axis=1)
        vel_dir_normal = jnp.where((dot_prod > 0)[:, None], -vel_dir_normal, vel_dir_normal)
        dist_behind = self.start_vel_dist_from_target_ratio * goal_dist
        point_dir = -vel_dir * self.start_vel_behind_ratio + vel_dir_normal * (
            1 - self.start_vel_behind_ratio
        )
        target_pos = pos + point_dir * dist_behind[:, None]
        start_vel_aug_dir = self._unit(target_pos - start_pos)
        return start_vel_aug_dir * start_vel_mag

    def get_action(self, target_pos, target_vel, curr_pos, start_vel):
        # hermite spline at u=0: pos = start_pos, vel = start_vel
        start_pos = curr_pos
        des_curr_pos = start_pos
        des_curr_vel = start_vel
        return 0.5 * (des_curr_pos - curr_pos) + 0.5 * (des_curr_vel - 0.0)
