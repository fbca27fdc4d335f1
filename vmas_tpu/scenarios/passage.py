"""Passage scenario.

Behavioral reference: /root/reference/vmas/scenarios/passage.py. A cross of 5
agents must traverse a wall with n open passages to a mirrored goal cross.

The reference's host-side ``torch.randperm`` orderings (passage.py:112-114,
202-203) become per-env jax permutations (each env gets its own arrangement —
the batched generalization). The shared-reward mode's accumulating collision
penalty (reference self.rew mutation across per-agent reward() calls,
passage.py:252-258) is reproduced with a cumulative sum over agent order.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from vmas_tpu.core import Agent, Box, Color, Landmark, Sphere, World
from vmas_tpu.core.utils import safe_norm
from vmas_tpu.scenario import BaseScenario
from vmas_tpu.utils import ScenarioUtils


class Scenario(BaseScenario):
    def make_world(self, batch_dim: int, device=None, **kwargs):
        self.n_passages = kwargs.pop("n_passages", 1)
        self.shared_reward = kwargs.pop("shared_reward", False)
        ScenarioUtils.check_kwargs_consumed(kwargs)
        assert 1 <= self.n_passages <= 20

        self.shaping_factor = 100
        self.n_agents = 5
        self.agent_radius = 0.03333
        self.agent_spacing = 0.1
        self.passage_width = 0.2
        self.passage_length = 0.103
        self.visualize_semidims = False

        world = World(batch_dim, device, x_semidim=1, y_semidim=1)
        for i in range(self.n_agents):
            agent = Agent(name=f"agent_{i}", shape=Sphere(self.agent_radius), u_multiplier=0.7)
            world.add_agent(agent)
            goal = Landmark(
                name=f"goal {i}", collide=False, shape=Sphere(radius=self.agent_radius),
                color=Color.LIGHT_GREEN,
            )
            agent.goal = goal
            world.add_landmark(goal)
        self.passages = []
        n_boxes = int((2 * world.x_semidim + 2 * self.agent_radius) // self.passage_length)
        for i in range(n_boxes):
            removed = i < self.n_passages
            passage = Landmark(
                name=f"passage {i}", collide=not removed, movable=False,
                shape=Box(length=self.passage_length, width=self.passage_width),
                color=Color.RED,
                collision_filter=lambda e: not isinstance(e.shape, Box),
            )
            world.add_landmark(passage)
            self.passages.append(passage)
        return world

    @staticmethod
    def _offset(i, n, spacing):
        if i == n - 1:
            return (0.0, 0.0)
        x = 0.0 if i % 2 else (spacing if i == 0 else -spacing)
        y = 0.0 if not i % 2 else (spacing if i == 1 else -spacing)
        return (x, y)

    def reset_world_at(self, state, key):
        B = state.batch_dim
        k1, k2, k3, k4 = jax.random.split(key, 4)
        m = 3 * self.agent_radius + self.agent_spacing
        central_agent_pos = jnp.stack(
            [
                jax.random.uniform(k1, (B,), minval=-1 + m, maxval=1 - m),
                jax.random.uniform(jax.random.fold_in(k1, 1), (B,), minval=-1 + m,
                                   maxval=-m - self.passage_width / 2),
            ],
            axis=-1,
        )
        central_goal_pos = jnp.stack(
            [
                jax.random.uniform(k2, (B,), minval=-1 + m, maxval=1 - m),
                jax.random.uniform(jax.random.fold_in(k2, 1), (B,),
                                   minval=m + self.passage_width / 2, maxval=1 - m),
            ],
            axis=-1,
        )

        offsets = jnp.asarray(
            [self._offset(i, self.n_agents, self.agent_spacing) for i in range(self.n_agents)],
            jnp.float32,
        )  # [A, 2]
        perm = jax.random.permutation(
            k3, jnp.broadcast_to(jnp.arange(self.n_agents), (B, self.n_agents)),
            axis=1, independent=True,
        )  # [B, A]: slot index per agent
        agent_offsets = offsets[perm]  # [B, A, 2]

        shaping = []
        for i, agent in enumerate(self.world.agents):
            state = agent.set_pos(state, central_agent_pos + agent_offsets[:, i])
            state = agent.goal.set_pos(state, central_goal_pos + agent_offsets[:, i])
            shaping.append(safe_norm(agent.pos(state) - agent.goal.pos(state)) * self.shaping_factor)

        # passage x-slot permutation (per env)
        n_boxes = len(self.passages)
        slot_x = (
            -1 - self.agent_radius + self.passage_length / 2
            + self.passage_length * jnp.arange(n_boxes, dtype=jnp.float32)
        )
        pperm = jax.random.permutation(
            k4, jnp.broadcast_to(jnp.arange(n_boxes), (B, n_boxes)), axis=1, independent=True
        )
        for i, passage in enumerate(self.passages):
            x = slot_x[pperm[:, i]]
            state = passage.set_pos(state, jnp.stack([x, jnp.zeros((B,))], axis=-1))
            if not passage.collide:
                state = passage.set_rendering(state, False)

        scratch = dict(state.scenario)
        scratch["global_shaping"] = jnp.stack(shaping, axis=-1)  # [B, A]
        scratch["shaping_rew"] = jnp.zeros((B, self.n_agents), jnp.float32)
        scratch["collision_pen"] = jnp.zeros((B, self.n_agents), jnp.float32)
        return state.replace(scenario=scratch)

    def pre_rewards(self, state):
        scratch = dict(state.scenario)
        dist = jnp.stack(
            [safe_norm(a.pos(state) - a.goal.pos(state)) for a in self.world.agents], axis=-1
        )
        agent_shaping = dist * self.shaping_factor
        scratch["shaping_rew"] = scratch["global_shaping"] - agent_shaping  # [B, A]
        scratch["global_shaping"] = agent_shaping

        penalties = []
        for agent in self.world.agents:
            p = jnp.zeros((state.batch_dim,), jnp.float32)
            if agent.collide:
                for a in self.world.agents:
                    if a is not agent:
                        p = p - 10.0 * self.world.is_overlapping(state, a, agent).astype(jnp.float32)
                for passage in self.passages:
                    if passage.collide:
                        p = p - 10.0 * self.world.is_overlapping(state, agent, passage).astype(jnp.float32)
            penalties.append(p)
        scratch["collision_pen"] = jnp.stack(penalties, axis=-1)  # [B, A]
        return state.replace(scenario=scratch)

    def reward(self, agent, state):
        s = state.scenario
        i = agent.slot
        if self.shared_reward:
            # reference accumulates penalties into the shared rew across the
            # per-agent reward() calls
            return s["shaping_rew"].sum(-1) + jnp.cumsum(s["collision_pen"], axis=-1)[:, i]
        return s["shaping_rew"][:, i] + s["collision_pen"][:, i]

    def observation(self, agent, state):
        passage_obs = [
            p.pos(state) - agent.pos(state) for p in self.passages if not p.collide
        ]
        return jnp.concatenate(
            [
                agent.pos(state),
                agent.vel(state),
                agent.goal.pos(state) - agent.pos(state),
                *passage_obs,
            ],
            axis=-1,
        )

    def done(self, state):
        return jnp.all(
            jnp.stack(
                [
                    safe_norm(a.pos(state) - a.goal.pos(state)) <= a.shape.radius / 2
                    for a in self.world.agents
                ],
                axis=1,
            ),
            axis=1,
        )

    def extra_render(self, env, ax, env_index: int = 0):
        """Arena perimeter (reference passage.py extra_render)."""
        from vmas_tpu.render import draw

        draw.draw_perimeter(ax, 1.0, pad=self.agent_radius)

    # ------------------------------------------------------------------
    def make_fused_outputs(self, world):
        """Emit obs/reward/done as extra rows of the fused physics kernel
        (fused.FusedOutputs). The ~A*(A-1 + n_boxes) is_overlapping tests of
        pre_rewards (sphere-sphere and box-sphere closest-point form,
        queries.py:82-93) run in-kernel on the VMEM-resident state; both
        reward modes incl. the shared cumulative-penalty semantics are
        composed in unpack. Asserted equal by tests/test_fused.py."""
        from vmas_tpu.core import fused as F_
        from vmas_tpu.core.utils import LINE_MIN_DIST

        agents = world.policy_agents
        A = len(agents)
        radius = float(self.agent_radius)
        factor = float(self.shaping_factor)
        shared = bool(self.shared_reward)
        open_passages = [p for p in self.passages if not p.collide]
        walls = [p for p in self.passages if p.collide]
        hw = self.passage_width / 2
        hl = self.passage_length / 2
        obs_w = 6 + 2 * len(open_passages)

        class PassageOutputs(F_.FusedOutputs):
            n_scratch_in = A  # previous global_shaping columns
            n_out = A * obs_w + 3 * A + 1
            # rows-carried rollout: next step's scratch = this step's
            # emitted shaping rows, in the same agent order (unpack is
            # state-free)
            carry_extra_idx = tuple(range(A * obs_w + 2 * A, A * obs_w + 3 * A))

            @staticmethod
            def scratch_rows(state):
                return state.scenario["global_shaping"].T  # [A, B]

            @staticmethod
            def emit(ctx):
                px, py = ctx["px"], ctx["py"]
                vx, vy = ctx["vx"], ctx["vy"]
                rot = ctx["rot"]
                prev = ctx["scratch"]

                safe_norm2 = F_._norm  # the kernel-row zero-guarded L2 norm

                goal_rel, dist = [], []
                for a in agents:
                    gx = px[a.goal.index] - px[a.index]
                    gy = py[a.goal.index] - py[a.index]
                    goal_rel.append((gx, gy))
                    dist.append(safe_norm2(gx, gy))
                shaping = [d * factor for d in dist]
                shaping_rew = [prev[i] - shaping[i] for i in range(A)]

                # agent-agent sphere overlaps, shared across the pair
                aa = {}
                for i in range(A):
                    for j in range(i + 1, A):
                        d = safe_norm2(
                            px[agents[i].index] - px[agents[j].index],
                            py[agents[i].index] - py[agents[j].index],
                        ) - 2 * radius
                        aa[(i, j)] = (d < 0).astype(jnp.float32)
                pen = []
                for i, a in enumerate(agents):
                    p = None
                    if a.collide:
                        for j in range(A):
                            if j == i:
                                continue
                            hit = aa[(min(i, j), max(i, j))]
                            p = -10.0 * hit if p is None else p - 10.0 * hit
                        for w_ in walls:
                            wi = w_.index
                            cos, sin = jnp.cos(rot[wi]), jnp.sin(rot[wi])
                            cx, cy = F_._closest_point_box(
                                px[wi], py[wi], cos, sin, hw, hl,
                                px[a.index], py[a.index],
                            )
                            d_sc = safe_norm2(px[a.index] - cx, py[a.index] - cy)
                            d_sb = safe_norm2(px[a.index] - px[wi], py[a.index] - py[wi])
                            d_cb = safe_norm2(px[wi] - cx, py[wi] - cy)
                            hit = (
                                (d_sb < d_cb) | (d_sc < radius + LINE_MIN_DIST)
                            ).astype(jnp.float32)
                            p = p - 10.0 * hit
                    pen.append(p if p is not None else jnp.zeros_like(px[0]))

                done = None
                for i, a in enumerate(agents):
                    ok = dist[i] <= radius / 2
                    done = ok if done is None else (done & ok)

                rows = []
                for i, a in enumerate(agents):
                    rows += [px[a.index], py[a.index], vx[a.index], vy[a.index]]
                    rows += list(goal_rel[i])
                    for p_ in open_passages:
                        rows += [
                            px[p_.index] - px[a.index],
                            py[p_.index] - py[a.index],
                        ]
                rows += shaping_rew + pen + shaping
                rows.append(done.astype(jnp.float32))
                return rows

            @staticmethod
            def unpack(extra, state):
                base = A * obs_w
                shaping_rew = extra[base : base + A].T          # [B, A]
                pen = extra[base + A : base + 2 * A].T
                shaping = extra[base + 2 * A : base + 3 * A].T
                done = extra[base + 3 * A] > 0.5
                obs = tuple(
                    extra[i * obs_w : (i + 1) * obs_w].T for i in range(A)
                )
                if shared:
                    shared_pos = shaping_rew.sum(-1)
                    cum = jnp.cumsum(pen, axis=-1)
                    rews = tuple(shared_pos + cum[:, i] for i in range(A))
                else:
                    rews = tuple(
                        shaping_rew[:, i] + pen[:, i] for i in range(A)
                    )
                updates = {
                    "global_shaping": shaping,
                    "shaping_rew": shaping_rew,
                    "collision_pen": pen,
                }
                return obs, rews, done, updates

        return PassageOutputs()
