"""Dispersion scenario.

Behavioral reference: /root/reference/vmas/scenarios/dispersion.py.
N sphere agents start at the origin and must spread to eat food landmarks;
reward is split among co-located eaters (or shared). The reference's
per-landmark python attributes (eaten/just_eaten/how_many_on_food,
dispersion.py:77-130) become ``[B, F]`` scratch arrays, and its
``is_first``/``is_last`` reward blocks become the pre/post_rewards hooks.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from vmas_tpu.core import Agent, Color, Landmark, Sphere, World
from vmas_tpu.core.utils import safe_norm
from vmas_tpu.scenario import BaseScenario
from vmas_tpu.utils import ScenarioUtils


class Scenario(BaseScenario):
    def make_world(self, batch_dim: int, device=None, **kwargs):
        n_agents = kwargs.pop("n_agents", 4)
        self.share_reward = kwargs.pop("share_reward", False)
        self.penalise_by_time = kwargs.pop("penalise_by_time", False)
        self.food_radius = kwargs.pop("food_radius", 0.05)
        self.pos_range = kwargs.pop("pos_range", 1.0)
        n_food = kwargs.pop("n_food", n_agents)
        ScenarioUtils.check_kwargs_consumed(kwargs)

        world = World(batch_dim, device, x_semidim=self.pos_range, y_semidim=self.pos_range)
        for i in range(n_agents):
            world.add_agent(Agent(name=f"agent_{i}", collide=False, shape=Sphere(radius=0.035)))
        for i in range(n_food):
            world.add_landmark(
                Landmark(
                    name=f"food_{i}", collide=False,
                    shape=Sphere(radius=self.food_radius), color=Color.GREEN,
                )
            )
        self.n_food = n_food
        return world

    # ------------------------------------------------------------------
    def reset_world_at(self, state, key):
        # Agents spawn at the origin (state is already zeroed).
        keys = jax.random.split(key, self.n_food)
        for i, food in enumerate(self.world.landmarks):
            pos = jax.random.uniform(
                keys[i], (state.batch_dim, 2), minval=-self.pos_range, maxval=self.pos_range
            )
            state = food.set_pos(state, pos)
            state = food.set_rendering(state, True)
        B, F = state.batch_dim, self.n_food
        scratch = dict(state.scenario)
        scratch["eaten"] = jnp.zeros((B, F), bool)
        scratch["just_eaten"] = jnp.zeros((B, F), bool)
        scratch["how_many_on_food"] = jnp.zeros((B, F), jnp.int32)
        return state.replace(scenario=scratch)

    # ------------------------------------------------------------------
    def _food_pos(self, state):
        idx = [f.index for f in self.world.landmarks]
        return state.pos[:, jnp.asarray(idx)]  # [B, F, 2]

    def _agents_on_food(self, state):
        """[B, A, F] bool: agent within eating range of food."""
        a_idx = jnp.asarray([a.index for a in self.world.agents])
        a_pos = state.pos[:, a_idx]  # [B, A, 2]
        dist = safe_norm(a_pos[:, :, None, :] - self._food_pos(state)[:, None, :, :])
        radii = jnp.asarray(
            [a.shape.radius + self.food_radius for a in self.world.agents], jnp.float32
        )
        return dist < radii[None, :, None]

    def pre_rewards(self, state):
        on = self._agents_on_food(state)  # [B, A, F]
        how_many = on.sum(axis=1)  # [B, F]
        scratch = dict(state.scenario)
        scratch["how_many_on_food"] = how_many
        scratch["just_eaten"] = scratch["just_eaten"] | (how_many > 0)
        return state.replace(scenario=scratch)

    def reward(self, agent, state):
        s = state.scenario
        eaten, just_eaten = s["eaten"], s["just_eaten"]
        how_many = s["how_many_on_food"]
        if self.share_reward:
            rews = (just_eaten & ~eaten).sum(axis=-1).astype(jnp.float32)
        else:
            on = self._agents_on_food(state)[:, agent.slot]  # [B, F]
            eating_rew = jnp.where(how_many > 0, 1.0 / jnp.where(how_many > 0, how_many, 1), 0.0)
            rews = jnp.where(on & ~eaten, eating_rew, 0.0).sum(axis=-1)
        if self.penalise_by_time:
            rews = jnp.where(rews == 0, -0.01, rews)
        return rews

    def post_rewards(self, state):
        scratch = dict(state.scenario)
        eaten = scratch["eaten"] | scratch["just_eaten"]
        scratch["eaten"] = eaten
        scratch["just_eaten"] = jnp.zeros_like(eaten)
        # Eaten food stops rendering (reference dispersion.py:130).
        f_idx = jnp.asarray([f.index for f in self.world.landmarks])
        rendering = state.rendering.at[:, f_idx].set(~eaten)
        return state.replace(scenario=scratch, rendering=rendering)

    # ------------------------------------------------------------------
    def observation(self, agent, state):
        rel = self._food_pos(state) - agent.pos(state)[:, None, :]  # [B, F, 2]
        eaten = state.scenario["eaten"].astype(jnp.int32)[..., None]  # [B, F, 1]
        per_food = jnp.concatenate([rel, eaten.astype(jnp.float32)], axis=-1).reshape(
            state.batch_dim, -1
        )
        return jnp.concatenate([agent.pos(state), agent.vel(state), per_food], axis=-1)

    def done(self, state):
        return jnp.all(state.scenario["eaten"], axis=-1)

    # ------------------------------------------------------------------
    def make_fused_outputs(self, world):
        """Emit obs/reward/done as extra rows of the fused physics kernel
        (fused.FusedOutputs). Mirrors pre_rewards/reward/observation/done
        above; the REAL post_rewards hook still runs on the unpacked
        scratch (fused branch calls it), so the eaten merge, just_eaten
        zeroing and food-rendering toggle are not duplicated here. The
        obs/done rows use eaten_new = eaten | just_eaten_new because the
        non-fused hook order computes them after post_rewards."""
        from vmas_tpu.core import fused as F_

        agents = world.policy_agents
        foods = world.landmarks
        A, F = len(agents), len(foods)
        eat_r = [float(a.shape.radius) + float(self.food_radius) for a in agents]
        share = bool(self.share_reward)
        by_time = bool(self.penalise_by_time)
        agent_w = 4  # pos(2) vel(2); per-food rel emitted separately

        class DispersionOutputs(F_.FusedOutputs):
            n_scratch_in = 2 * F  # eaten | just_eaten
            n_out = A * agent_w + A * 2 * F + 3 * F + A + 1
            # rows-carried rollout: next step's eaten scratch = this step's
            # emitted eaten_new rows; just_eaten is ZERO at every kernel
            # entry (post_rewards zeroes it after each step, reset spawns it
            # zero), so carrying it unchanged (None) is exact. post_rewards
            # only re-derives eaten/just_eaten idempotently and toggles
            # food rendering — applied once to the final state.
            carry_extra_idx = tuple(
                A * agent_w + A * 2 * F + F + k for k in range(F)
            ) + (None,) * F
            post_rewards_rollout_safe = True

            @staticmethod
            def scratch_rows(state):
                return jnp.concatenate(
                    [
                        state.scenario["eaten"].astype(jnp.float32).T,
                        state.scenario["just_eaten"].astype(jnp.float32).T,
                    ],
                    axis=0,
                )  # [2F, B]

            @staticmethod
            def emit(ctx):
                px, py = ctx["px"], ctx["py"]
                vx, vy = ctx["vx"], ctx["vy"]
                eaten = [r > 0.5 for r in ctx["scratch"][:F]]
                just_prev = [r > 0.5 for r in ctx["scratch"][F:]]

                safe_norm2 = F_._norm  # the kernel-row zero-guarded L2 norm

                rel, on = {}, {}
                for ai, a in enumerate(agents):
                    for fi, f in enumerate(foods):
                        rx = px[f.index] - px[a.index]
                        ry = py[f.index] - py[a.index]
                        rel[(ai, fi)] = (rx, ry)
                        on[(ai, fi)] = safe_norm2(rx, ry) < eat_r[ai]
                how_many = [
                    sum(on[(ai, fi)].astype(jnp.float32) for ai in range(A))
                    for fi in range(F)
                ]
                just_new = [
                    just_prev[fi] | (how_many[fi] > 0) for fi in range(F)
                ]
                eaten_new = [eaten[fi] | just_new[fi] for fi in range(F)]

                rews = []
                for ai in range(A):
                    if share:
                        r = sum(
                            (just_new[fi] & ~eaten[fi]).astype(jnp.float32)
                            for fi in range(F)
                        )
                    else:
                        r = None
                        for fi in range(F):
                            hm = how_many[fi]
                            eat = jnp.where(
                                hm > 0, 1.0 / jnp.where(hm > 0, hm, 1.0), 0.0
                            )
                            term = jnp.where(
                                on[(ai, fi)] & ~eaten[fi], eat, 0.0
                            )
                            r = term if r is None else r + term
                    if by_time:
                        r = jnp.where(r == 0, -0.01, r)
                    rews.append(r)
                done = None
                for fi in range(F):
                    done = eaten_new[fi] if done is None else (done & eaten_new[fi])

                rows = []
                for a in agents:
                    rows += [px[a.index], py[a.index], vx[a.index], vy[a.index]]
                for ai in range(A):
                    for fi in range(F):
                        rows += list(rel[(ai, fi)])
                rows += [j.astype(jnp.float32) for j in just_new]
                rows += [e.astype(jnp.float32) for e in eaten_new]
                rows += how_many
                rows += rews
                rows.append(done.astype(jnp.float32))
                return rows

            @staticmethod
            def unpack(extra, state):
                base = A * agent_w
                rel = extra[base : base + A * 2 * F]
                just_new = extra[base + A * 2 * F : base + A * 2 * F + F].T > 0.5
                eaten_row = (
                    extra[base + A * 2 * F + F : base + A * 2 * F + 2 * F].T
                    > 0.5
                )  # post-merge eaten, emitted in-kernel (state-free unpack)
                how_many = extra[
                    base + A * 2 * F + 2 * F : base + A * 2 * F + 3 * F
                ].T.astype(jnp.int32)
                rews = tuple(
                    extra[base + A * 2 * F + 3 * F + ai] for ai in range(A)
                )
                done = extra[-1] > 0.5
                eaten_new = eaten_row.astype(jnp.float32)[
                    ..., None
                ]  # [B, F, 1] — obs flag is post-merge
                obs = []
                for ai in range(A):
                    r = rel[ai * 2 * F : (ai + 1) * 2 * F]  # [2F, B] x,y pairs
                    per_food = jnp.concatenate(
                        [
                            jnp.stack(
                                [r[2 * fi], r[2 * fi + 1]], axis=-1
                            )  # [B, 2]
                            for fi in range(F)
                        ],
                        axis=-1,
                    ).reshape(state.batch_dim, F, 2)
                    per_food = jnp.concatenate([per_food, eaten_new], axis=-1)
                    obs.append(
                        jnp.concatenate(
                            [
                                extra[ai * agent_w : (ai + 1) * agent_w].T,
                                per_food.reshape(state.batch_dim, -1),
                            ],
                            axis=-1,
                        )
                    )
                updates = {
                    # post_rewards re-merges eaten | just_eaten — identical
                    # to the emitted post-merge value, so this is idempotent
                    # (and makes the rows rollout's final state exact)
                    "eaten": eaten_row,
                    "just_eaten": just_new,
                    "how_many_on_food": how_many,
                }
                return tuple(obs), rews, done, updates

        return DispersionOutputs()
