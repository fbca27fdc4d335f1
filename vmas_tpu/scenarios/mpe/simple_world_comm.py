"""MPE simple_world_comm (leader adversary with comm, food, forests).

Behavioral reference: /root/reference/vmas/scenarios/mpe/simple_world_comm.py.

Note on fidelity: the reference has several chained-indexing no-ops
(`in_forest[index][:, i] = 1` at simple_world_comm.py:282-285 and the first
prey_forest block at :327-341 modify copies, never the tensor) and a
self-distance in the adversary shaped reward (`a.state.pos - a.state.pos`,
:240-257, identically zero). This port reproduces the NET behavior those lines
actually produce: in_forest stays -1, forest visibility masks are always
False (so non-leaders see zeros for other agents), and the adversary shaping
term is zero.
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
        num_good_agents = kwargs.pop("num_good_agents", 2)
        num_adversaries = kwargs.pop("num_adversaries", 4)
        num_landmarks = kwargs.pop("num_landmarks", 1)
        num_food = kwargs.pop("num_food", 2)
        num_forests = kwargs.pop("num_forests", 2)
        ScenarioUtils.check_kwargs_consumed(kwargs)

        world = World(batch_dim=batch_dim, device=device, x_semidim=1, y_semidim=1, dim_c=4)
        for i in range(num_good_agents + num_adversaries):
            adversary = i < num_adversaries
            leader = i == 0
            name = (
                "lead_adversary_0" if leader
                else (f"adversary_{i}" if adversary else f"agent_{i - num_adversaries}")
            )
            agent = Agent(
                name=name, collide=True,
                shape=Sphere(radius=0.075 if adversary else 0.045),
                u_multiplier=3.0 if adversary else 4.0,
                max_speed=1.0 if adversary else 1.3,
                color=Color.RED if adversary else Color.GREEN,
                adversary=adversary, silent=not leader,
            )
            agent.leader = leader
            world.add_agent(agent)
        self.obstacles = []
        for i in range(num_landmarks):
            lm = Landmark(name=f"landmark {i}", collide=True, shape=Sphere(radius=0.2))
            self.obstacles.append(lm)
            world.add_landmark(lm)
        self.food = []
        for i in range(num_food):
            lm = Landmark(name=f"food {i}", collide=False, shape=Sphere(radius=0.03))
            self.food.append(lm)
            world.add_landmark(lm)
        self.forests = []
        for i in range(num_forests):
            lm = Landmark(name=f"forest {i}", collide=False, shape=Sphere(radius=0.3))
            self.forests.append(lm)
            world.add_landmark(lm)
        return world

    def reset_world_at(self, state, key):
        B = state.batch_dim
        for i, agent in enumerate(self.world.agents):
            state = agent.set_pos(
                state, jax.random.uniform(jax.random.fold_in(key, i), (B, 2), minval=-1.0, maxval=1.0)
            )
        for i, lm in enumerate(self.world.landmarks):
            state = lm.set_pos(
                state,
                jax.random.uniform(jax.random.fold_in(key, 1000 + i), (B, 2), minval=-0.9, maxval=0.9),
            )
        return state

    def is_collision(self, state, a, b):
        return safe_norm(a.pos(state) - b.pos(state)) < (a.shape.radius + b.shape.radius)

    def good_agents(self):
        return [a for a in self.world.agents if not a.adversary]

    def adversaries(self):
        return [a for a in self.world.agents if a.adversary]

    def reward(self, agent, state):
        if agent.adversary:
            rew = jnp.zeros((state.batch_dim,), jnp.float32)
            # shaped term is identically zero in the reference (self-distance)
            if agent.collide:
                for ag in self.good_agents():
                    for adv in self.adversaries():
                        rew = rew + 5.0 * self.is_collision(state, ag, adv).astype(jnp.float32)
            return rew
        rew = jnp.zeros((state.batch_dim,), jnp.float32)
        if agent.collide:
            for a in self.adversaries():
                rew = rew - 5.0 * self.is_collision(state, a, agent).astype(jnp.float32)
        for food in self.food:
            rew = rew + 2.0 * self.is_collision(state, agent, food).astype(jnp.float32)
        rew = rew - 0.05 * jnp.min(
            jnp.stack([safe_norm(f.pos(state) - agent.pos(state)) for f in self.food], axis=1),
            axis=-1,
        )
        return rew

    def observation(self, agent, state):
        B = state.batch_dim
        entity_pos = [lm.pos(state) - agent.pos(state) for lm in self.world.landmarks]
        in_forest = jnp.full((B, len(self.forests)), -1.0, jnp.float32)  # reference no-op writes

        other_pos, other_vel = [], []
        for other in self.world.agents:
            if other is agent:
                continue
            for _ in range(len(self.forests)):
                if agent.leader:
                    pos = other.pos(state) - agent.pos(state)
                    vel = other.vel(state) if not other.adversary else jnp.zeros((B, 2))
                else:
                    pos = jnp.zeros((B, 2))
                    vel = jnp.zeros((B, 2))
                other_pos.append(pos)
                other_vel.append(vel)

        comm = self.world.agents[0].comm(state)
        return jnp.concatenate(
            [agent.vel(state), agent.pos(state), *entity_pos, *other_pos, *other_vel, in_forest]
            + ([comm] if (agent.adversary or agent.leader) else []),
            axis=-1,
        )

    # ------------------------------------------------------------------
    def make_fused_outputs(self, world):
        """Emit the positional obs rows and rewards from the fused physics
        kernel (fused.FusedOutputs). The constant blocks (non-leader zero
        partner rows, the reference's no-op in_forest -1s) and the leader's
        comm vector are assembled in unpack; the leader's per-other rows
        are emitted once and duplicated per forest there (the hook repeats
        them verbatim)."""
        from vmas_tpu.core import fused as F_

        agents = world.policy_agents
        lms = world.landmarks
        A, L = len(agents), len(lms)
        F = len(self.forests)
        radius = {a.name: float(a.shape.radius) for a in agents}
        food_r = float(self.food[0].shape.radius)
        food_idx = [f.index for f in self.food]
        goods = [a for a in agents if not a.adversary]
        advs = [a for a in agents if a.adversary]
        # per-agent kernel rows: vel2 pos2 entity-rels 2L; the leader also
        # gets per-other pos rel (2 each) and per-non-adversary-other vel
        # (2 each), emitted ONCE (the hook duplicates them per forest)
        def leader_rows(a):
            if not a.leader:
                return 0
            others = [b for b in agents if b is not a]
            vels = [b for b in others if not b.adversary]
            return 2 * len(others) + 2 * len(vels)

        row_w = [4 + 2 * L + leader_rows(a) for a in agents]
        offs = [sum(row_w[:i]) for i in range(A)]

        class SimpleWorldCommOutputs(F_.FusedOutputs):
            n_scratch_in = 0
            # rows-carried rollout: unpack reads only the leader's comm
            # (hoisted per-step uc) and config constants
            carry_extra_idx = ()
            unpack_reads = ("c",)
            n_out = sum(row_w) + A

            @staticmethod
            def emit(ctx):
                px, py = ctx["px"], ctx["py"]
                vx, vy = ctx["vx"], ctx["vy"]

                def collide(a, b):
                    return (
                        F_._norm(
                            px[a.index] - px[b.index], py[a.index] - py[b.index]
                        )
                        < radius[a.name] + radius[b.name]
                    ).astype(jnp.float32)

                rows = []
                for a in agents:
                    ai = a.index
                    rows += [vx[ai], vy[ai], px[ai], py[ai]]
                    for lm in lms:
                        rows += [px[lm.index] - px[ai], py[lm.index] - py[ai]]
                    if a.leader:
                        others = [b for b in agents if b is not a]
                        for b in others:
                            rows += [px[b.index] - px[ai], py[b.index] - py[ai]]
                        for b in others:
                            if not b.adversary:
                                rows += [vx[b.index], vy[b.index]]

                adv_rew = None
                for ag in goods:
                    for adv in advs:
                        t = 5.0 * collide(ag, adv)
                        adv_rew = t if adv_rew is None else adv_rew + t

                rews = []
                for a in agents:
                    if a.adversary:
                        rews.append(
                            adv_rew if a.collide
                            else jnp.zeros_like(px[0])
                        )
                        continue
                    r = jnp.zeros_like(px[0])
                    if a.collide:
                        for adv in advs:
                            r = r - 5.0 * collide(adv, a)
                    for fi in food_idx:
                        hit = (
                            F_._norm(px[a.index] - px[fi], py[a.index] - py[fi])
                            < radius[a.name] + food_r
                        ).astype(jnp.float32)
                        r = r + 2.0 * hit
                    m = None
                    for fi in food_idx:
                        d = F_._norm(px[fi] - px[a.index], py[fi] - py[a.index])
                        m = d if m is None else jnp.minimum(m, d)
                    rews.append(r - 0.05 * m)
                return rows + rews

            @staticmethod
            def unpack(extra, state):
                B = state.batch_dim
                zeros2 = jnp.zeros((B, 2), jnp.float32)
                in_forest = jnp.full((B, F), -1.0, jnp.float32)
                comm = agents[0].comm(state)
                obs = []
                for i, a in enumerate(agents):
                    o = extra[offs[i] : offs[i] + row_w[i]]
                    base = o[: 4 + 2 * L].T
                    others = [b for b in agents if b is not a]
                    other_pos, other_vel = [], []
                    if a.leader:
                        c = 4 + 2 * L
                        pos_blocks = []
                        for b in others:
                            pos_blocks.append(o[c : c + 2].T)
                            c += 2
                        vel_blocks = {}
                        for b in others:
                            if not b.adversary:
                                vel_blocks[b.name] = o[c : c + 2].T
                                c += 2
                        for k, b in enumerate(others):
                            for _ in range(F):
                                other_pos.append(pos_blocks[k])
                                other_vel.append(
                                    vel_blocks[b.name]
                                    if not b.adversary
                                    else zeros2
                                )
                    else:
                        for b in others:
                            for _ in range(F):
                                other_pos.append(zeros2)
                                other_vel.append(zeros2)
                    parts = [base, *other_pos, *other_vel, in_forest]
                    if a.adversary or a.leader:
                        parts.append(comm)
                    obs.append(jnp.concatenate(parts, -1))
                b0 = sum(row_w)
                rews = tuple(extra[b0 + i] for i in range(A))
                done = jnp.zeros((B,), bool)
                return tuple(obs), rews, done, {}

        return SimpleWorldCommOutputs()
