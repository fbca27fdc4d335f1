"""Football scenario: blue vs red teams, ball agent, goals, scripted team AI.

Behavioral reference: /root/reference/vmas/scenarios/football.py (2346 lines).
Structure preserved: ball is a scripted agent (ball_action_script,
football.py:1617-1677); the team AI (AgentPolicy, football.py:1683-2273) is a
functional port whose per-agent objectives/possession state live in scenario
scratch as stacked [B, A, ...] arrays; hermite-spline trajectory evaluation
(Splines, football.py:2279-2330) reduces to constant row-vector coefficients
computed at build time.
"""

from __future__ import annotations

import math

import numpy as np
import jax
import jax.numpy as jnp

from vmas_tpu.core import Agent, Box, Color, Landmark, Line, Sphere, World
from vmas_tpu.core.utils import JaxUtils, X, Y, safe_norm
from vmas_tpu.dynamics import Holonomic, HolonomicWithRotation
from vmas_tpu.scenario import BaseScenario
from vmas_tpu.utils import ScenarioUtils


def hermite_coeffs(u: float, deriv: int) -> np.ndarray:
    """Row vector c so that spline(u) = c[0]*p0 + c[1]*p1 + c[2]*v0 + c[3]*v1
    (reference Splines.hermite, football.py:2291-2320)."""
    A = np.array(
        [[2.0, -2.0, 1.0, 1.0], [-3.0, 3.0, -2.0, -1.0], [0.0, 0.0, 1.0, 0.0], [1.0, 0.0, 0.0, 0.0]]
    )

    def nPr(n, r):
        if r > n:
            return 0
        ans = 1
        for k in range(n, max(1, n - r), -1):
            ans *= k
        return ans

    U = np.array(
        [
            nPr(3, deriv) * (u ** max(0, 3 - deriv)),
            nPr(2, deriv) * (u ** max(0, 2 - deriv)),
            nPr(1, deriv) * (u ** max(0, 1 - deriv)),
            nPr(0, deriv),
        ],
        dtype=np.float32,
    )
    return U @ A


def _norm_dir(v):
    """Unit vector; zeros where the norm is zero."""
    n = safe_norm(v)[..., None]
    return jnp.where(n == 0, 0.0, v / jnp.where(n == 0, 1.0, n))


class AgentPolicy:
    """Functional port of the football team AI (football.py:1683-2273).

    All mutable state (objectives, possession) lives in scenario scratch under
    the key ``ai_{team}``; methods take and return the scratch dict.
    """

    def __init__(self, scenario, team, speed_strength=1.0, decision_strength=1.0,
                 precision_strength=1.0, disabled=False, forced_objectives=False):
        # forced_objectives: replay harness hook — repositioning targets are
        # read from the scratch row ``forced_best_pos`` instead of sampling
        # check_better_positions. Used by the golden AI-trajectory parity
        # test to inject the reference AI's recorded objectives (whose
        # candidate selection we intentionally deviate from: the reference's
        # gather indexes env 0's candidates for every env, football.py:2170).
        self.scenario = scenario
        self.team_name = team
        self.speed_strength = speed_strength**2
        self.decision_strength = decision_strength
        self.precision_strength = precision_strength
        self.strength_multiplier = 25.0
        self.pos_lookahead = 0.01
        self.vel_lookahead = 0.01
        self.possession_lookahead = 0.5
        self.dribble_speed = 0.16 + 0.16 * speed_strength
        self.shooting_radius = 0.08
        self.shooting_angle = math.pi / 2
        self.take_shot_angle = math.pi / 4
        self.max_shot_dist = 0.5
        self.nsamples = 2
        self.sigma = 0.5
        self.replan_margin = 0.0
        self.disabled = disabled
        self.forced_objectives = forced_objectives
        self.key = f"ai_{team}"
        self.pos_coeffs = jnp.asarray(hermite_coeffs(min(self.pos_lookahead, 1), 0))
        self.vel_coeffs = jnp.asarray(hermite_coeffs(min(self.vel_lookahead, 1), 1))

    # -- wiring ----------------------------------------------------------
    @property
    def teammates(self):
        return self.scenario.red_agents if self.team_name == "Red" else self.scenario.blue_agents

    @property
    def opposition(self):
        return self.scenario.blue_agents if self.team_name == "Red" else self.scenario.red_agents

    @property
    def own_net(self):
        return self.scenario.red_net if self.team_name == "Red" else self.scenario.blue_net

    @property
    def target_net(self):
        return self.scenario.blue_net if self.team_name == "Red" else self.scenario.red_net

    def slot_in_team(self, agent):
        return self.teammates.index(agent)

    def init_scratch(self, B):
        A = len(self.teammates)
        z = lambda *s: jnp.zeros(s, jnp.float32)
        return {
            "shot_power": z(B, A),
            "target_ang": z(B, A),
            "target_pos_rel": z(B, A, 2),
            "target_pos": z(B, A, 2),
            "target_vel": z(B, A, 2),
            "start_pos": z(B, A, 2),
            "start_vel": z(B, A, 2),
            "agent_possession": jnp.zeros((B, A), bool),
            "team_possession": jnp.zeros((B,), bool),
            # replay-harness slot (see __init__ forced_objectives); always
            # present so the scratch pytree structure is config-independent
            "forced_best_pos": z(B, A, 2),
            # one BATCHED candidate-offset draw per step for ALL agents
            # (consumed by check_better_positions): per-agent tiny
            # fold_in+normal chains in-scan measured +106 us/step of
            # football-AI's 216 — scalar-shape threefry key schedules are
            # latency-bound on TPU (tests/golden/time_football_ai_split.py)
            "cbp_samples": z(B, A, self.nsamples, 2),
        }

    # -- helpers ----------------------------------------------------------
    def _ai_key(self, state, salt):
        """Per-(team, salt) PRNG stream; teams are offset so blue and red
        controllers (and per-agent salts) never draw correlated noise."""
        base = state.scenario.get("__obs_key", jax.random.PRNGKey(0))
        team_offset = 1_000_000 if self.team_name == "Red" else 0
        return jax.random.fold_in(base, team_offset + salt)

    def get_start_vel(self, pos, vel, start_pos, aggression):
        """football.py:1966-1988; ``aggression`` may be scalar or [B]."""
        vel_mag = 1.0 * aggression + safe_norm(vel) * (1 - aggression)
        vel_dir = _norm_dir(vel)
        goal_dist = safe_norm(pos - start_pos)
        dist_behind_target = 0.6 * goal_dist
        target_pos = pos - vel_dir * dist_behind_target[:, None]
        start_vel_aug_dir = _norm_dir(target_pos - start_pos)
        return start_vel_aug_dir * vel_mag[:, None]

    def go_to(self, state, ai, agent, pos, vel=None, start_vel=None, aggression=1.0, mask=None):
        """football.py:1929-1964; masked blend instead of indexed write."""
        i = self.slot_in_team(agent)
        start_pos = agent.pos(state)
        if vel is None:
            vel = jnp.zeros_like(pos)
        if start_vel is None:
            aggr = (safe_norm(pos - start_pos) > 0.1).astype(jnp.float32) * aggression
            start_vel = self.get_start_vel(pos, vel, start_pos, aggr)
        if self.precision_strength != 1:
            diff = safe_norm(ai["target_pos"][:, i] - pos)[:, None]
            exp_diff = jnp.exp(-diff)
            k = self._ai_key(state, 1000 + i)
            pos = pos + jax.random.normal(k, pos.shape) * 10 * (1 - self.precision_strength) * (1 - exp_diff)
            vel = vel + jax.random.normal(jax.random.fold_in(k, 1), pos.shape) * 10 * (
                1 - self.precision_strength
            ) * (1 - exp_diff)

        m = mask[:, None] if mask is not None else jnp.ones((pos.shape[0], 1), bool)
        ball_pos = self.scenario.ball.pos(state)
        upd = lambda arr, new: arr.at[:, i].set(jnp.where(m, new, arr[:, i]))
        ai = dict(ai)
        ai["target_pos_rel"] = upd(ai["target_pos_rel"], pos - ball_pos)
        ai["target_pos"] = upd(ai["target_pos"], pos)
        ai["target_vel"] = upd(ai["target_vel"], vel)
        ai["start_pos"] = upd(ai["start_pos"], start_pos)
        ai["start_vel"] = upd(ai["start_vel"], start_vel)
        return ai

    def update_dribble(self, state, ai, agent, pos, mask):
        """football.py:1870-1891."""
        agent_pos = agent.pos(state)
        ball_pos = self.scenario.ball.pos(state)
        ball_disp = pos - ball_pos
        direction = _norm_dir(ball_disp)
        hit_vel = direction * self.dribble_speed
        start_vel = self.get_start_vel(ball_pos, hit_vel, agent_pos, aggression=0.0)
        offset = _norm_dir(start_vel)
        new_direction = _norm_dir(direction + 0.5 * offset)
        hit_pos = ball_pos - new_direction * (
            self.scenario.ball.shape.radius + agent.shape.radius
        ) * 0.7
        return self.go_to(state, ai, agent, hit_pos, hit_vel, start_vel=start_vel, mask=mask)

    def get_rel_ang(self, vec1=None, vec2=None, ang1=None, ang2=None):
        """football.py:2040-2049."""
        if vec1 is not None:
            ang1 = jnp.arctan2(vec1[:, 1], vec1[:, 0])
        if vec2 is not None:
            ang2 = jnp.arctan2(vec2[:, 1], vec2[:, 0])
        if ang1.ndim == 2:
            ang1 = ang1[:, 0]
        if ang2.ndim == 2:
            ang2 = ang2[:, 0]
        return (ang1 - ang2 + jnp.pi) % (2 * jnp.pi) - jnp.pi

    def dribble(self, state, ai, agent, pos, mask=None):
        """football.py:1866-1871."""
        return self.update_dribble(state, ai, agent, pos, mask=mask)

    def dribble_to_goal(self, state, ai, agent, mask=None):
        """football.py:1863-1864."""
        return self.dribble(state, ai, agent, self.target_net.pos(state), mask=mask)

    def shoot(self, state, ai, agent, pos, mask=None):
        """football.py:1893-1918: line the agent up behind the ball facing
        ``pos`` (via dribble) and arm ``shot_power`` when the ball is within
        shooting_radius/shooting_angle and the shot line within
        take_shot_angle. shot_power is re-armed from -1 on EVERY call for
        all envs (the reference writes ``[:] = -1`` unmasked), so only the
        last shoot() in a step sticks."""
        i = self.slot_in_team(agent)
        agent_pos = agent.pos(state)
        ball_disp = self.scenario.ball.pos(state) - agent_pos
        ball_dist = safe_norm(ball_disp)
        within_range = ball_dist <= self.shooting_radius
        target_disp = pos - agent_pos
        target_dist = safe_norm(target_disp)
        rot = agent.rot(state)
        ball_within = jnp.abs(self.get_rel_ang(ang1=rot, vec2=ball_disp)) < self.shooting_angle / 2
        rot_within = jnp.abs(self.get_rel_ang(ang1=rot, vec2=target_disp)) < self.take_shot_angle / 2
        shooting_mask = within_range & ball_within & rot_within
        m = mask if mask is not None else jnp.ones_like(shooting_mask)
        ai = dict(ai)
        target_ang = jnp.arctan2(target_disp[:, 1], target_disp[:, 0])
        ai["target_ang"] = ai["target_ang"].at[:, i].set(
            jnp.where(m, target_ang, ai["target_ang"][:, i])
        )
        ai = self.update_dribble(state, ai, agent, pos, mask=mask)
        sp = jnp.full_like(ai["shot_power"][:, i], -1.0)
        sp = jnp.where(
            shooting_mask & m, jnp.minimum(target_dist / self.max_shot_dist, 1.0), sp
        )
        ai["shot_power"] = ai["shot_power"].at[:, i].set(sp)
        return ai

    def dribble_policy(self, state, ai, agent):
        """football.py:1805-1815: possession holder dribbles to the target
        net; everyone else repositions to the best sampled spot."""
        i = self.slot_in_team(agent)
        possession_mask = ai["agent_possession"][:, i]
        ai = self.update_dribble(
            state, ai, agent, self.target_net.pos(state), mask=possession_mask
        )
        if self.forced_objectives:
            best_pos = ai["forced_best_pos"][:, i]
        else:
            best_pos = self.check_better_positions(state, ai, agent)
        return self.go_to(state, ai, agent, best_pos, aggression=1.0,
                          mask=~possession_mask)

    def passing_policy(self, state, ai, agent):
        """football.py:1817-1833: possession holder shoots toward its
        teammate instead of dribbling to goal (callable alternative the
        reference ships even though run() always uses dribble_policy)."""
        i = self.slot_in_team(agent)
        possession_mask = ai["agent_possession"][:, i]
        otheragent = next(a for a in self.teammates if a is not agent)
        ai = self.shoot(state, ai, agent, otheragent.pos(state), mask=possession_mask)
        if self.forced_objectives:
            best_pos = ai["forced_best_pos"][:, i]
        else:
            best_pos = self.check_better_positions(state, ai, agent)
        return self.go_to(state, ai, agent, best_pos, aggression=1.0,
                          mask=~possession_mask)

    def disable(self):
        """football.py:1836-1837."""
        self.disabled = True

    def enable(self):
        """football.py:1839-1840."""
        self.disabled = False

    def check_possession(self, state, ai):
        """football.py:2116-2145."""
        team = self.teammates
        all_agents = team + self.opposition
        agents_pos = jnp.stack([a.pos(state) for a in all_agents], axis=1)
        agents_vel = jnp.stack([a.vel(state) for a in all_agents], axis=1)
        ball_pos = self.scenario.ball.pos(state)
        ball_vel = self.scenario.ball.vel(state)
        ball_disps = ball_pos[:, None, :] - agents_pos
        relvels = ball_vel[:, None, :] - agents_vel
        dists = safe_norm(ball_disps + relvels * self.possession_lookahead)
        ai = dict(ai)
        ai["team_possession"] = jnp.argmin(dists, axis=-1) < len(team)
        net_disps = self.target_net.pos(state)[:, None, :] - agents_pos
        side_dot_prod = jnp.sum(_norm_dir(ball_disps) * _norm_dir(net_disps), axis=-1)
        dists = dists - 0.5 * side_dot_prod * self.decision_strength
        if self.decision_strength != 1:
            dists = dists + 0.5 * jax.random.normal(self._ai_key(state, 77), dists.shape) * (
                1 - self.decision_strength
            ) ** 2
        mindist_agents = jnp.argmin(dists[:, : len(team)], axis=-1)
        ai["agent_possession"] = mindist_agents[:, None] == jnp.arange(len(team))[None]
        return ai

    def clamp_pos(self, pos):
        """football.py:2096-2114."""
        s = self.scenario
        agent_size = s.agent_size
        pitch_y = s.pitch_width / 2 - agent_size
        pitch_x = s.pitch_length / 2 - agent_size
        goal_y = s.goal_size / 2 - agent_size
        goal_x = s.goal_depth
        y = jnp.clip(pos[..., Y], -pitch_y, pitch_y)
        inside_goal_y = jnp.abs(y) < goal_y
        x = jnp.where(
            inside_goal_y,
            jnp.clip(pos[..., X], -pitch_x - goal_x, pitch_x + goal_x),
            jnp.clip(pos[..., X], -pitch_x, pitch_x),
        )
        return jnp.stack([x, y], axis=-1)

    def get_pos_value(self, state, ai, pos, agent):
        """football.py:2179-2231; pos [B, S, 2] -> [B, S]."""
        s = self.scenario
        ball_pos = s.ball.pos(state)[:, None]
        target_net_pos = self.target_net.pos(state)[:, None]
        own_net_pos = self.own_net.pos(state)[:, None]
        ball_vec = _norm_dir(ball_pos - pos)

        ball_dist = safe_norm(pos - ball_pos)
        ball_dist_value = jnp.exp(-2 * ball_dist**4)

        net_vec = _norm_dir(target_net_pos - pos)
        side_dot_prod = jnp.sum(ball_vec * net_vec, axis=-1)
        side_value = jnp.minimum(side_dot_prod + 1.25, 1.0)

        # reference divides own_net_vec by net_vec.norm() AFTER net_vec was
        # normalized (football.py:2199-2207) — i.e. by 1.0; own_net_vec keeps
        # its full magnitude (distance to own net)
        net_vec_norm = safe_norm(net_vec)[..., None]
        own_net_vec = (own_net_pos - pos) / jnp.where(net_vec_norm == 0, 1.0, net_vec_norm)
        defend_dot_prod = jnp.sum(ball_vec * -own_net_vec, axis=-1)
        defend_value = jnp.maximum(defend_dot_prod, 0.0)

        team = self.teammates
        if len(team) > 1:
            others = [a for a in team if a is not agent]
            team_pos = jnp.stack([a.pos(state) for a in others], axis=1)  # [B, T-1, 2]
            team_dists = safe_norm(team_pos[:, None] - pos[:, :, None])  # [B, S, T-1]
            other_agent_value = -jnp.sqrt(jnp.sum(jnp.exp(-5 * team_dists) ** 2, axis=-1)) + 1
        else:
            other_agent_value = 0.0

        # wall separations (football.py:2233-2244): norm over the two disp rows
        top = -pos[..., Y] + s.pitch_width / 2
        bottom = pos[..., Y] + s.pitch_width / 2
        left = pos[..., X] + s.pitch_length / 2
        right = -pos[..., X] + s.pitch_length / 2
        v_dist = jnp.minimum(top, bottom)
        h_dist = jnp.minimum(left, right)
        wall_value = -jnp.sqrt(jnp.exp(-8 * v_dist) ** 2 + jnp.exp(-8 * h_dist) ** 2) + 1

        value = (wall_value + other_agent_value + ball_dist_value + side_value + defend_value) / 5
        if self.decision_strength != 1:
            value = value + jax.random.normal(self._ai_key(state, 88), value.shape) * (
                1 - self.decision_strength
            )
        return value

    def check_better_positions(self, state, ai, agent):
        """football.py:2147-2177."""
        i = self.slot_in_team(agent)
        B = state.batch_dim
        ball_pos = self.scenario.ball.pos(state)
        curr_target = ai["target_pos_rel"][:, i] + ball_pos
        # NOTE: the reference gathers candidate positions with an
        # unsqueeze(0) index (football.py:2170-2177) so every env receives
        # env 0's best candidate — an indexing bug we intentionally fix by
        # selecting each env's own argmax below
        # the offsets were drawn ONCE for the whole team this step (run(),
        # slot 0) — same distribution as the reference's per-agent draws
        # (football.py:2147-2177), one threefry chain instead of 2 per agent.
        # All index ops below are scatter/gather-FREE: strided .at[].add,
        # .at[:,0].add and take_along_axis on tiny [B, S] shapes measured
        # ~70 us/step of latency-bound scatter/gather work
        # (tests/golden/time_football_cbp.py) — the static even/odd mean
        # stack, constant-row add and one-hot sum below are bitwise equal
        # (each element receives exactly the same single add; the one-hot
        # sum has one exact-1.0 term).
        samples = ai["cbp_samples"][:, i]
        agent_pos = agent.pos(state)
        means = jnp.stack(
            [
                ball_pos if j % 2 == 0 else agent_pos
                for j in range(self.nsamples)
            ],
            axis=1,
        )
        samples = samples + means
        test_pos = jnp.concatenate([curr_target[:, None, :], samples], axis=1)
        test_pos = self.clamp_pos(test_pos)
        values = self.get_pos_value(state, ai, test_pos, agent)
        margin = np.zeros(self.nsamples + 1, np.float32)
        margin[0] = self.replan_margin + 3 * (1 - self.decision_strength)
        values = values + jnp.asarray(margin)[None]
        best = jnp.argmax(values, axis=1)
        sel = (
            best[:, None] == jnp.arange(test_pos.shape[1])[None]
        ).astype(test_pos.dtype)
        return jnp.sum(sel[..., None] * test_pos, axis=1)

    def get_action(self, state, ai, agent):
        """football.py:1990-2038."""
        i = self.slot_in_team(agent)
        P = jnp.stack(
            [ai["start_pos"][:, i], ai["target_pos"][:, i], ai["start_vel"][:, i], ai["target_vel"][:, i]],
            axis=1,
        )  # [B, 4, 2]
        des_pos = jnp.einsum("k,bkd->bd", self.pos_coeffs, P)
        des_vel = jnp.einsum("k,bkd->bd", self.vel_coeffs, P)
        movement = 0.5 * (des_pos - agent.pos(state)) + 0.5 * (des_vel - agent.vel(state))
        movement = movement * (self.speed_strength * self.strength_multiplier)
        if agent.action_size == 2:
            return movement
        rel_ang = jnp.mod(ai["target_ang"][:, i] - agent.rot(state) + jnp.pi, 2 * jnp.pi) - jnp.pi
        rot_ctrl = jnp.where(rel_ang > jnp.pi / 2, 1.0, jnp.where(rel_ang < -jnp.pi / 2, -1.0, jnp.sin(rel_ang)))
        shooting = jnp.stack([rot_ctrl, ai["shot_power"][:, i]], axis=-1)
        return jnp.concatenate([movement, shooting], axis=-1)

    def run(self, agent, world, state):
        """Scripted-agent entry (reference AgentPolicy.run, football.py:1841-1858)."""
        if self.disabled:
            return agent.set_u(state, jnp.zeros((state.batch_dim, agent.action_size)))
        scratch = dict(state.scenario)
        ai = dict(scratch[self.key])
        if self.slot_in_team(agent) == 0:
            ai = self.check_possession(state, ai)
            if not self.forced_objectives:
                B = state.batch_dim
                A = len(self.teammates)
                ai["cbp_samples"] = jax.random.normal(
                    self._ai_key(state, 500), (B, A, self.nsamples, 2)
                ) * self.sigma * (1 + 3 * (1 - self.decision_strength))
        ai = self.dribble_policy(state, ai, agent)
        control = self.get_action(state, ai, agent)
        control = jnp.clip(control, -agent.u_range_array[None], agent.u_range_array[None])
        u = control * agent.u_multiplier_array[None]
        scratch[self.key] = ai
        state = state.replace(scenario=scratch)
        return agent.set_u(state, u)


def ball_action_script(ball, world, state):
    """Ball anti-stall impulses (reference ball_action_script,
    football.py:1617-1677)."""
    s = world._football_scenario
    dist_thres = s.agent_size * 2
    vel_thres = 0.3
    impulse = 0.05
    pos, vel = ball.pos(state), ball.vel(state)
    upper = 1 - jnp.minimum(s.pitch_width / 2 - pos[:, 1], dist_thres) / dist_thres
    lower = 1 - jnp.minimum(s.pitch_width / 2 + pos[:, 1], dist_thres) / dist_thres
    right = 1 - jnp.minimum(s.pitch_length / 2 - pos[:, 0], dist_thres) / dist_thres
    left = 1 - jnp.minimum(s.pitch_length / 2 + pos[:, 0], dist_thres) / dist_thres
    vertical_vel = 1 - jnp.minimum(jnp.abs(vel[:, 1]), vel_thres) / vel_thres
    horizontal_vel = vertical_vel  # the reference uses vel[:, 1] for both
    dist_action = jnp.stack([left - right, lower - upper], axis=1)
    vel_action = jnp.stack([horizontal_vel, vertical_vel], axis=1)
    actions = dist_action * vel_action * impulse
    goal_mask = (pos[:, 1] < s.goal_size / 2) & (pos[:, 1] > -s.goal_size / 2)
    actions = actions.at[:, 0].set(jnp.where(goal_mask, 0.0, actions[:, 0]))
    return ball.set_u(state, actions)


class Scenario(BaseScenario):
    def init_params(self, **kwargs):
        self.viewer_size = kwargs.pop("viewer_size", (1200, 800))
        self.n_blue_agents = kwargs.pop("n_blue_agents", 3)
        self.n_red_agents = kwargs.pop("n_red_agents", 3)
        self.ai_red_agents = kwargs.pop("ai_red_agents", True)
        self.ai_blue_agents = kwargs.pop("ai_blue_agents", False)
        self.physically_different = kwargs.pop("physically_different", False)
        self.spawn_in_formation = kwargs.pop("spawn_in_formation", False)
        self.only_blue_formation = kwargs.pop("only_blue_formation", True)
        self.formation_agents_per_column = kwargs.pop("formation_agents_per_column", 2)
        self.randomise_formation_indices = kwargs.pop("randomise_formation_indices", False)
        self.formation_noise = kwargs.pop("formation_noise", 0.2)
        self.n_traj_points = kwargs.pop("n_traj_points", 0)
        self.ai_speed_strength = kwargs.pop("ai_strength", 1.0)
        self.ai_decision_strength = kwargs.pop("ai_decision_strength", 1.0)
        self.ai_precision_strength = kwargs.pop("ai_precision_strength", 1.0)
        self.disable_ai_red = kwargs.pop("disable_ai_red", False)
        # test-harness extension (not a reference kwarg): scripted AIs take
        # repositioning targets from scratch instead of sampling them
        self.ai_forced_objectives = kwargs.pop("ai_forced_objectives", False)
        self.agent_size = kwargs.pop("agent_size", 0.025)
        self.goal_size = kwargs.pop("goal_size", 0.35)
        self.goal_depth = kwargs.pop("goal_depth", 0.1)
        self.pitch_length = kwargs.pop("pitch_length", 3.0)
        self.pitch_width = kwargs.pop("pitch_width", 1.5)
        self.ball_mass = kwargs.pop("ball_mass", 0.25)
        self.ball_size = kwargs.pop("ball_size", 0.02)
        self.u_multiplier = kwargs.pop("u_multiplier", 0.1)
        self.enable_shooting = kwargs.pop("enable_shooting", False)
        self.u_rot_multiplier = kwargs.pop("u_rot_multiplier", 0.0003)
        self.u_shoot_multiplier = kwargs.pop("u_shoot_multiplier", 0.6)
        self.shooting_radius = kwargs.pop("shooting_radius", 0.08)
        self.shooting_angle = kwargs.pop("shooting_angle", math.pi / 2)
        self.max_speed = kwargs.pop("max_speed", 0.15)
        self.ball_max_speed = kwargs.pop("ball_max_speed", 0.3)
        self.dense_reward = kwargs.pop("dense_reward", True)
        self.pos_shaping_factor_ball_goal = kwargs.pop("pos_shaping_factor_ball_goal", 10.0)
        self.pos_shaping_factor_agent_ball = kwargs.pop("pos_shaping_factor_agent_ball", 0.1)
        self.distance_to_ball_trigger = kwargs.pop("distance_to_ball_trigger", 0.4)
        self.scoring_reward = kwargs.pop("scoring_reward", 100.0)
        self.observe_teammates = kwargs.pop("observe_teammates", True)
        self.observe_adversaries = kwargs.pop("observe_adversaries", True)
        self.dict_obs = kwargs.pop("dict_obs", False)
        if kwargs.pop("dense_reward_ratio", None) is not None:
            raise ValueError(
                "dense_reward_ratio in football is deprecated, please use `dense_reward`"
            )
        ScenarioUtils.check_kwargs_consumed(kwargs)

    def make_world(self, batch_dim: int, device=None, **kwargs):
        self.init_params(**kwargs)
        self.visualize_semidims = False
        world = World(
            batch_dim, device, dt=0.1, drag=0.05,
            x_semidim=self.pitch_length / 2 + self.goal_depth - self.agent_size,
            y_semidim=self.pitch_width / 2 - self.agent_size,
            substeps=2,
        )
        world._football_scenario = self
        self._init_agents(world)
        self._init_ball(world)
        self._init_walls(world)
        self._init_goals(world)

        self.left_goal_pos = jnp.asarray(
            [-self.pitch_length / 2 - self.ball_size / 2, 0.0], jnp.float32
        )
        self.right_goal_pos = -self.left_goal_pos
        return world

    # -- construction -----------------------------------------------------
    def _agent_def(self, name, controller, shooting, u_mult_scale=0.0,
                   shoot_scale=0.0, speed_delta=0.0, radius_delta=0.0,
                   rot_mult_delta=0.0):
        u_mult = self.u_multiplier + u_mult_scale
        return Agent(
            name=name,
            shape=Sphere(radius=self.agent_size + radius_delta),
            action_script=controller.run if controller is not None else None,
            u_multiplier=(
                [u_mult, u_mult]
                if not shooting
                else [u_mult, u_mult, self.u_rot_multiplier + rot_mult_delta,
                      self.u_shoot_multiplier + shoot_scale]
            ),
            max_speed=self.max_speed + speed_delta,
            dynamics=Holonomic() if not shooting else HolonomicWithRotation(),
            action_size=2 if not shooting else 4,
            color=self.blue_color if name.startswith("agent_blue") else self.red_color,
            alpha=1,
        )

    def _init_agents(self, world):
        self.blue_color = (0.22, 0.49, 0.72)
        self.red_color = (0.89, 0.10, 0.11)
        self.blue_agents = []
        self.red_agents = []

        def strength(v, idx):
            return v[idx] if isinstance(v, tuple) else v

        self.red_controller = (
            AgentPolicy(
                self, "Red", disabled=self.disable_ai_red,
                speed_strength=strength(self.ai_speed_strength, 1),
                precision_strength=strength(self.ai_precision_strength, 1),
                decision_strength=strength(self.ai_decision_strength, 1),
                forced_objectives=self.ai_forced_objectives,
            )
            if self.ai_red_agents else None
        )
        self.blue_controller = (
            AgentPolicy(
                self, "Blue",
                speed_strength=strength(self.ai_speed_strength, 0),
                precision_strength=strength(self.ai_precision_strength, 0),
                decision_strength=strength(self.ai_decision_strength, 0),
                forced_objectives=self.ai_forced_objectives,
            )
            if self.ai_blue_agents else None
        )

        if self.physically_different:
            assert self.n_blue_agents == 5, "Physical differences only for 5 agents"
            # 2 attackers, 2 defenders, 1 goalkeeper (football.py:300-385)
            defs = [
                dict(u_mult_scale=0.1, shoot_scale=-0.2, speed_delta=0.05, radius_delta=-0.005),
                dict(u_mult_scale=0.1, shoot_scale=-0.2, speed_delta=0.05, radius_delta=-0.005),
                dict(), dict(),
                dict(u_mult_scale=-0.05, speed_delta=-0.1, radius_delta=0.01, rot_mult_delta=0.2),
            ]
            for i, d in enumerate(defs):
                agent = self._agent_def(
                    f"agent_blue_{i}", self.blue_controller,
                    shooting=self.enable_shooting, **d
                )
                world.add_agent(agent)
                self.blue_agents.append(agent)
        else:
            for i in range(self.n_blue_agents):
                agent = self._agent_def(
                    f"agent_blue_{i}", self.blue_controller,
                    shooting=self.enable_shooting,
                )
                world.add_agent(agent)
                self.blue_agents.append(agent)
        for i in range(self.n_red_agents):
            agent = self._agent_def(
                f"agent_red_{i}", self.red_controller,
                shooting=self.enable_shooting and not self.ai_red_agents,
            )
            world.add_agent(agent)
            self.red_agents.append(agent)

    def _init_ball(self, world):
        self.ball = Agent(
            name="Ball", shape=Sphere(radius=self.ball_size),
            action_script=ball_action_script,
            max_speed=self.ball_max_speed, mass=self.ball_mass,
            alpha=1, color=Color.BLACK,
        )
        world.add_agent(self.ball)

    def _init_walls(self, world):
        wall_len = self.pitch_width / 2 - self.agent_size - self.goal_size / 2
        self.walls = {}
        for name in ["Right Top Wall", "Left Top Wall", "Right Bottom Wall", "Left Bottom Wall"]:
            lm = Landmark(name=name, collide=True, movable=False, shape=Line(length=wall_len), color=Color.WHITE)
            world.add_landmark(lm)
            self.walls[name] = lm

    def _init_goals(self, world):
        self.goal_parts = {}
        for name, length in [
            ("Right Goal Back", self.goal_size), ("Left Goal Back", self.goal_size),
            ("Right Goal Top", self.goal_depth), ("Left Goal Top", self.goal_depth),
            ("Right Goal Bottom", self.goal_depth), ("Left Goal Bottom", self.goal_depth),
        ]:
            lm = Landmark(name=name, collide=True, movable=False, shape=Line(length=length), color=Color.WHITE)
            world.add_landmark(lm)
            self.goal_parts[name] = lm
        self.blue_net = Landmark(
            name="Blue Net", collide=False, movable=False,
            shape=Box(length=self.goal_depth, width=self.goal_size), color=(0.5, 0.5, 0.5),
        )
        world.add_landmark(self.blue_net)
        self.red_net = Landmark(
            name="Red Net", collide=False, movable=False,
            shape=Box(length=self.goal_depth, width=self.goal_size), color=(0.5, 0.5, 0.5),
        )
        world.add_landmark(self.red_net)

    # -- reset -------------------------------------------------------------
    def _spawn_formation(self, state, agents, blue, key):
        """football.py:416-462; with randomise_formation_indices, slots are
        permuted per env like the reference's torch.randperm (417-419)."""
        positions = []
        endpoint = -(self.pitch_length / 2 + self.goal_depth) * (1 if blue else -1)
        n_cols = len(agents) // self.formation_agents_per_column + 3
        agent_index = 0
        for x in np.linspace(0, endpoint, n_cols):
            if agent_index >= len(agents):
                break
            if x == 0 or x == endpoint:
                continue
            n_this = len(agents[agent_index : agent_index + self.formation_agents_per_column])
            for y in np.linspace(self.pitch_width / 2, -self.pitch_width / 2, n_this + 2):
                if y == -self.pitch_width / 2 or y == self.pitch_width / 2:
                    continue
                positions.append((x, y))
                agent_index += 1
        pos_arr = jnp.asarray(positions, jnp.float32)  # [n, 2]
        if self.randomise_formation_indices:
            perm = jax.random.permutation(
                jax.random.fold_in(key, 999),
                jnp.broadcast_to(jnp.arange(len(agents)), (state.batch_dim, len(agents))),
                axis=1, independent=True,
            )  # [B, n]: formation slot per agent per env
        for i, agent in enumerate(agents):
            noise = (
                jax.random.uniform(jax.random.fold_in(key, i), (state.batch_dim, 2)) - 0.5
            ) * self.formation_noise
            base = pos_arr[perm[:, i]] if self.randomise_formation_indices else pos_arr[i]
            state = agent.set_pos(state, base + noise)
        return state

    def reset_world_at(self, state, key):
        B = state.batch_dim
        ks = jax.random.split(key, 4)
        reset_range = jnp.asarray([self.pitch_length / 2, self.pitch_width], jnp.float32)
        offset_blue = jnp.asarray(
            [-self.pitch_length / 2 + self.agent_size, -self.pitch_width / 2], jnp.float32
        )
        offset_red = jnp.asarray([-self.agent_size, -self.pitch_width / 2], jnp.float32)

        if self.spawn_in_formation:
            state = self._spawn_formation(state, self.blue_agents, True, ks[0])
            if not self.only_blue_formation:
                state = self._spawn_formation(state, self.red_agents, False, ks[1])
        else:
            for i, agent in enumerate(self.blue_agents):
                r = jax.random.uniform(jax.random.fold_in(ks[0], i), (B, 2))
                state = agent.set_pos(state, r * reset_range + offset_blue)
        if (self.spawn_in_formation and self.only_blue_formation) or not self.spawn_in_formation:
            for i, agent in enumerate(self.red_agents):
                r = jax.random.uniform(jax.random.fold_in(ks[1], i), (B, 2))
                state = agent.set_pos(state, r * reset_range + offset_red)
                state = agent.set_rot(state, jnp.full((B,), jnp.pi))

        # walls & goals (football.py:730-1018)
        pw4 = self.pitch_width / 4 + self.goal_size / 4
        half_pi = math.pi / 2
        wall_defs = {
            "Left Top Wall": ([-self.pitch_length / 2, pw4], half_pi),
            "Left Bottom Wall": ([-self.pitch_length / 2, -pw4], half_pi),
            "Right Top Wall": ([self.pitch_length / 2, pw4], half_pi),
            "Right Bottom Wall": ([self.pitch_length / 2, -pw4], half_pi),
        }
        for name, (pos, rot) in wall_defs.items():
            state = self.walls[name].set_pos(state, jnp.asarray(pos, jnp.float32))
            state = self.walls[name].set_rot(state, jnp.asarray(rot, jnp.float32))
        gl = self.pitch_length / 2
        gd, gs, asz = self.goal_depth, self.goal_size, self.agent_size
        goal_defs = {
            "Left Goal Back": ([-gl - gd + asz, 0.0], half_pi),
            "Right Goal Back": ([gl + gd - asz, 0.0], half_pi),
            "Left Goal Top": ([-gl - gd / 2 + asz, gs / 2], 0.0),
            "Left Goal Bottom": ([-gl - gd / 2 + asz, -gs / 2], 0.0),
            "Right Goal Top": ([gl + gd / 2 - asz, gs / 2], 0.0),
            "Right Goal Bottom": ([gl + gd / 2 - asz, -gs / 2], 0.0),
        }
        for name, (pos, rot) in goal_defs.items():
            state = self.goal_parts[name].set_pos(state, jnp.asarray(pos, jnp.float32))
            state = self.goal_parts[name].set_rot(state, jnp.asarray(rot, jnp.float32))
        state = self.red_net.set_pos(state, jnp.asarray([gl + gd / 2 - asz / 2, 0.0], jnp.float32))
        state = self.blue_net.set_pos(state, jnp.asarray([-gl - gd / 2 + asz / 2, 0.0], jnp.float32))

        # shaping baselines + AI scratch
        scratch = dict(state.scenario)
        ball_pos = self.ball.pos(state)
        min_blue = self._closest_agent_to_ball(state, self.blue_agents)
        min_red = self._closest_agent_to_ball(state, self.red_agents)
        scratch["min_agent_dist_to_ball_blue"] = min_blue
        scratch["min_agent_dist_to_ball_red"] = min_red
        scratch["pos_shaping_blue"] = (
            safe_norm(ball_pos - self.right_goal_pos) * self.pos_shaping_factor_ball_goal
        )
        scratch["pos_shaping_agent_blue"] = min_blue * self.pos_shaping_factor_agent_ball
        scratch["pos_shaping_red"] = (
            safe_norm(ball_pos - self.left_goal_pos) * self.pos_shaping_factor_ball_goal
        )
        scratch["pos_shaping_agent_red"] = min_red * self.pos_shaping_factor_agent_ball
        scratch["done"] = jnp.zeros((B,), bool)
        scratch["sparse_blue"] = jnp.zeros((B,), jnp.float32)
        scratch["dense_blue"] = jnp.zeros((B,), jnp.float32)
        scratch["dense_red"] = jnp.zeros((B,), jnp.float32)
        scratch["pos_rew_blue"] = jnp.zeros((B,), jnp.float32)
        scratch["pos_rew_red"] = jnp.zeros((B,), jnp.float32)
        scratch["pos_rew_agent_blue"] = jnp.zeros((B,), jnp.float32)
        scratch["pos_rew_agent_red"] = jnp.zeros((B,), jnp.float32)
        if self.enable_shooting:
            scratch["kicking_action"] = jnp.zeros((B, 2), jnp.float32)
        if self.red_controller is not None:
            scratch[self.red_controller.key] = self.red_controller.init_scratch(B)
        if self.blue_controller is not None:
            scratch[self.blue_controller.key] = self.blue_controller.init_scratch(B)
        return state.replace(scenario=scratch)

    def _closest_agent_to_ball(self, state, team):
        pos = jnp.stack([a.pos(state) for a in team], axis=1)
        return jnp.min(safe_norm(pos - self.ball.pos(state)[:, None]), axis=1)

    # -- actions ------------------------------------------------------------
    def process_action(self, agent, state):
        if agent is self.ball:
            return state
        blue = agent in self.blue_agents
        if agent.action_script is None and not blue:
            u = agent.u(state)
            u = u.at[:, X].set(-u[:, X])
            if self.enable_shooting:
                u = u.at[:, 2].set(-u[:, 2])
            state = agent.set_u(state, u)
        if self.enable_shooting and agent.action_script is None:
            agents_exclude_ball = [a for a in self.world.agents if a is not self.ball]
            rel = jnp.stack([self.ball.pos(state) - a.pos(state) for a in agents_exclude_ball], axis=1)
            dist = safe_norm(rel)
            closest = dist == jnp.min(dist, axis=-1, keepdims=True)
            i = agents_exclude_ball.index(agent)
            rel_i = rel[:, i]
            within_range = dist[:, i] <= self.shooting_radius
            rel_angle = jnp.mod(
                agent.rot(state) - jnp.arctan2(rel_i[:, Y], rel_i[:, X]) + jnp.pi, 2 * jnp.pi
            ) - jnp.pi
            within_angle = (-self.shooting_angle / 2 <= rel_angle) & (rel_angle <= self.shooting_angle / 2)
            u = agent.u(state)
            shoot_force_local = jnp.stack(
                [u[:, -1] + self.u_shoot_multiplier, jnp.zeros_like(u[:, -1])], axis=-1
            )
            shoot_force = JaxUtils.rotate_vector(shoot_force_local, agent.rot(state))
            shoot_force = jnp.where(
                (within_angle & within_range & closest[:, i])[:, None], shoot_force, 0.0
            )
            scratch = dict(state.scenario)
            scratch["kicking_action"] = scratch["kicking_action"] + shoot_force
            state = state.replace(scenario=scratch)
        return state

    def pre_step(self, state):
        if self.enable_shooting:
            scratch = dict(state.scenario)
            kick = scratch["kicking_action"]
            state = self.ball.set_u(state, self.ball.u(state) + kick)
            # re-run the ball dynamics so the kick reaches state.force
            state = self.ball.dynamics.process_action(self.world, state)
            scratch["kicking_action"] = jnp.zeros_like(kick)
            state = state.replace(scenario=scratch)
        return state

    # -- rewards ------------------------------------------------------------
    def pre_rewards(self, state):
        scratch = dict(state.scenario)
        ball_pos = self.ball.pos(state)
        over_right = ball_pos[:, X] > self.pitch_length / 2 + self.ball_size / 2
        over_left = ball_pos[:, X] < -self.pitch_length / 2 - self.ball_size / 2
        goal_mask = (ball_pos[:, Y] <= self.goal_size / 2) & (ball_pos[:, Y] >= -self.goal_size / 2)
        blue_score = over_right & goal_mask
        red_score = over_left & goal_mask
        scratch["sparse_blue"] = (
            self.scoring_reward * blue_score.astype(jnp.float32)
            - self.scoring_reward * red_score.astype(jnp.float32)
        )
        scratch["done"] = blue_score | red_score

        dense_blue = jnp.zeros_like(scratch["sparse_blue"])
        dense_red = jnp.zeros_like(dense_blue)
        if self.dense_reward:
            if not self.ai_blue_agents:
                dense_blue, scratch = self._dense_reward(state, scratch, blue=True)
            if not self.ai_red_agents:
                dense_red, scratch = self._dense_reward(state, scratch, blue=False)
        scratch["dense_blue"] = dense_blue
        scratch["dense_red"] = dense_red
        return state.replace(scenario=scratch)

    def _dense_reward(self, state, scratch, blue):
        tag = "blue" if blue else "red"
        goal_pos = self.right_goal_pos if blue else self.left_goal_pos
        ball_pos = self.ball.pos(state)
        dist_goal = safe_norm(ball_pos - goal_pos)
        pos_shaping = dist_goal * self.pos_shaping_factor_ball_goal
        pos_rew = scratch[f"pos_shaping_{tag}"] - pos_shaping
        scratch[f"pos_shaping_{tag}"] = pos_shaping
        scratch[f"pos_rew_{tag}"] = pos_rew

        min_dist = self._closest_agent_to_ball(state, self.blue_agents if blue else self.red_agents)
        scratch[f"min_agent_dist_to_ball_{tag}"] = min_dist
        agent_shaping = min_dist * self.pos_shaping_factor_agent_ball
        ball_moving = safe_norm(self.ball.vel(state)) > 1e-6
        close = min_dist < self.distance_to_ball_trigger
        pos_rew_agent = jnp.where(
            close | ball_moving, 0.0, scratch[f"pos_shaping_agent_{tag}"] - agent_shaping
        )
        scratch[f"pos_shaping_agent_{tag}"] = agent_shaping
        scratch[f"pos_rew_agent_{tag}"] = pos_rew_agent
        return pos_rew + pos_rew_agent, scratch

    def reward(self, agent, state):
        s = state.scenario
        blue = agent in self.blue_agents
        if blue:
            return s["sparse_blue"] + s["dense_blue"]
        return -s["sparse_blue"] + s["dense_red"]

    # -- observations ---------------------------------------------------------
    def observation(self, agent, state):
        blue = agent in self.blue_agents
        my_team, other_team = (
            (self.blue_agents, self.red_agents) if blue else (self.red_agents, self.blue_agents)
        )
        goal_pos = self.right_goal_pos if blue else self.left_goal_pos
        B = state.batch_dim

        def flip(x):
            return x.at[..., X].set(-x[..., X]) if not blue else x

        agent_pos = flip(agent.pos(state))
        agent_vel = flip(agent.vel(state))
        agent_force = flip(agent.force(state))
        agent_rot = agent.rot(state) - (jnp.pi if not blue else 0.0)
        ball_pos = flip(self.ball.pos(state))
        ball_vel = flip(self.ball.vel(state))
        ball_force = flip(self.ball.force(state))
        goal_pos_f = goal_pos.at[X].set(-goal_pos[X]) if not blue else goal_pos
        goal_pos_f = jnp.broadcast_to(goal_pos_f[None], (B, 2))

        obs = {
            "obs": [
                agent_force, agent_pos - ball_pos, agent_vel - ball_vel,
                ball_pos - goal_pos_f, ball_vel, ball_force,
            ],
            "pos": [agent_pos - goal_pos_f],
            "vel": [agent_vel],
        }
        if self.enable_shooting:
            obs["obs"].append(agent_rot[:, None])

        if self.observe_adversaries and len(other_team):
            advs = []
            for a in other_team:
                a_pos, a_vel, a_force = flip(a.pos(state)), flip(a.vel(state)), flip(a.force(state))
                advs.append(
                    jnp.concatenate([agent_pos - a_pos, agent_vel - a_vel, a_vel, a_force], axis=-1)
                )
            obs["adversaries"] = [
                jnp.stack(advs, axis=-2) if self.dict_obs else jnp.concatenate(advs, axis=-1)
            ]
        if self.observe_teammates:
            mates = []
            for a in my_team:
                if a is agent:
                    continue
                a_pos, a_vel, a_force = flip(a.pos(state)), flip(a.vel(state)), flip(a.force(state))
                mates.append(
                    jnp.concatenate([agent_pos - a_pos, agent_vel - a_vel, a_vel, a_force], axis=-1)
                )
            obs["teammates"] = [
                jnp.stack(mates, axis=-2) if self.dict_obs else jnp.concatenate(mates, axis=-1)
            ]

        out = {k: jnp.concatenate(v, axis=-1) for k, v in obs.items()}
        if self.dict_obs:
            return out
        return jnp.concatenate(list(out.values()), axis=-1)

    def done(self, state):
        return state.scenario["done"]

    def info(self, agent, state):
        s = state.scenario
        blue = agent in self.blue_agents
        tag = "blue" if blue else "red"
        return {
            "sparse_reward": s["sparse_blue"] if blue else -s["sparse_blue"],
            "ball_goal_pos_rew": s[f"pos_rew_{tag}"],
            "all_agent_ball_pos_rew": s[f"pos_rew_agent_{tag}"],
            "ball_pos": self.ball.pos(state),
            "dist_ball_to_goal": s[f"pos_shaping_{tag}"] / self.pos_shaping_factor_ball_goal,
            "min_agent_dist_to_ball": s[f"min_agent_dist_to_ball_{tag}"],
            "touching_ball": s[f"min_agent_dist_to_ball_{tag}"]
            <= self.agent_size + self.ball_size + 1e-2,
        }

    # -- fused outputs --------------------------------------------------------
    def make_fused_outputs(self, world):
        """Emit football's observations/rewards/done as extra rows of the
        fused physics kernel (fused.FusedOutputs) for the flat-obs,
        non-shooting configs; returns None otherwise so the hook pipeline
        runs. The scripted AIs (and the ball's anti-stall script) run in
        process_action, BEFORE the kernel, and are untouched.

        Row math mirrors pre_rewards/_dense_reward/observation/done above
        line for line (reference football.py:1118-1457); the red-team flip
        is an exact f32 negation of the x rows. Asserted equal to the hook
        pipeline by tests/test_fused.py for both the AI-red and two-policy-
        team configs."""
        if self.dict_obs or self.enable_shooting:
            return None
        from vmas_tpu.core import fused as F

        scen = self
        agents = world.policy_agents
        if not agents:
            return None
        A_pol = len(agents)
        bi = self.ball.index
        blue_set = set(id(a) for a in self.blue_agents)
        is_blue = [id(a) in blue_set for a in agents]
        blue_idx = [a.index for a in self.blue_agents]
        red_idx = [a.index for a in self.red_agents]
        # right goal == blue's target and the red flip of the left goal
        gx = float(self.pitch_length / 2 + self.ball_size / 2)
        x_over = float(self.pitch_length / 2 + self.ball_size / 2)
        y_goal = float(self.goal_size / 2)
        scoring = float(self.scoring_reward)
        f_goal = float(self.pos_shaping_factor_ball_goal)
        f_agent = float(self.pos_shaping_factor_agent_ball)
        trigger = float(self.distance_to_ball_trigger)
        dense_blue_on = self.dense_reward and not self.ai_blue_agents
        dense_red_on = self.dense_reward and not self.ai_red_agents
        obs_adv = self.observe_adversaries
        obs_team = self.observe_teammates

        def obs_w(blue):
            other = red_idx if blue else blue_idx
            team = blue_idx if blue else red_idx
            w = 12 + 2 + 2
            if obs_adv and len(other):
                w += 8 * len(other)
            if obs_team:
                w += 8 * (len(team) - 1)
            return w

        widths = [obs_w(b) for b in is_blue]
        n_dense_rows = 5 * (int(dense_blue_on) + int(dense_red_on))
        total_out = sum(widths) + 4 + n_dense_rows

        # rows-carried rollout declarations (round 5): the dense shaping
        # scratch refeeds from the emitted shaping rows; the BALL's
        # anti-stall script runs IN-KERNEL (process_act_rows — it is a pure
        # elementwise function of the ball's pos/vel rows, mirroring
        # ball_action_script above op for op); red POLICY agents' x-mirror
        # (process_action above) is a static decode transform. The AI-red
        # config stays on the hook pipeline (its scripted red agents are
        # state-dependent XLA work the kernel does not cover).
        _ce = []
        _o0 = sum(widths) + 4
        if dense_blue_on:
            _ce += [_o0 + 2, _o0 + 3]
            _o0 += 5
        if dense_red_on:
            _ce += [_o0 + 2, _o0 + 3]
        red_pos = [i for i, b in enumerate(is_blue) if not b]
        dist_thres = float(self.agent_size * 2)
        vel_thres, impulse = 0.3, 0.05
        pw_half = float(self.pitch_width / 2)
        pl_half = float(self.pitch_length / 2)

        class FootballOutputs(F.FusedOutputs):
            n_scratch_in = 2 * (int(dense_blue_on) + int(dense_red_on))
            n_out = total_out
            carry_extra_idx = tuple(_ce)
            pre_step_noop = True  # pre_step only acts under enable_shooting
            # measured 0.91x on chip (tests/golden/time_football_ab.py):
            # football's ~350 emit rows/step make recording the dominant
            # cost, so rollout() does NOT auto-upgrade; the rows paths stay
            # available explicitly (and matter for rows-PPO collection)
            rows_auto = False
            kernel_script_slots = (bi,)
            n_ctrl_out = 2
            kernel_script_u = ((bi, total_out, total_out + 1),)

            @staticmethod
            def process_act_rows(ctx):
                # ball_action_script as kernel-row ops (anti-stall
                # impulses; reference football.py:1617-1677)
                px, py, vy = ctx["px"], ctx["py"], ctx["vy"]
                fx, fy = ctx["fx"], ctx["fy"]
                pos_x, pos_y, vel_y = px[bi], py[bi], vy[bi]
                upper = 1 - jnp.minimum(pw_half - pos_y, dist_thres) / dist_thres
                lower = 1 - jnp.minimum(pw_half + pos_y, dist_thres) / dist_thres
                right = 1 - jnp.minimum(pl_half - pos_x, dist_thres) / dist_thres
                left = 1 - jnp.minimum(pl_half + pos_x, dist_thres) / dist_thres
                vertical_vel = 1 - jnp.minimum(jnp.abs(vel_y), vel_thres) / vel_thres
                ax_ = (left - right) * vertical_vel * impulse
                ay_ = (lower - upper) * vertical_vel * impulse
                goal_mask = (pos_y < y_goal) & (pos_y > -y_goal)
                ax_ = jnp.where(goal_mask, 0.0, ax_)
                fx[bi], fy[bi] = ax_, ay_
                return [ax_, ay_]

            if red_pos:

                @staticmethod
                def decode_transform(us):
                    # red POLICY agents act in their own mirrored frame:
                    # process_action negates u.x (reference
                    # football.py:1361-1366)
                    us = list(us)
                    for i in red_pos:
                        us[i] = us[i].at[..., 0].set(-us[i][..., 0])
                    return us

            @staticmethod
            def scratch_rows(state):
                s = state.scenario
                rows = []
                if dense_blue_on:
                    rows += [s["pos_shaping_blue"], s["pos_shaping_agent_blue"]]
                if dense_red_on:
                    rows += [s["pos_shaping_red"], s["pos_shaping_agent_red"]]
                import numpy as _np

                if not rows:
                    return _np.zeros((0, state.batch_dim), _np.float32)
                return jnp.stack(rows, axis=0)

            @staticmethod
            def emit(ctx):
                px, py, vx, vy = ctx["px"], ctx["py"], ctx["vx"], ctx["vy"]
                fx, fy = ctx["fx"], ctx["fy"]
                prev = ctx["scratch"]
                bpx, bpy = px[bi], py[bi]
                bvx, bvy = vx[bi], vy[bi]

                # pre_rewards sparse block
                over_right = bpx > x_over
                over_left = bpx < -x_over
                goal_mask = (bpy <= y_goal) & (bpy >= -y_goal)
                blue_score = over_right & goal_mask
                red_score = over_left & goal_mask
                sparse_blue = (
                    scoring * blue_score.astype(jnp.float32)
                    - scoring * red_score.astype(jnp.float32)
                )
                done = (blue_score | red_score).astype(jnp.float32)

                def dense(team_idx, goal_sign, prev0, prev1):
                    # _dense_reward: goal_pos is (goal_sign*gx, 0)
                    dist_goal = F._norm(bpx - goal_sign * gx, bpy)
                    pos_shaping = dist_goal * f_goal
                    pos_rew = prev0 - pos_shaping
                    min_dist = None
                    for ai in team_idx:
                        d = F._norm(px[ai] - bpx, py[ai] - bpy)
                        min_dist = d if min_dist is None else jnp.minimum(min_dist, d)
                    agent_shaping = min_dist * f_agent
                    ball_moving = F._norm(bvx, bvy) > 1e-6
                    close = min_dist < trigger
                    pos_rew_agent = jnp.where(
                        close | ball_moving, 0.0, prev1 - agent_shaping
                    )
                    return (pos_rew + pos_rew_agent,
                            [pos_rew, pos_rew_agent, pos_shaping, agent_shaping,
                             min_dist])

                k = 0
                dense_rows = []
                zero = jnp.zeros_like(sparse_blue)
                if dense_blue_on:
                    dense_blue, extra_b = dense(blue_idx, 1.0, prev[k], prev[k + 1])
                    k += 2
                    dense_rows += extra_b
                else:
                    dense_blue = zero
                if dense_red_on:
                    dense_red, extra_r = dense(red_idx, -1.0, prev[k], prev[k + 1])
                    k += 2
                    dense_rows += extra_r
                else:
                    dense_red = zero

                rows = []
                for a, blue in zip(agents, is_blue):
                    ai = a.index
                    s = 1.0 if blue else -1.0
                    sx = (lambda r: r) if blue else (lambda r: -r)
                    other = red_idx if blue else blue_idx
                    team = blue_idx if blue else red_idx
                    # "obs": force | pos-ball | vel-ballvel | ball-goal | ballvel | ballforce
                    rows += [sx(fx[ai]), fy[ai]]
                    rows += [sx(px[ai] - bpx), py[ai] - bpy]
                    rows += [sx(vx[ai] - bvx), vy[ai] - bvy]
                    rows += [sx(bpx) - gx, bpy]
                    rows += [sx(bvx), bvy]
                    rows += [sx(fx[bi]), fy[bi]]
                    # "pos": agent - goal; "vel"
                    rows += [sx(px[ai]) - gx, py[ai]]
                    rows += [sx(vx[ai]), vy[ai]]
                    if obs_adv and len(other):
                        for oi in other:
                            rows += [sx(px[ai] - px[oi]), py[ai] - py[oi],
                                     sx(vx[ai] - vx[oi]), vy[ai] - vy[oi],
                                     sx(vx[oi]), vy[oi], sx(fx[oi]), fy[oi]]
                    if obs_team:
                        for oi in team:
                            if oi == ai:
                                continue
                            rows += [sx(px[ai] - px[oi]), py[ai] - py[oi],
                                     sx(vx[ai] - vx[oi]), vy[ai] - vy[oi],
                                     sx(vx[oi]), vy[oi], sx(fx[oi]), fy[oi]]
                rows += [sparse_blue, dense_blue, dense_red, done]
                rows += dense_rows
                return rows

            @staticmethod
            def unpack(extra, state):
                obs = []
                o = 0
                for w in widths:
                    obs.append(extra[o : o + w].T)
                    o += w
                sparse = extra[o]
                dense_b = extra[o + 1]
                dense_r = extra[o + 2]
                done = extra[o + 3] > 0.5
                o += 4
                rews = tuple(
                    (sparse + dense_b) if blue else (-sparse + dense_r)
                    for blue in is_blue
                )
                updates = {
                    "sparse_blue": sparse,
                    "dense_blue": dense_b,
                    "dense_red": dense_r,
                    "done": done,
                }
                for on, tag in ((dense_blue_on, "blue"), (dense_red_on, "red")):
                    if not on:
                        continue
                    updates[f"pos_rew_{tag}"] = extra[o]
                    updates[f"pos_rew_agent_{tag}"] = extra[o + 1]
                    updates[f"pos_shaping_{tag}"] = extra[o + 2]
                    updates[f"pos_shaping_agent_{tag}"] = extra[o + 3]
                    updates[f"min_agent_dist_to_ball_{tag}"] = extra[o + 4]
                    o += 5
                return tuple(obs), rews, done, updates

        # silence the unused-variable lint for scen (kept for debuggability)
        del scen
        return FootballOutputs()

    # -- rendering ----------------------------------------------------------
    def extra_render(self, env, ax, env_index: int = 0):
        """Field background + blue-agent indices + shooting sectors
        (reference football.py extra_render + _get_background_geoms,
        football.py:1514-1566)."""
        import numpy as np

        from vmas_tpu.core.utils import Color
        from vmas_tpu.render import draw

        state = env.state
        half_l = self.pitch_length / 2
        half_w = self.pitch_width / 2
        if getattr(self, "_render_field", True):
            draw.draw_rect(ax, (0, 0), self.pitch_length, self.pitch_width, 0.0,
                           Color.GREEN, zorder=0)
            draw.draw_circle(ax, (0, 0), self.goal_size / 2, Color.WHITE,
                             filled=True, zorder=0)
            draw.draw_circle(ax, (0, 0), self.goal_size / 2 - 0.02, Color.GREEN,
                             filled=True, zorder=0)
        # white pitch lines (centre/left/right verticals, top/bottom horizontals)
        vlen = half_w - self.agent_size
        for x in (0.0, half_l - self.agent_size, -half_l + self.agent_size):
            draw.draw_line(ax, (x, -vlen), (x, vlen), Color.WHITE, zorder=1)
        hlen = half_l - self.agent_size
        for y in (half_w - self.agent_size, -half_w + self.agent_size):
            draw.draw_line(ax, (-hlen, y), (hlen, y), Color.WHITE, zorder=1)

        draw.draw_agent_indices(ax, env, state, env_index, start_from=1,
                                exclude=self.red_agents + [self.ball])

        if self.enable_shooting:
            pos = np.asarray(state.pos[env_index])
            rot = np.asarray(state.rot[env_index]).reshape(-1)
            ball_p = pos[self.ball.index]
            for agent in self.blue_agents:
                p, r = pos[agent.index], rot[agent.index]
                rel = ball_p - p
                within_range = np.linalg.norm(rel) <= self.shooting_radius
                rel_angle = (r - np.arctan2(rel[1], rel[0]) + np.pi) % (2 * np.pi) - np.pi
                within_angle = abs(rel_angle) <= self.shooting_angle / 2
                color = Color.PINK if (within_range and within_angle) else agent.color
                draw.draw_wedge(
                    ax, p, self.shooting_radius, r - self.shooting_angle / 2,
                    r + self.shooting_angle / 2, color, alpha=0.3, zorder=2,
                )

    def top_layer_render(self, env, ax, env_index: int = 0):
        """AI trajectory points: hermite-spline knots of each scripted team's
        current objectives, ``n_traj_points`` per agent (reference
        AgentPolicy.plot_traj + init_traj_pts, football.py:1020-1047,2051)."""
        if self.n_traj_points <= 0:
            return
        import numpy as np

        from vmas_tpu.render import draw

        scratch = env.state.scenario
        for controller, team in ((self.red_controller, self.red_agents),
                                 (self.blue_controller, self.blue_agents)):
            if controller is None or controller.key not in scratch:
                continue
            ai = scratch[controller.key]
            for i in range(len(team)):
                p0 = np.asarray(ai["start_pos"][env_index, i])
                p1 = np.asarray(ai["target_pos"][env_index, i])
                v0 = np.asarray(ai["start_vel"][env_index, i])
                v1 = np.asarray(ai["target_vel"][env_index, i])
                ctrl = np.stack([p0, p1, v0, v1])  # [4, 2]
                for u in np.linspace(0.0, 1.0, self.n_traj_points):
                    pt = hermite_coeffs(float(u), 0) @ ctrl
                    draw.draw_circle(ax, pt, 0.01, (0.5, 0.5, 0.5), filled=True,
                                     zorder=6)
