"""Sampling scenario (gaussian-mixture field coverage).

Behavioral reference: /root/reference/vmas/scenarios/sampling.py. The
per-env gaussian locations, visited-cell grid, and pdf normalizer live in
scratch; the reference's per-cell python normalization loop
(sampling.py:246-265) becomes one batched pdf evaluation over the whole grid.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

from vmas_tpu.core import Agent, Sphere, World
from vmas_tpu.scenario import BaseScenario
from vmas_tpu.sensors import Lidar
from vmas_tpu.utils import ScenarioUtils


class Scenario(BaseScenario):
    def make_world(self, batch_dim: int, device=None, **kwargs):
        self.n_agents = kwargs.pop("n_agents", 3)
        self.shared_rew = kwargs.pop("shared_rew", True)
        self.comms_range = kwargs.pop("comms_range", 0.0)
        self.lidar_range = kwargs.pop("lidar_range", 0.2)
        self.agent_radius = kwargs.pop("agent_radius", 0.025)
        self.xdim = kwargs.pop("xdim", 1)
        self.ydim = kwargs.pop("ydim", 1)
        self.grid_spacing = kwargs.pop("grid_spacing", 0.05)
        self.n_gaussians = kwargs.pop("n_gaussians", 3)
        self.cov = kwargs.pop("cov", 0.05)
        self.collisions = kwargs.pop("collisions", True)
        self.spawn_same_pos = kwargs.pop("spawn_same_pos", False)
        self.norm = kwargs.pop("norm", True)
        ScenarioUtils.check_kwargs_consumed(kwargs)

        assert not (self.spawn_same_pos and self.collisions)
        assert (self.xdim / self.grid_spacing) % 1 == 0 and (self.ydim / self.grid_spacing) % 1 == 0
        self.covs = [self.cov] * self.n_gaussians if isinstance(self.cov, float) else self.cov
        assert len(self.covs) == self.n_gaussians

        self.plot_grid = False
        self.visualize_semidims = False
        self.n_x_cells = int((2 * self.xdim) / self.grid_spacing)
        self.n_y_cells = int((2 * self.ydim) / self.grid_spacing)
        self.agent_xspawn_range = 0 if self.spawn_same_pos else self.xdim
        self.agent_yspawn_range = 0 if self.spawn_same_pos else self.ydim
        self.x_semidim = self.xdim - self.agent_radius
        self.y_semidim = self.ydim - self.agent_radius

        world = World(batch_dim, device, x_semidim=self.x_semidim, y_semidim=self.y_semidim)
        entity_filter_agents = lambda e: isinstance(e, Agent)
        for i in range(self.n_agents):
            world.add_agent(
                Agent(
                    name=f"agent_{i}", render_action=True, collide=self.collisions,
                    shape=Sphere(radius=self.agent_radius),
                    sensors=(
                        [
                            Lidar(
                                world, angle_start=0.05, angle_end=2 * math.pi + 0.05,
                                n_rays=12, max_range=self.lidar_range,
                                entity_filter=entity_filter_agents,
                            )
                        ]
                        if self.collisions
                        else None
                    ),
                )
            )
        return world

    # ------------------------------------------------------------------
    def _pdf(self, locs, pos):
        """Sum of isotropic gaussian pdfs; pos [..., 2], locs [B, G, 2]."""
        d = pos[..., None, :] - locs  # [..., G, 2]
        covs = jnp.asarray(self.covs, jnp.float32)
        sq = jnp.sum(d * d, axis=-1)  # [..., G]
        return (jnp.exp(-0.5 * sq / covs) / (2 * math.pi * covs)).sum(-1)

    def _max_pdf(self, locs):
        """Batched pdf max over the sampling grid, cells clamped to the
        semidims like the reference (sampling.py:209-231)."""
        xs = jnp.arange(-self.xdim, self.xdim, self.grid_spacing, dtype=jnp.float32)
        ys = jnp.arange(-self.ydim, self.ydim, self.grid_spacing, dtype=jnp.float32)
        gx, gy = jnp.meshgrid(xs, ys, indexing="ij")
        grid = jnp.stack([gx.ravel(), gy.ravel()], axis=-1)  # [C, 2]
        grid = jnp.stack(
            [
                jnp.clip(grid[:, 0], -self.x_semidim, self.x_semidim),
                jnp.clip(grid[:, 1], -self.y_semidim, self.y_semidim),
            ],
            axis=-1,
        )
        pdf = self._pdf(locs[:, None], grid[None])  # [B, C]
        return pdf.max(axis=-1)

    def _sample(self, scratch, pos, update_sampled_flag=False, norm=True):
        """Reference Scenario.sample (sampling.py:171-207)."""
        B = pos.shape[0]
        oob = (
            (pos[:, 0] < -self.xdim) | (pos[:, 0] > self.xdim)
            | (pos[:, 1] < -self.ydim) | (pos[:, 1] > self.ydim)
        )
        pos = jnp.stack(
            [
                jnp.clip(pos[:, 0], -self.x_semidim, self.x_semidim),
                jnp.clip(pos[:, 1], -self.y_semidim, self.y_semidim),
            ],
            axis=-1,
        )
        index = pos / self.grid_spacing + jnp.asarray([self.n_x_cells / 2, self.n_y_cells / 2])
        index = index.astype(jnp.int32)
        v = self._pdf(scratch["locs"], pos)
        if norm:
            v = v / scratch["max_pdf"]
        b = jnp.arange(B)
        already = scratch["sampled"][b, index[:, 0], index[:, 1]]
        v = jnp.where(already | oob, 0.0, v)
        if update_sampled_flag:
            scratch = dict(scratch)
            scratch["sampled"] = scratch["sampled"].at[b, index[:, 0], index[:, 1]].set(True)
        return v, scratch

    # ------------------------------------------------------------------
    def reset_world_at(self, state, key):
        B = state.batch_dim
        k1, k2 = jax.random.split(key)
        locs = jnp.stack(
            [
                jax.random.uniform(jax.random.fold_in(k1, g), (B, 2),
                                   minval=jnp.asarray([-self.xdim, -self.ydim], jnp.float32),
                                   maxval=jnp.asarray([self.xdim, self.ydim], jnp.float32))
                for g in range(self.n_gaussians)
            ],
            axis=1,
        )  # [B, G, 2]
        scratch = dict(state.scenario)
        scratch["locs"] = locs
        scratch["sampled"] = jnp.zeros((B, self.n_x_cells, self.n_y_cells), bool)
        scratch["max_pdf"] = self._max_pdf(locs)

        for i, agent in enumerate(self.world.agents):
            ki = jax.random.fold_in(k2, i)
            pos = jnp.stack(
                [
                    jax.random.uniform(ki, (B,), minval=-self.agent_xspawn_range,
                                       maxval=self.agent_xspawn_range),
                    jax.random.uniform(jax.random.fold_in(ki, 1), (B,),
                                       minval=-self.agent_yspawn_range,
                                       maxval=self.agent_yspawn_range),
                ],
                axis=-1,
            )
            state = agent.set_pos(state, pos)
        samples = []
        for agent in self.world.agents:
            v, _ = self._sample(scratch, agent.pos(state), norm=self.norm)
            samples.append(v)
        scratch["agent_samples"] = jnp.stack(samples, axis=-1)  # [B, A]
        scratch["sampling_rew"] = jnp.zeros((B,), jnp.float32)
        return state.replace(scenario=scratch)

    def pre_rewards(self, state):
        scratch = dict(state.scenario)
        samples = []
        for a in self.world.agents:
            v, scratch = self._sample(
                scratch, a.pos(state), update_sampled_flag=True, norm=self.norm
            )
            samples.append(v)
        scratch["agent_samples"] = jnp.stack(samples, axis=-1)
        scratch["sampling_rew"] = scratch["agent_samples"].sum(-1)
        return state.replace(scenario=scratch)

    def reward(self, agent, state):
        s = state.scenario
        return s["sampling_rew"] if self.shared_rew else s["agent_samples"][:, agent.slot]

    def observation(self, agent, state):
        obs = [agent.pos(state), agent.vel(state)]
        if self.collisions:
            obs.append(agent.sensors[0].measure(state))
        for delta in [
            [self.grid_spacing, 0], [-self.grid_spacing, 0],
            [0, self.grid_spacing], [0, -self.grid_spacing],
            [-self.grid_spacing, -self.grid_spacing], [self.grid_spacing, -self.grid_spacing],
            [-self.grid_spacing, self.grid_spacing], [self.grid_spacing, self.grid_spacing],
        ]:
            pos = agent.pos(state) + jnp.asarray(delta, jnp.float32)
            v, _ = self._sample(state.scenario, pos, norm=self.norm)
            obs.append(v[:, None])
        return jnp.concatenate(obs, axis=-1)

    def info(self, agent, state):
        return {"agent_sample": state.scenario["agent_samples"][:, agent.slot]}

    def extra_render(self, env, ax, env_index: int = 0):
        """Gaussian-density heat map + communication lines + perimeter
        (reference sampling.py extra_render)."""
        import numpy as np

        from vmas_tpu.render import draw
        from vmas_tpu.render.viewer import render_function_util

        locs = env.state.scenario["locs"][env_index : env_index + 1]  # [1, G, 2]

        def density(pts):
            return np.asarray(self._pdf(locs, jnp.asarray(pts)[:, None, :])[:, 0])

        render_function_util(
            density, (self.xdim, self.ydim), ax, cmap_alpha=0.5, precision=0.05
        )
        draw.draw_comm_lines(ax, env, env.state, env_index, self.comms_range)
        draw.draw_perimeter(ax, self.xdim, self.ydim)
