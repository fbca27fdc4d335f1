"""The vectorized RL environment.

Behavioral reference: /root/reference/vmas/simulator/environment/environment.py.

TPU-native structure: the whole pipeline — action decode (continuous /
discrete / multidiscrete, reference environment.py:615-754), scripted agents,
scenario action processing, dynamics, the physics step, and all
observation/reward/done/info extraction — is traced into TWO jitted programs
(`_step_fn`, `_reset_fn`). The host class only converts inputs, holds the
current state pytree, and advances the PRNG key.

RNG isolation (the reference's ``local_seed`` machinery, environment.py:30-64)
is inherent: randomness comes only from the explicit key threaded through the
jitted functions, so stepping can never perturb user RNG streams.

Partial reset ``reset_at(index)`` compiles once: the env index becomes a
one-hot ``[B]`` mask blended into the state (state.blend), not a Python index.
"""

from __future__ import annotations

import math
import os
from typing import Dict, List, Optional, Sequence, Union

import numpy as np
import jax
import jax.numpy as jnp

from vmas_tpu.core.state import WorldState, blend
from vmas_tpu.core.world import Agent
from vmas_tpu.scenario import BaseScenario


class Environment:
    metadata = {"render.modes": ["human", "rgb_array"], "runtime.vectorized": True}

    def __init__(
        self,
        scenario: BaseScenario,
        num_envs: int = 32,
        device=None,
        max_steps: Optional[int] = None,
        continuous_actions: bool = True,
        seed: Optional[int] = None,
        dict_spaces: bool = False,
        multidiscrete_actions: bool = False,
        clamp_actions: bool = False,
        grad_enabled: bool = False,
        terminated_truncated: bool = False,
        fused_physics: bool = False,
        **kwargs,
    ):
        if multidiscrete_actions:
            assert not continuous_actions, (
                "When asking for multidiscrete_actions, make sure continuous_actions=False"
            )
        self.scenario = scenario
        self.num_envs = num_envs
        self.batch_dim = num_envs
        self.device = device
        self.world = scenario.env_make_world(num_envs, device, **kwargs)
        if fused_physics:
            # single-pallas-kernel physics (core/fused.py); forward-only —
            # pallas defines no VJP, so it cannot combine with grad_enabled.
            # Contact-saturated worlds silently use the XLA path (supports()).
            assert not grad_enabled, (
                "fused_physics is forward-only (no pallas VJP); use the "
                "default XLA physics for differentiable rollouts"
            )
            self.world.fused = True
        # scenario-fused outputs: scenarios may emit their obs/rewards/done
        # as extra rows of the fused physics kernel (fused.FusedOutputs) —
        # the non-physics half of a step costs as much as the physics at
        # VMAS scales. Only engaged when the world actually runs fused.
        self._fused_outputs = None
        if getattr(self.world, "fused", False):
            from vmas_tpu.core import fused as _fused

            mk = getattr(scenario, "make_fused_outputs", None)
            if mk is not None and _fused.supports(self.world):
                self._fused_outputs = mk(self.world)
        if grad_enabled:
            # scenario-level pallas kernels (e.g. road_traffic's fused path
            # sweeps and all-ego obs) are forward-only like fused physics;
            # fall back to the XLA path for differentiable rollouts
            for flag in ("pallas_sweeps", "pallas_obs"):
                if getattr(scenario, flag, False):
                    setattr(scenario, flag, False)
        self.agents = self.world.policy_agents
        self.n_agents = len(self.agents)
        self.max_steps = max_steps
        self.continuous_actions = continuous_actions
        self.dict_spaces = dict_spaces
        self.clamp_action = clamp_actions
        self.grad_enabled = grad_enabled
        self.terminated_truncated = terminated_truncated
        self.multidiscrete_actions = multidiscrete_actions

        self._key = jax.random.PRNGKey(seed if seed is not None else 0)
        self.state: Optional[WorldState] = None
        self.steps = jnp.zeros(num_envs, jnp.int32)

        self._build_jit_fns()
        observations = self._do_reset(seed=seed)

        self.action_space = self.get_action_space()
        self.observation_space = self.get_observation_space(observations)

        # rendering (host-side, lazy)
        self.viewer = None
        self.headless = None
        self.visible_display = None

    # ------------------------------------------------------------------
    # compiled pipelines
    # ------------------------------------------------------------------
    def _plan_process_action(self):
        """Build-time grouping of ``world.agents`` for the process_action
        phase: ``(singles, groups)``.

        The reference applies actions in a per-agent Python loop
        (environment.py:325-404 via scenario.py:91-97); traced, that unrolls
        into N independent small-op chains, and many-agent worlds become
        bound by kernel COUNT, not math (road_traffic's 20 bicycle RK4
        chains were ~half its step). Agents whose env_process_action
        reduces to pure dynamics — no action_script, scenario does not
        override process_action — and whose dynamics advertise a
        ``batch_spec`` are grouped by (spec, action_size); each group runs
        one [B, A] ``process_action_batch``. Everything else stays in the
        original per-agent order.

        Default groups only ``batch_exact`` models (holonomic family /
        static / rotation — pure slice/stack/scatter, BITWISE equal to the
        loop). Transcendental models (kinematic_bicycle, diff_drive,
        forward) drift ~1 ulp/step when stacked (XLA picks different
        FMA/SIMD contractions; tests/test_dynamics_batch.py asserts the
        tight bound) — enough to compound past golden-parity tolerance on
        road_traffic map 2 over 50 steps for a measured ~7% win
        (road_traffic@512 TPU same-process A/B: 1160 -> 1084 us/step), so
        they group only under VMAS_TPU_BATCH_DYNAMICS=1;
        VMAS_TPU_BATCH_DYNAMICS=0 disables grouping entirely."""
        agents = list(self.world.agents)
        flag = os.environ.get("VMAS_TPU_BATCH_DYNAMICS", "exact").strip().lower()
        if flag in ("0", "false", "off"):
            return agents, []
        all_models = flag in ("1", "true", "on")
        if type(self.scenario).process_action is not BaseScenario.process_action:
            return agents, []
        groups: Dict = {}
        singles = []
        for a in agents:
            spec = None
            if a.action_script is None and a.action_size >= a.dynamics.needed_action_size:
                if all_models or a.dynamics.batch_exact():
                    spec = a.dynamics.batch_spec()
            if spec is None:
                singles.append(a)
            else:
                groups.setdefault((spec, a.action_size), []).append(a)
        out = []
        for grp in groups.values():
            if len(grp) >= 2:
                out.append(tuple(grp))
            else:
                singles.extend(grp)
        singles.sort(key=lambda a: a.index)
        return singles, out

    def _build_jit_fns(self):
        scenario = self.scenario
        world = self.world
        fo = self._fused_outputs
        pa_singles, pa_groups = self._plan_process_action()

        def obs_only(state: WorldState, obs_key):
            """Observations for the current state — the ONE place that
            encodes the plural-batch-hook-then-per-agent-fallback order
            (scenario.observations replaces the per-agent calls when it
            returns non-None, e.g. road_traffic's all-ego kernel)."""
            state = state.replace(scenario={**state.scenario, "__obs_key": obs_key})
            obs = scenario.observations(state)
            if obs is None:
                obs = tuple(scenario.observation(a, state) for a in self.agents)
            return obs

        def outputs(state: WorldState, steps, obs_key, with_rewards: bool = True,
                    fused_extra=None):
            # Observation-noise key, available to scenarios as
            # state.scenario["__obs_key"] (see BaseScenario.obs_key).
            state = state.replace(scenario={**state.scenario, "__obs_key": obs_key})
            if fused_extra is not None:
                # obs/rewards/termination were computed INSIDE the physics
                # kernel (fused.FusedOutputs); unpack replaces the
                # pre_rewards/reward/observation/done hooks, which the
                # scenario's emit mirrors (asserted by tests/test_fused.py)
                obs, rews, terminated, scratch_updates = fo.unpack(fused_extra, state)
                state = state.replace(
                    scenario={**state.scenario, **scratch_updates}
                )
                # post_rewards still runs: emit/unpack replace the
                # pre_rewards/reward/observation/done hooks only. Scenarios
                # whose post_rewards touches non-scratch state (dropout's
                # goal-rendering toggle) keep working; for the rest it is the
                # BaseScenario identity. It must be idempotent w.r.t. the
                # scratch updates emit already applied.
                state = scenario.post_rewards(state)
                # observation parts that must see the POST-post_rewards
                # state (the non-fused hook order — e.g. discovery's Lidar
                # after the covered-target respawn) are appended here
                obs = fo.finish_obs(obs, state)
                infos = tuple(scenario.info(a, state) for a in self.agents)
                if self.max_steps is not None:
                    truncated = steps >= self.max_steps
                else:
                    truncated = jnp.zeros_like(terminated)
                return state, obs, rews, terminated, truncated, infos
            rews = None
            if with_rewards:
                # Reward hooks may update scenario scratch; observations see
                # the post-reward state (reference computes rewards first,
                # environment.py:275-297).
                state = scenario.pre_rewards(state)
                rews = tuple(scenario.reward(a, state) for a in self.agents)
                state = scenario.post_rewards(state)
            obs = obs_only(state, obs_key)
            infos = tuple(scenario.info(a, state) for a in self.agents)
            terminated = scenario.done(state)
            if self.max_steps is not None:
                truncated = steps >= self.max_steps
            else:
                truncated = jnp.zeros_like(terminated)
            return state, obs, rews, terminated, truncated, infos

        def reset_fn(state: WorldState, steps, key, mask):
            key, obs_key = jax.random.split(key)
            fresh = scenario.env_reset_world_at(state, key)
            if mask is None:
                state = fresh
                steps = jnp.zeros_like(steps)
            else:
                state = blend(mask, fresh, state)
                steps = jnp.where(mask, 0, steps)
            state, obs, _, terminated, truncated, infos = outputs(
                state, steps, obs_key, with_rewards=False
            )
            return state, steps, obs, terminated, truncated, infos

        def canonical_u(state: WorldState) -> WorldState:
            # A scenario's process_action may write a WIDER u than the
            # agent's action_size (e.g. debug/drone prepends a thrust column,
            # mirroring reference debug/drone.py:67-74 where action.u's shape
            # oscillates per step). The widened u must be visible to the
            # reward/obs/info hooks (reference semantics), but the state that
            # leaves the step must have the spawn-time shape or it cannot be
            # a lax.scan carry. Every agent's u is freshly overwritten by
            # _decode_action (or its action_script) at the start of the next
            # step, so coercing here is invisible to all step semantics.
            new_u, changed = [], False
            for a, u in zip(world.agents, state.u):
                w = a.action_size
                if u.shape[1] == w:
                    new_u.append(u)
                elif u.shape[1] > w:
                    new_u.append(u[:, :w])
                    changed = True
                else:
                    new_u.append(jnp.pad(u, ((0, 0), (0, w - u.shape[1]))))
                    changed = True
            return state.replace(u=tuple(new_u)) if changed else state

        def step_fn(state: WorldState, steps, actions, key):
            key, obs_key = jax.random.split(key)
            keys = jax.random.split(key, max(self.n_agents, 1))
            for i, agent in enumerate(self.agents):
                state = self._decode_action(state, agent, actions[i], keys[i])
            # Per-agent hook order for scripted / scenario-processed /
            # non-batchable agents; same-dynamics groups run ONE batched
            # [B, A] computation each (bitwise equal to the loop — the
            # batched agents touch only their own rows and the remaining
            # hooks are identities for them; see _plan_process_action).
            for agent in pa_singles:
                state = scenario.env_process_action(agent, state)
            for group in pa_groups:
                state = group[0].dynamics.process_action_batch(world, state, group)
            state = scenario.pre_step(state)
            if fo is not None:
                state, fused_extra = world.step_with_outputs(state, fo)
            else:
                state = world.step(state)
                fused_extra = None
            state = scenario.post_step(state)
            steps = steps + 1
            out = outputs(state, steps, obs_key, fused_extra=fused_extra)
            return (canonical_u(out[0]),) + out[1:] + (steps,)

        self._reset_full = jax.jit(lambda s, st, k: reset_fn(s, st, k, None))
        self._reset_masked = jax.jit(reset_fn)
        self._step_fn_raw = step_fn  # unjitted, for debug/checkify wrappers
        self._obs_fn_raw = obs_only  # unjitted, for rollout/eager observers
        self._step_jit = jax.jit(step_fn, donate_argnums=(0,))

    # ------------------------------------------------------------------
    # action decoding (reference _set_action, environment.py:615-754)
    # ------------------------------------------------------------------
    def _decode_action(self, state: WorldState, agent: Agent, action, key) -> WorldState:
        dim_c = self.world.dim_c
        has_comm = dim_c > 0 and not agent.silent
        u_range = jnp.asarray(agent.u_range_array)
        u_mult = jnp.asarray(agent.u_multiplier_array)
        action = jnp.asarray(action)
        if action.ndim == 1:
            action = action[:, None]
        if not self.grad_enabled:
            action = jax.lax.stop_gradient(action)
        comm_action = None

        if self.continuous_actions:
            action = action.astype(jnp.float32)
            u = action[:, : agent.action_size]
            if has_comm:
                # comm always starts after the PHYSICAL action. The reference
                # slices at dim_p in the non-clamp path (environment.py:648),
                # which its own fork comment calls broken for
                # action_size > dim_p (environment.py:732-734); we use the
                # fork's intended semantics unconditionally.
                comm_action = action[:, agent.action_size :]
            if self.clamp_action:
                u = jnp.clip(u, -u_range[None], u_range[None])
                if comm_action is not None:
                    comm_action = jnp.clip(comm_action, 0.0, 1.0)
        else:
            nvec = list(agent.discrete_action_nvec) + ([dim_c] if has_comm else [])
            if not self.multidiscrete_actions:
                # Flat Discrete -> multidiscrete mixed-radix decode
                # (reference environment.py:660-680).
                flat = action[:, 0].astype(jnp.int32)
                # reference raises on out-of-bounds discrete actions
                # (environment.py _check_discrete_action); raising is
                # impossible under jit, so clamp into the valid range —
                # an OOB index would otherwise decode into forces beyond
                # u_range
                flat = jnp.clip(flat, 0, math.prod(nvec) - 1)
                cols = []
                for i in range(len(nvec)):
                    n = math.prod(nvec[i + 1 :])
                    cols.append(flat // n)
                    flat = flat % n
                action = jnp.stack(cols, axis=-1)
            action = action.astype(jnp.int32)

            us = []
            for j, n in enumerate(agent.discrete_action_nvec):
                a = action[:, j]
                if n % 2 != 0:
                    # odd n: action 0 maps to zero control
                    # (reference environment.py:695-699)
                    stay = a == 0
                    decrement = (a > 0) & (a <= n // 2)
                    a = jnp.where(stay, n // 2, jnp.where(decrement, a - 1, a))
                u_max = u_range[j]
                us.append((a.astype(jnp.float32) / (n - 1)) * (2 * u_max) - u_max)
            u = jnp.stack(us, axis=-1)
            if has_comm:
                comm_idx = action[:, len(agent.discrete_action_nvec)]
                comm_action = jax.nn.one_hot(comm_idx, dim_c, dtype=jnp.float32)

        u = u * u_mult[None]
        if np.any(agent.u_noise_array > 0):
            u = u + jax.random.normal(key, u.shape) * jnp.asarray(agent.u_noise_array)[None]
        state = agent.set_u(state, u)

        if has_comm:
            if agent.c_noise > 0:
                ckey = jax.random.fold_in(key, 1)
                comm_action = comm_action + jax.random.normal(ckey, comm_action.shape) * agent.c_noise
            state = state.replace(uc=state.uc.at[:, agent.slot].set(comm_action))
        return state

    # ------------------------------------------------------------------
    # public API (reference environment.py:112-404)
    # ------------------------------------------------------------------
    def _next_key(self):
        self._key, sub = jax.random.split(self._key)
        return sub

    def seed(self, seed=None):
        seed = 0 if seed is None else seed
        self._key = jax.random.PRNGKey(seed if seed is not None else 0)
        return [seed]

    def _do_reset(self, seed=None, return_observations=True, return_info=False, return_dones=False):
        if seed is not None:
            self.seed(seed)
        if self.state is None:
            self.state = self.world.spawn_state()
        self.state, self.steps, obs, terminated, truncated, infos = self._reset_full(
            self.state, self.steps, self._next_key()
        )
        return self._pack_result(obs, None, terminated, truncated, infos,
                                 return_observations, False, return_info, return_dones)

    def reset(self, seed=None, return_observations=True, return_info=False, return_dones=False):
        return self._do_reset(seed, return_observations, return_info, return_dones)

    def reset_at(self, index: int, return_observations=True, return_info=False, return_dones=False):
        self._check_batch_index(index)
        mask = jnp.zeros(self.num_envs, dtype=bool).at[index].set(True)
        return self.reset_mask(mask, return_observations, return_info, return_dones)

    def reset_mask(self, mask, return_observations=True, return_info=False, return_dones=False):
        """TPU-native extension: reset an arbitrary subset of envs in one
        compiled call (subsumes reset_at; useful for done-driven autoresets)."""
        self.state, self.steps, obs, terminated, truncated, infos = self._reset_masked(
            self.state, self.steps, self._next_key(), jnp.asarray(mask)
        )
        return self._pack_result(obs, None, terminated, truncated, infos,
                                 return_observations, False, return_info, return_dones)

    def step(self, actions: Union[List, Dict, Sequence]):
        """Vectorized step (reference environment.py:325-404).

        Accepts a list (agent order) or dict (agent-name keyed) of per-agent
        actions shaped [num_envs, action_size]; numpy / jax / torch / nested
        lists all accepted.
        """
        actions = self._normalize_actions(actions)
        (self.state, obs, rews, terminated, truncated, infos, self.steps) = self._step_jit(
            self.state, self.steps, tuple(actions), self._next_key()
        )
        return self._pack_result(obs, rews, terminated, truncated, infos, True, True, True, True)

    def done(self):
        terminated = self.scenario.done(self.state)
        if self.max_steps is not None:
            truncated = self.steps >= self.max_steps
        else:
            truncated = None
        if self.terminated_truncated:
            if truncated is None:
                truncated = jnp.zeros_like(terminated)
            return terminated, truncated
        if truncated is None:
            return terminated
        return terminated | truncated

    def get_from_scenario(self, get_observations: bool, get_rewards: bool, get_infos: bool,
                          get_dones: bool, dict_agent_names: Optional[bool] = None):
        """Reference environment.py:150-180; computed eagerly on the current
        state (not part of the compiled step)."""
        if not any([get_observations, get_rewards, get_infos, get_dones]):
            return
        if dict_agent_names is None:
            dict_agent_names = self.dict_spaces
        # fresh obs-noise key per call (the reference draws fresh torch noise
        # per observation under local_seed)
        obs_key = self._next_key()
        state = self.state.replace(
            scenario={**self.state.scenario, "__obs_key": obs_key}
        )
        if get_rewards:
            # reward hooks only when rewards are requested — matches the
            # compiled reset path and the reference
            state = self.scenario.pre_rewards(state)
        rews = tuple(self.scenario.reward(a, state) for a in self.agents) if get_rewards else None
        if get_rewards:
            state = self.scenario.post_rewards(state)
            self.state = state
        # same plural-hook-then-fallback order as the compiled outputs path
        obs = self._obs_fn_raw(state, obs_key) if get_observations else None
        infos = tuple(self.scenario.info(a, state) for a in self.agents) if get_infos else None

        result = []
        for vals in (obs, rews):
            if vals is not None:
                result.append(self._maybe_dict(vals, dict_agent_names))
        if get_dones:
            d = self.done()
            if self.terminated_truncated:
                result.extend(d)
            else:
                result.append(d)
        if infos is not None:
            result.append(self._maybe_dict(infos, dict_agent_names))
        return result

    # ------------------------------------------------------------------
    # spaces (reference environment.py:430-522)
    # ------------------------------------------------------------------
    def get_agent_action_size(self, agent: Agent):
        if self.continuous_actions:
            return agent.action_size + (self.world.dim_c if not agent.silent else 0)
        elif self.multidiscrete_actions:
            return agent.action_size + (1 if not agent.silent and self.world.dim_c != 0 else 0)
        return 1

    def get_agent_action_space(self, agent: Agent):
        from gymnasium import spaces

        dim_c = self.world.dim_c
        if self.continuous_actions:
            return spaces.Box(
                low=np.array(
                    (-agent.u_range_array).tolist() + [0] * (dim_c if not agent.silent else 0),
                    dtype=np.float32,
                ),
                high=np.array(
                    agent.u_range_array.tolist() + [1] * (dim_c if not agent.silent else 0),
                    dtype=np.float32,
                ),
                shape=(self.get_agent_action_size(agent),),
                dtype=np.float32,
            )
        elif self.multidiscrete_actions:
            nvec = agent.discrete_action_nvec + ([dim_c] if not agent.silent and dim_c != 0 else [])
            return spaces.MultiDiscrete(nvec)
        else:
            return spaces.Discrete(
                math.prod(agent.discrete_action_nvec)
                * (dim_c if not agent.silent and dim_c != 0 else 1)
            )

    def get_agent_observation_space(self, agent: Agent, obs):
        from gymnasium import spaces

        if isinstance(obs, dict):
            return spaces.Dict(
                {k: self.get_agent_observation_space(agent, v) for k, v in obs.items()}
            )
        arr = np.asarray(obs)
        return spaces.Box(low=-np.float32("inf"), high=np.float32("inf"),
                          shape=arr.shape[1:], dtype=np.float32)

    def get_action_space(self):
        from gymnasium import spaces

        if not self.dict_spaces:
            return spaces.Tuple([self.get_agent_action_space(a) for a in self.agents])
        return spaces.Dict({a.name: self.get_agent_action_space(a) for a in self.agents})

    def get_observation_space(self, observations):
        from gymnasium import spaces

        if not self.dict_spaces:
            return spaces.Tuple(
                [self.get_agent_observation_space(a, observations[i]) for i, a in enumerate(self.agents)]
            )
        return spaces.Dict(
            {a.name: self.get_agent_observation_space(a, observations[a.name]) for a in self.agents}
        )

    # ------------------------------------------------------------------
    # random actions (reference environment.py:524-606)
    # ------------------------------------------------------------------
    def get_random_action(self, agent: Agent):
        key = self._next_key()
        if self.continuous_actions:
            ranges = jnp.asarray(agent.u_range_array)
            ks = jax.random.split(key, 2)
            u = jax.random.uniform(
                ks[0], (self.num_envs, agent.action_size), minval=-1.0, maxval=1.0
            ) * ranges[None]
            if self.world.dim_c != 0 and not agent.silent:
                comm = jax.random.uniform(ks[1], (self.num_envs, self.world.dim_c))
                u = jnp.concatenate([u, comm], axis=-1)
            return u
        space = self.get_agent_action_space(agent)
        if self.multidiscrete_actions:
            cols = [
                jax.random.randint(jax.random.fold_in(key, i), (self.num_envs,), 0, int(n))
                for i, n in enumerate(space.nvec)
            ]
            return jnp.stack(cols, axis=-1)
        return jax.random.randint(key, (self.num_envs,), 0, int(space.n))

    def get_random_actions(self):
        return [self.get_random_action(agent) for agent in self.agents]

    # ------------------------------------------------------------------
    # helpers
    # ------------------------------------------------------------------
    def _check_batch_index(self, batch_index):
        if batch_index is not None:
            assert 0 <= batch_index < self.num_envs, (
                f"Index must be between 0 and {self.num_envs}, got {batch_index}"
            )

    def _normalize_actions(self, actions):
        if isinstance(actions, dict):
            actions_list = []
            for agent in self.agents:
                if agent.name not in actions:
                    raise AssertionError(f"Agent '{agent.name}' not contained in action dict")
                actions_list.append(actions[agent.name])
            assert len(actions) == self.n_agents, (
                f"Expecting actions for {self.n_agents}, got {len(actions)} actions"
            )
            actions = actions_list
        assert len(actions) == self.n_agents, (
            f"Expecting actions for {self.n_agents}, got {len(actions)} actions"
        )
        out = []
        for i, a in enumerate(actions):
            if hasattr(a, "detach"):  # torch tensor
                a = a.detach().cpu().numpy()
            if not isinstance(a, jnp.ndarray):
                a = jnp.asarray(np.asarray(a))
            if a.ndim == 1:
                a = a[:, None]
            assert a.shape[0] == self.num_envs, (
                f"Actions used in input of env must be of len {self.num_envs}, got {a.shape[0]}"
            )
            assert a.shape[1] == self.get_agent_action_size(self.agents[i]), (
                f"Action for agent {self.agents[i].name} has shape {a.shape[1]}, "
                f"but should have shape {self.get_agent_action_size(self.agents[i])}"
            )
            out.append(a)
        return out

    def _maybe_dict(self, vals, dict_agent_names):
        if dict_agent_names:
            return {a.name: v for a, v in zip(self.agents, vals)}
        return list(vals)

    def _pack_result(self, obs, rews, terminated, truncated, infos,
                     ret_obs, ret_rews, ret_info, ret_dones):
        result = []
        if ret_obs:
            result.append(self._maybe_dict(obs, self.dict_spaces))
        if ret_rews and rews is not None:
            result.append(self._maybe_dict(rews, self.dict_spaces))
        if ret_dones:
            if self.terminated_truncated:
                result.append(terminated)
                result.append(truncated)
            else:
                result.append(terminated | truncated if self.max_steps is not None else terminated)
        if ret_info:
            result.append(self._maybe_dict(infos, self.dict_spaces))
        if len(result) == 1:
            return result[0]
        return result

    def to(self, device):
        """API parity; JAX manages placement."""
        return self

    def render(self, *args, **kwargs):
        from vmas_tpu.render.viewer import render_env

        return render_env(self, *args, **kwargs)
