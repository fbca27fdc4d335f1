"""Gym / Gymnasium interop wrappers.

Behavioral reference: /root/reference/vmas/simulator/environment/gym/
(base.py, gym.py, gymnasium.py, gymnasium_vec.py). Conversion machinery is
identical in spirit: jax arrays -> numpy, env-0 extraction for non-vectorized
wrappers, info compression to an agent-name dict. The legacy GymWrapper keeps
the classic 4-tuple step API without requiring the old `gym` package.
"""

from __future__ import annotations

from abc import ABC, abstractmethod
from collections import namedtuple
from typing import List, Optional

import numpy as np

import gymnasium

from vmas_tpu.environment.environment import Environment

EnvData = namedtuple("EnvData", ["obs", "rews", "terminated", "truncated", "done", "info"])


def _to_numpy(data):
    if isinstance(data, dict):
        return {k: _to_numpy(v) for k, v in data.items()}
    if isinstance(data, (list, tuple)):
        return [_to_numpy(v) for v in data]
    return np.asarray(data)


def _extract_index(data, index):
    if isinstance(data, dict):
        return {k: _extract_index(v, index) for k, v in data.items()}
    return data[index]


class BaseGymWrapper(ABC):
    """Reference gym/base.py:22-131."""

    def __init__(self, env: Environment, return_numpy: bool, vectorized: bool):
        self._env = env
        self.return_numpy = return_numpy
        self.dict_spaces = env.dict_spaces
        self.vectorized = vectorized

    @property
    def env(self):
        return self._env

    def _maybe_to_numpy(self, data):
        return _to_numpy(data) if self.return_numpy else data

    def _convert_output(self, data, item: bool = False):
        if not self.vectorized:
            data = _extract_index(data, 0)
            if item:
                return data.item() if hasattr(data, "item") else data
        return self._maybe_to_numpy(data)

    def _compress_infos(self, infos):
        if isinstance(infos, dict):
            return infos
        return {self._env.agents[i].name: info for i, info in enumerate(infos)}

    def _convert_env_data(self, obs=None, rews=None, info=None, terminated=None,
                          truncated=None, done=None):
        keys = (
            [a.name for a in self._env.agents] if self.dict_spaces
            else range(self._env.n_agents)
        )
        for k in keys:
            if obs is not None:
                obs[k] = self._convert_output(obs[k])
            if info is not None:
                info[k] = self._convert_output(info[k])
            if rews is not None:
                rews[k] = self._convert_output(rews[k], item=True)
        terminated = self._convert_output(terminated, item=True) if terminated is not None else None
        truncated = self._convert_output(truncated, item=True) if truncated is not None else None
        done = self._convert_output(done, item=True) if done is not None else None
        info = self._compress_infos(info) if info is not None else None
        return EnvData(obs=obs, rews=rews, terminated=terminated, truncated=truncated,
                       done=done, info=info)

    def _action_list_to_array(self, list_in) -> List:
        if isinstance(list_in, dict):
            # dict keyed by agent name (same contract as Environment.step)
            list_in = [list_in[a.name] for a in self._env.agents]
        assert len(list_in) == self._env.n_agents, (
            f"Expecting actions for {self._env.n_agents} agents, got {len(list_in)} actions"
        )
        dtype = np.float32 if self._env.continuous_actions else np.int64
        return [
            np.asarray(act, dtype=dtype).reshape(
                self._env.num_envs, self._env.get_agent_action_size(agent)
            )
            for agent, act in zip(self._env.agents, list_in)
        ]

    @abstractmethod
    def step(self, action): ...

    @abstractmethod
    def reset(self, *, seed: Optional[int] = None, options: Optional[dict] = None): ...


class GymWrapper(BaseGymWrapper):
    """Classic single-env gym API (reference gym/gym.py:13-73)."""

    metadata = Environment.metadata

    def __init__(self, env: Environment, return_numpy: bool = True):
        super().__init__(env, return_numpy=return_numpy, vectorized=False)
        assert env.num_envs == 1, (
            f"GymEnv wrapper is not vectorised, got env.num_envs: {env.num_envs}"
        )
        assert not env.terminated_truncated, (
            "GymWrapper is not compatible with termination and truncation flags. "
            "Please set `terminated_truncated=False` in the environment."
        )
        self.observation_space = env.observation_space
        self.action_space = env.action_space

    @property
    def unwrapped(self) -> Environment:
        return self._env

    def step(self, action):
        action = self._action_list_to_array(action)
        obs, rews, done, info = self._env.step(action)
        d = self._convert_env_data(obs=obs, rews=rews, info=info, done=done)
        return d.obs, d.rews, d.done, d.info

    def reset(self, *, seed: Optional[int] = None, return_info: bool = False,
              options: Optional[dict] = None):
        if seed is not None:
            self._env.seed(seed)
        obs = self._env.reset_at(index=0)
        return self._convert_env_data(obs=obs).obs

    def render(self, mode="human", agent_index_focus: Optional[int] = None,
               visualize_when_rgb: bool = False, **kwargs):
        return self._env.render(mode=mode, env_index=0, agent_index_focus=agent_index_focus,
                                visualize_when_rgb=visualize_when_rgb, **kwargs)


class GymnasiumWrapper(gymnasium.Env, BaseGymWrapper):
    """Reference gym/gymnasium.py:25-88."""

    metadata = Environment.metadata

    def __init__(self, env: Environment, return_numpy: bool = True, render_mode: str = "human"):
        BaseGymWrapper.__init__(self, env, return_numpy=return_numpy, vectorized=False)
        assert env.num_envs == 1, (
            "GymnasiumEnv wrapper only supports singleton environments! "
            "For vectorized environments, use wrapper=gymnasium_vec."
        )
        assert env.terminated_truncated, (
            "GymnasiumWrapper requires terminated_truncated=True in the environment."
        )
        self.observation_space = env.observation_space
        self.action_space = env.action_space
        self.render_mode = render_mode

    @property
    def unwrapped(self) -> Environment:
        return self._env

    def step(self, action):
        action = self._action_list_to_array(action)
        obs, rews, terminated, truncated, info = self._env.step(action)
        d = self._convert_env_data(obs=obs, rews=rews, info=info,
                                   terminated=terminated, truncated=truncated)
        return d.obs, d.rews, d.terminated, d.truncated, d.info

    def reset(self, *, seed: Optional[int] = None, options: Optional[dict] = None):
        if seed is not None:
            self._env.seed(seed)
        obs, info = self._env.reset_at(index=0, return_info=True)
        d = self._convert_env_data(obs=obs, info=info)
        return d.obs, d.info

    def render(self, agent_index_focus: Optional[int] = None,
               visualize_when_rgb: bool = False, **kwargs):
        return self._env.render(mode=self.render_mode, env_index=0,
                                agent_index_focus=agent_index_focus,
                                visualize_when_rgb=visualize_when_rgb, **kwargs)


class GymnasiumVectorizedWrapper(gymnasium.Env, BaseGymWrapper):
    """Reference gym/gymnasium_vec.py:28-104 (no auto-reset, as upstream)."""

    metadata = Environment.metadata

    def __init__(self, env: Environment, return_numpy: bool = True, render_mode: str = "human"):
        BaseGymWrapper.__init__(self, env, return_numpy=return_numpy, vectorized=True)
        assert env.terminated_truncated, (
            "GymnasiumVectorizedWrapper requires terminated_truncated=True in the environment."
        )
        from gymnasium.vector.utils import batch_space

        self._num_envs = env.num_envs
        self.single_observation_space = env.observation_space
        self.single_action_space = env.action_space
        self.observation_space = batch_space(self.single_observation_space, n=self._num_envs)
        self.action_space = batch_space(self.single_action_space, n=self._num_envs)
        self.render_mode = render_mode

    @property
    def unwrapped(self) -> Environment:
        return self._env

    def step(self, action):
        action = self._action_list_to_array(action)
        obs, rews, terminated, truncated, info = self._env.step(action)
        d = self._convert_env_data(obs=obs, rews=rews, info=info,
                                   terminated=terminated, truncated=truncated)
        return d.obs, d.rews, d.terminated, d.truncated, d.info

    def reset(self, *, seed: Optional[int] = None, options: Optional[dict] = None):
        if seed is not None:
            self._env.seed(seed)
        obs, info = self._env.reset(return_info=True)
        d = self._convert_env_data(obs=obs, info=info)
        return d.obs, d.info

    def render(self, agent_index_focus: Optional[int] = None,
               visualize_when_rgb: bool = False, **kwargs):
        return self._env.render(mode=self.render_mode, agent_index_focus=agent_index_focus,
                                visualize_when_rgb=visualize_when_rgb, **kwargs)
