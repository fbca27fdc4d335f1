"""Scenario extra_render / top_layer_render hooks (VERDICT r1 missing #1).

The reference draws scenario debug geoms through BaseScenario.extra_render
(18 scenario files); the TPU build's hooks paint onto a matplotlib Axes.
For every scenario that implements a hook, build a tiny env, step once, and
assert the hook adds artists to a fresh Axes (geom-count check), plus a full
rgb_array render pass through the viewer for a sample of them.
"""

import matplotlib

matplotlib.use("Agg")

import matplotlib.pyplot as plt
import numpy as np
import pytest

from vmas_tpu import make_env
from vmas_tpu.scenario import BaseScenario

# scenario -> (kwargs, hooks expected to draw)
EXTRA_RENDER_SCENARIOS = {
    "passage": ({}, ["extra_render"]),
    "ball_passage": ({}, ["extra_render"]),
    "ball_trajectory": ({}, ["extra_render"]),
    "joint_passage": ({}, ["extra_render"]),
    "joint_passage_size": ({}, ["extra_render"]),
    "wind_flocking": ({}, ["extra_render"]),
    "multi_give_way": ({}, ["extra_render"]),
    # comms_range defaults to 0 (no comm lines) — use the reference's
    # lidar_range-ish value so the lines actually draw
    "navigation": ({"n_agents": 2, "comms_range": 5.0}, ["extra_render"]),
    "discovery": ({"n_agents": 2, "n_targets": 3}, ["extra_render"]),
    "sampling": ({"n_agents": 2}, ["extra_render"]),
    "simple_tag": ({}, ["extra_render"]),
    "line_trajectory": ({}, ["extra_render"]),
    "circle_trajectory": ({}, ["extra_render"]),
    "asym_joint": ({}, ["extra_render"]),
    "drone": ({}, ["extra_render"]),
    "diff_drive": ({}, ["extra_render"]),
    "kinematic_bicycle": ({}, ["extra_render"]),
    "painting": ({"n_agents": 2, "n_goals": 2}, ["top_layer_render"]),
    "road_traffic": ({"n_agents": 3}, ["extra_render"]),
    "football": (
        {"n_blue_agents": 2, "n_red_agents": 2, "ai_red_agents": True,
         "n_traj_points": 4},
        ["extra_render", "top_layer_render"],
    ),
}


def _artist_count(ax):
    return len(ax.patches) + len(ax.lines) + len(ax.texts) + len(ax.images)


@pytest.mark.parametrize("scenario", sorted(EXTRA_RENDER_SCENARIOS))
def test_hook_draws_geoms(scenario):
    kwargs, hooks = EXTRA_RENDER_SCENARIOS[scenario]
    env = make_env(scenario, num_envs=2, seed=0, **kwargs)
    env.step(env.get_random_actions())
    fig, ax = plt.subplots()
    try:
        for hook in hooks:
            # the hook must be the scenario's own, not the base no-op
            assert getattr(type(env.scenario), hook) is not getattr(BaseScenario, hook), (
                f"{scenario}.{hook} not overridden"
            )
            before = _artist_count(ax)
            getattr(env.scenario, hook)(env, ax, 0)
            assert _artist_count(ax) > before, f"{scenario}.{hook} drew nothing"
    finally:
        plt.close(fig)


def test_reference_extra_render_files_all_covered():
    """Every reference scenario with an extra_render body has one here
    (reference files listed in VERDICT r1 missing #1)."""
    reference_files = {
        "football", "joint_passage_size", "discovery", "sampling", "drone",
        "line_trajectory", "circle_trajectory", "kinematic_bicycle",
        "asym_joint", "diff_drive", "road_traffic", "multi_give_way",
        "ball_trajectory", "simple_tag", "ball_passage", "navigation",
        "passage", "painting", "wind_flocking", "joint_passage",
    }
    assert reference_files <= set(EXTRA_RENDER_SCENARIOS)


def test_legacy_hook_signature_still_renders():
    """A scenario written against the pre-round-2 geom-list contract
    (``extra_render(self, env_index=0) -> list``) must not crash
    env.render — the viewer detects the arity and calls it legacy-style."""
    env = make_env("dispersion", num_envs=2, seed=0)

    calls = []

    def legacy_hook(env_index=0):
        calls.append(env_index)
        return []

    env.scenario.extra_render = legacy_hook
    frame = env.render(mode="rgb_array", env_index=0)
    assert frame.ndim == 3 and calls == [0]


@pytest.mark.parametrize("scenario", ["passage", "football", "sampling"])
def test_rgb_render_includes_extras(scenario):
    """Full viewer path: rgb frame renders and the scenario hook changes
    pixels vs a base-hook render."""
    kwargs, hooks = EXTRA_RENDER_SCENARIOS[scenario]
    env = make_env(scenario, num_envs=2, seed=0, **kwargs)
    frame = env.render(mode="rgb_array", env_index=0)
    assert frame.ndim == 3 and frame.shape[-1] == 3 and frame.size > 0

    # suppress the scenario hooks -> the frame must differ
    sc = env.scenario
    originals = {h: getattr(type(sc), h) for h in hooks}
    try:
        for h in hooks:
            setattr(type(sc), h, getattr(BaseScenario, h))
        bare = env.render(mode="rgb_array", env_index=0)
    finally:
        for h, fn in originals.items():
            setattr(type(sc), h, fn)
    assert not np.array_equal(frame, bare), f"{scenario}: extras changed no pixels"


def test_interactive_env_headless_loop():
    """InteractiveEnv's play loop runs headless (Agg): steps, draws the
    obs/reward readout (reference interactive_rendering.py:134-151), resets
    on done, and key handlers mutate the control state."""
    from vmas_tpu.render.interactive import InteractiveEnv

    env = make_env("dispersion", num_envs=1, seed=0, n_agents=2, max_steps=2)
    ie = InteractiveEnv(env, control_two_agents=True, display_info=True)
    ie.run(max_steps=3)  # crosses the max_steps=2 done -> reset branch
    assert ie.total_rew == [0.0, 0.0]  # zeroed by the done-triggered reset

    class _Ev:
        def __init__(self, key):
            self.key = key

    ie.on_key_press(_Ev("tab"))
    # 2 agents, both controlled: TAB skips over agent2 and wraps back to 0
    assert ie.agent_index == 0 and ie.agent2_index == 1
    ie.on_key_press(_Ev("3"))
    assert ie.comm_value == 3
    ie.on_key_press(_Ev("up"))
    assert "up" in ie.keys
    ie.on_key_release(_Ev("up"))
    assert "up" not in ie.keys


def test_interactive_rendering_module_alias():
    """Reference import path `vmas.interactive_rendering` has a matching
    module here (class + entry point + CLI parser)."""
    from vmas_tpu.interactive_rendering import (
        InteractiveEnv, parse_args, render_interactively,
    )

    assert callable(render_interactively) and callable(InteractiveEnv.format_obs)
    args = parse_args(["--scenario", "balance", "--save_render"])
    assert args.scenario == "balance" and args.save_render


@pytest.mark.parametrize("continuous", [True, False])
def test_comm_message_text_overlay(continuous):
    """Human/rgb render draws one 'agent sends <word>' text line per
    non-silent agent on comm worlds (reference environment.py:1042-1064)."""
    env = make_env("simple_reference", num_envs=2, seed=0,
                   continuous_actions=continuous)
    env.step(env.get_random_actions())
    frame = env.render(mode="rgb_array")
    assert frame is not None and frame.ndim == 3
    fig = env._render_fig
    texts = [t.get_text() for t in fig.texts]
    senders = [t for t in texts if " sends " in t]
    expected = [a for a in env.world.agents if not a.silent]
    assert len(senders) == len(expected) == 2
    for agent, line in zip(expected, senders):
        assert line.startswith(f"{agent.name} sends ")
        if continuous:
            assert "[" in line and "]" in line  # comm vector readout
        else:
            word = line.split(" sends ")[1].strip()
            assert len(word) == 1 and word.isalpha()  # ALPHABET letter
