"""Scenario-level parity vs recorded PyTorch reference trajectories.

For each golden file (tests/golden/gen_scenario_cases.py) we inject the
reference's post-reset state, refresh scenario scratch (shaping baselines) on
the injected state with one discarded reward cycle, then replay the recorded
raw actions through the full vmas_tpu env step and compare rewards,
observations, dones and the entity state trajectory step by step.

This is the BASELINE.json "fixed-seed trajectory parity" harness at the
scenario layer: RNG streams can't match torch bit-for-bit, so identical
*sampled* initial states and actions are injected instead (SURVEY.md section
7, hard part 1).
"""

import glob
import os

import jax.numpy as jnp
import numpy as np
import pytest

from vmas_tpu import make_env

DATA = os.path.join(os.path.dirname(__file__), "golden", "data")
KWARGS = {
    "transport": dict(n_agents=4),
    "football": dict(ai_red_agents=False),
    # scripted AI ON: the reference's sampled check_better_positions
    # objectives were recorded per step and are injected as scratch
    # (PER_STEP_INJECT below), trajectory-testing the rest of the AI —
    # possession, dribble, go_to, hermite control, ball script. The
    # candidate *selection* is deliberately not compared: the reference's
    # gather returns env-0's candidates for every env (football.py:2170),
    # which our port fixes.
    "football_ai": dict(ai_forced_objectives=True),
    "painting_full": dict(task_type="full", n_agents=3, n_goals=3),
    "het_mass": dict(mass_noise=0),
    "asym_joint": dict(obs_noise=0),
    "pollock": dict(n_agents=5, n_lines=5, n_boxes=5, lidar=True),
    "road_traffic": dict(is_add_noise=False),
    "road_traffic_map2": dict(is_add_noise=False, map_type="2"),
    "road_traffic_map3": dict(is_add_noise=False, map_type="3", n_agents=4,
                          scenario_probabilities=[0.4, 0.3, 0.3]),
}
# case name -> scenario name when they differ (multi-config scenarios)
CASE_SCENARIO = {
    "painting_full": "painting",
    "road_traffic_map2": "road_traffic",
    "road_traffic_map3": "road_traffic",
    "football_ai": "football",
}


def _inject_football_ai(env, d, t):
    """Write the reference AI's recorded step-t objectives into the red
    controller's scratch (consumed by dribble_policy under
    ai_forced_objectives=True)."""
    scr = dict(env.state.scenario)
    ai = dict(scr["ai_Red"])
    ai["forced_best_pos"] = jnp.asarray(
        d["extra_step_ai_best_pos"][t]
    ).transpose(1, 0, 2)  # [A, B, 2] -> [B, A, 2]
    scr["ai_Red"] = ai
    env.state = env.state.replace(scenario=scr)


# case -> fn(env, data, t) run before each replay step
PER_STEP_INJECT = {
    "football_ai": _inject_football_ai,
}
# collision/contact-heavy scenes accumulate fp reorder noise faster.
# The stiff-contact set free-runs only 10 steps (REPLAY_T below) — at 50
# its f32-reorder drift compounds past any meaningful tolerance (measured
# in round 3: atol bumps only delay the failure step, and buzz_wire's ±10
# wire-touch reward flips on sub-atol pos drift). Since round 5 the SAME
# recordings carry 50 steps and test_scenario_parity_resync verifies them
# ALL: re-syncing to the recorded reference state each step kills the
# amplification, so each step is a fresh one-step parity check.
ATOL = {
    "transport": 2e-3,
    "reverse_transport": 2e-3,
    "balance": 2e-3,
    "wheel": 2e-3,
    "passage": 2e-3,
    "give_way": 2e-3,
    "navigation": 2e-3,
    "flocking": 2e-3,
    "dispersion": 1e-4,
    # joint scenarios run substeps of stiff constraint+contact forces; single
    # contact lanes accumulate fp-reorder noise fastest (pos stays ≤2e-3)
    "ball_trajectory": 4e-3,
    "buzz_wire": 4e-3,
    "joint_passage": 4e-3,
    "joint_passage_size": 4e-3,
    "asym_joint": 4e-3,
}

# free-running replay horizon for the stiff-contact set (recordings are
# 50 steps; the tail verifies via the re-sync test below)
REPLAY_T = {
    "asym_joint": 10,
    "ball_trajectory": 10,
    "buzz_wire": 10,
    "joint_passage": 10,
    "passage": 10,
    "kinematic_bicycle": 10,
    "pollock": 10,
}

CASES = sorted(
    os.path.basename(p)[len("scenario_") : -len(".npz")]
    for p in glob.glob(os.path.join(DATA, "scenario_*.npz"))
)


def inject(env, pos, vel, rot, ang_vel):
    state = env.state
    state = state.replace(
        pos=jnp.asarray(pos),
        vel=jnp.asarray(vel),
        rot=jnp.asarray(rot),
        ang_vel=jnp.asarray(ang_vel),
        force=jnp.zeros_like(state.force),
        torque=jnp.zeros_like(state.torque),
    )
    return state


# dispersion's reward has no shaping scratch — a refresh would consume the
# food-eaten events the reference scores on step 1 (agents spawn at the
# origin, sometimes on food). flocking's reward cycle also advances the
# scripted target's clock "t", which must stay at 0.
NO_REFRESH = {"dispersion", "sampling", "road_traffic", "road_traffic_map2",
              "road_traffic_map3"}
RESTORE_SCRATCH = {"flocking": ("t",), "wind_flocking": ("t", "wind_shaping")}
# wind_flocking's reward cycle rescales the big agent's per-env wind gravity
# (reference set_friction, wind_flocking.py:356-370); the reference's first
# step still runs with the full reset-time wind, so restore it post-refresh.
RESTORE_STATE_FIELDS = {"wind_flocking": ("dyn_gravity",)}


def _rebuild_sampling(env, state, d):
    """sampling's gaussian field is random reset scratch: inject the recorded
    mixture means and rebuild max_pdf / sampled grid / reset-time agent
    samples exactly as reset_world_at does (reference sampling.py:108-168)."""
    sc = env.scenario
    locs = jnp.asarray(d["extra_locs"])  # [B, G, 2]
    scr = dict(state.scenario)
    scr["locs"] = locs
    scr["sampled"] = jnp.zeros_like(scr["sampled"])
    scr["max_pdf"] = sc._max_pdf(locs)
    samples = [
        sc._sample(scr, a.pos(state), norm=sc.norm)[0] for a in sc.world.agents
    ]
    scr["agent_samples"] = jnp.stack(samples, axis=-1)
    scr["sampling_rew"] = jnp.zeros_like(scr["sampling_rew"])
    return state.replace(scenario=scr)


def _rebuild_joint_passage_size(env, state, d):
    """joint_passage_size keeps passage geometry in scratch (reference stores
    it on self at reset, joint_passage_size.py:576-600); rebuild it from the
    injected non-collide passage entity positions (order: big, big+1, small)."""
    sc = env.scenario
    nc = sc.non_collide_passages
    big = (state.pos[:, nc[0].index] + state.pos[:, nc[1].index]) / 2
    small = state.pos[:, nc[2].index]
    lr = jnp.where(small[:, 0] > big[:, 0], 4, -3).astype(jnp.int32)
    scr = dict(state.scenario)
    scr["big_passage_pos"] = big
    scr["small_passage_pos"] = small
    scr["pass_center"] = (big + small) / 2
    scr["small_left_or_right"] = lr
    scr["middle_angle"] = jnp.where(lr > 0, jnp.pi, 0.0)
    return state.replace(scenario=scr)


# scenarios whose reset derives geometric scratch from RNG draws: rebuild the
# scratch from the injected entity positions before the shaping refresh
def _broadcast_goal(key_out):
    """MPE goal choice is a batch-wide scalar in the reference
    (simple_adversary.py:54-57); ours is per-env scratch — broadcast it."""

    def hook(env, state, d):
        scr = dict(state.scenario)
        scr[key_out] = jnp.full_like(scr[key_out], int(d["extra_goal_idx"]))
        return state.replace(scenario=scr)

    return hook


def _rebuild_simple_reference(env, state, d):
    scr = dict(state.scenario)
    scr["goal_b_0"] = jnp.full_like(scr["goal_b_0"], int(d["extra_goal_b_0"]))
    scr["goal_b_1"] = jnp.full_like(scr["goal_b_1"], int(d["extra_goal_b_1"]))
    return state.replace(scenario=scr)


def _rebuild_simple_crypto(env, state, d):
    scr = dict(state.scenario)
    scr["key"] = jnp.asarray(d["extra_key"], jnp.float32)
    scr["secret"] = jnp.asarray(d["extra_secret"], jnp.float32)
    return state.replace(scenario=scr)


def _rebuild_road_traffic(env, state, d):
    """road_traffic's per-(env,agent) reference-path assignment is random
    reset scratch (reference reset_init_state, road_traffic.py:1115-1131);
    inject the recorded path/point ids and rebuild the derived path scratch
    exactly as reset_world_at does post-placement."""
    sc = env.scenario
    scr = dict(state.scenario)
    scr["path_id"] = jnp.asarray(d["extra_path_id"], jnp.int32)
    scr["point_id"] = jnp.asarray(d["extra_point_id"], jnp.int32)
    if "extra_scenario_id" in d:
        # maps 2/3: per-(env,agent) sub-map assignment is random reset
        # scratch too (reference reset_scenario_related_ref_paths)
        sid = jnp.asarray(d["extra_scenario_id"], jnp.int32)
        scr["scenario_id"] = sid
        if sc.map_type == "3":
            # the reference's path_id indexes the CURRENT sub-map's path
            # list (road_traffic.py:1106); ours is global into the packed
            # [intersection, merge-in, merge-out] table
            offs = jnp.asarray(sc.section_offsets, jnp.int32)
            scr["path_id"] = scr["path_id"] + offs[sid - 1]
    scr = sc._update_distances(state, scr)
    scr["short_term"] = jnp.zeros_like(scr["short_term"])
    scr = sc._refresh_short_term(scr)
    pos, rot, vel = sc._agent_arrays(state)
    scr["prev_pos"] = pos
    scr["steering_cur"] = jnp.zeros_like(scr["steering_cur"])
    scr["steering_prev"] = jnp.zeros_like(scr["steering_prev"])
    scr["rew_all"] = jnp.zeros_like(scr["rew_all"])
    return state.replace(scenario=scr)


def _rebuild_dots(env, state, d):
    """DOTS knowledge states are random reset scratch (dots_core.py:95-160);
    inject the recorded per-agent knowledge and per-goal expected knowledge."""
    sc = env.scenario
    if "extra_agent_knowledge" in d:
        ak = jnp.asarray(d["extra_agent_knowledge"], jnp.float32)
        for i, a in enumerate(sc.agent_list):
            state = a.set_knowledge(state, ak[:, i])
    if "extra_goal_knowledge" in d:
        gk = jnp.asarray(d["extra_goal_knowledge"], jnp.float32)
        for j, g in enumerate(sc.goals):
            state = g.set_expected_knowledge(state, gk[:, j])
    return state


REBUILD_SCRATCH = {
    "joint_passage_size": _rebuild_joint_passage_size,
    "sampling": _rebuild_sampling,
    "road_traffic": _rebuild_road_traffic,
    "road_traffic_map2": _rebuild_road_traffic,
    "road_traffic_map3": _rebuild_road_traffic,
    "painting": _rebuild_dots,
    "painting_full": _rebuild_dots,
    "simple_adversary": _broadcast_goal("goal_idx"),
    "simple_push": _broadcast_goal("goal_idx"),
    "simple_speaker_listener": _broadcast_goal("goal_idx"),
    "simple_reference": _rebuild_simple_reference,
    "simple_crypto": _rebuild_simple_crypto,
}


def refresh_scratch(env, state, name):
    """One discarded reward cycle so shaping baselines are recomputed from the
    injected state (the reference computed them in reset_world_at from the
    same positions)."""
    if name in NO_REFRESH:
        return state
    scenario = env.scenario
    keep = {k: state.scenario[k] for k in RESTORE_SCRATCH.get(name, ())}
    keep_fields = {
        k: getattr(state, k) for k in RESTORE_STATE_FIELDS.get(name, ())
    }
    state = scenario.pre_rewards(state)
    for a in env.agents:
        scenario.reward(a, state)
    state = scenario.post_rewards(state)
    if keep:
        state = state.replace(scenario={**state.scenario, **keep})
    if keep_fields:
        state = state.replace(**keep_fields)
    return state


# Stiff-contact scenes (collision_force 500+, many substeps) have argmin
# discontinuities in the closest-point kernels: an fp-reorder tie flips the
# contact edge and a single env's trajectory forks. Allow that many envs to
# drift (bounded), assert the rest exactly — and assert post-hoc that every
# forked env actually WAS in contact at its fork step (a fork away from
# contact would be a real kernel bug, not a tie flip).
CHAOTIC_ENVS = {
    "kinematic_bicycle": 1,
    "pollock": 1,
    # top-K nearing-agent selection ties flip on sub-atol pos drift late in
    # the 50-step replay (obs-only divergence; trajectories stay in parity)
    "road_traffic": 1,
    "road_traffic_map3": 1,
}
# a forked trajectory legitimately diverges without bound; the cap only
# exists to catch NaN/explosion-class failures in the excluded envs
CHAOS_CAP = 1.0


def _assert_close(arr, ref, atol, n_chaotic, msg, forked=None, step=None,
                  cap=CHAOS_CAP):
    err = np.abs(np.asarray(arr, np.float64) - np.asarray(ref, np.float64))
    per_env = err.reshape(err.shape[0], -1).max(1)
    bad = np.flatnonzero(per_env > atol)
    loud = np.flatnonzero(per_env > cap)
    assert len(loud) == 0, f"{msg}: envs {loud} exceed hard cap ({per_env.max():.4f})"
    assert len(bad) <= n_chaotic, (
        f"{msg}: envs {bad} exceed atol={atol} (max {per_env.max():.4f}), "
        f"only {n_chaotic} envs may fork"
    )
    if forked is not None:
        for e in bad:
            forked.setdefault(int(e), step)


def _assert_forks_in_contact(env, d, forked, name):
    """Every allowed fork must coincide with a collidable pair in (or at the
    soft-penalty edge of) contact in the REFERENCE state one step before the
    fork surfaced (VERDICT r1 item 4)."""
    w = env.world
    from vmas_tpu.core.queries import get_distance

    collidable = [
        (a, b)
        for i, a in enumerate(w.entities)
        for b in w.entities[i + 1 :]
        if w.collides(a, b)
    ]
    for e, t in forked.items():
        # state before the forked step: recorded step t-1 (or the injected
        # initial state for t == 0)
        if t == 0:
            state = inject(env, d["init_pos"], d["init_vel"], d["init_rot"],
                           d["init_ang_vel"])
        else:
            state = inject(env, d["pos"][t - 1], d["vel"][t - 1],
                           d["rot"][t - 1], d["ang_vel"][t - 1])
        dists = np.stack(
            [np.asarray(get_distance(w, state, a, b)) for a, b in collidable]
        )  # [P, B]
        margin = 4 * float(w.contact_margin)
        assert dists[:, e].min() < margin, (
            f"{name}: env {e} forked at step {t} with no pair in contact "
            f"(closest surface distance {dists[:, e].min():.4f}) — this is "
            "a kernel bug, not a chaotic tie"
        )


@pytest.mark.parametrize("name", CASES)
def test_scenario_parity(name):
    d = np.load(os.path.join(DATA, f"scenario_{name}.npz"), allow_pickle=False)
    B = d["init_pos"].shape[0]
    T = min(d["actions"].shape[0], REPLAY_T.get(name, 10**9))
    atol = ATOL.get(name, 2e-3)
    n_chaotic = CHAOTIC_ENVS.get(name, 0)

    env = make_env(
        CASE_SCENARIO.get(name, name), num_envs=B, seed=0, **KWARGS.get(name, {})
    )

    ref_names = [str(n) for n in d["entity_names"]]
    my_names = [e.name for e in env.world.entities]
    assert my_names == ref_names, f"entity order mismatch:\n{my_names}\nvs\n{ref_names}"
    assert len(env.agents) == len(d["agent_names"])

    state = inject(env, d["init_pos"], d["init_vel"], d["init_rot"], d["init_ang_vel"])
    if name in REBUILD_SCRATCH:
        state = REBUILD_SCRATCH[name](env, state, d)
    env.state = refresh_scratch(env, state, name)

    forked = {}
    for t in range(T):
        if name in PER_STEP_INJECT:
            PER_STEP_INJECT[name](env, d, t)
        actions = [
            jnp.asarray(d["actions"][t, i, :, : env.get_agent_action_size(a)])
            for i, a in enumerate(env.agents)
        ]
        obs, rews, dones, infos = env.step(actions)

        _assert_close(env.state.pos, d["pos"][t], atol, n_chaotic,
                      f"{name} pos diverged at step {t}", forked=forked, step=t)
        _assert_close(env.state.vel, d["vel"][t], 10 * atol, n_chaotic,
                      f"{name} vel diverged at step {t}")
        _assert_close(env.state.rot, d["rot"][t], 10 * atol, n_chaotic,
                      f"{name} rot diverged at step {t}")
        for i in range(len(env.agents)):
            _assert_close(obs[i], d[f"obs_{i}"][t], 10 * atol, n_chaotic,
                          f"{name} obs[{i}] diverged at step {t}")
            # reference wheel returns reward [B,1] (quirk) — compare flat
            _assert_close(
                np.asarray(rews[i]).reshape(B, -1),
                d["rewards"][t, i].reshape(B, -1),
                10 * atol, n_chaotic,
                f"{name} reward[{i}] diverged at step {t}",
            )
        done_mismatch = np.flatnonzero(np.asarray(dones) != d["done"][t])
        assert len(done_mismatch) <= n_chaotic, (
            f"{name} done diverged at step {t} in envs {done_mismatch}"
        )

    if forked:
        _assert_forks_in_contact(env, d, forked, name)


@pytest.mark.parametrize("name", sorted(REPLAY_T))
def test_scenario_parity_resync(name):
    """Full-horizon one-step parity for the stiff-contact set (VERDICT r4
    missing #1): before every step the entity state is RE-SYNCED to the
    reference's recorded post-step state, so f32 reorder drift through the
    substepped constraint forces (reference core.py:2200-2291) cannot
    compound — every one of the 50 recorded steps is an independent
    one-step check of the physics + reward + observation pipeline.
    Scenario scratch (shaping baselines, clocks) evolves through our own
    steps; since each step runs on the reference's exact states, the
    scratch stays pinned to the reference's own derivation (up to one step
    of f32 noise — no amplification)."""
    d = np.load(os.path.join(DATA, f"scenario_{name}.npz"), allow_pickle=False)
    B = d["init_pos"].shape[0]
    T = d["actions"].shape[0]
    assert T >= 50, f"{name}: stiff-set recording should carry 50 steps"
    atol = ATOL.get(name, 2e-3)
    # knife-edge discrete terms can flip on sub-atol ONE-step drift even
    # re-synced (buzz_wire's ±10 wire-touch reward, passage's near-contact
    # shaping sum): allow one env per step — never accumulated, since the
    # next step re-syncs. The reward cap is raised accordingly (a flipped
    # ±10 term is the allowed event, not an explosion).
    n_chaotic = max(CHAOTIC_ENVS.get(name, 0), 1)

    env = make_env(
        CASE_SCENARIO.get(name, name), num_envs=B, seed=0,
        **KWARGS.get(name, {})
    )
    state = inject(env, d["init_pos"], d["init_vel"], d["init_rot"],
                   d["init_ang_vel"])
    if name in REBUILD_SCRATCH:
        state = REBUILD_SCRATCH[name](env, state, d)
    env.state = refresh_scratch(env, state, name)

    for t in range(T):
        if t > 0:
            # re-sync: overwrite the entity state with the reference's
            # recorded post-step-(t-1) state, keep our scenario scratch
            env.state = inject(env, d["pos"][t - 1], d["vel"][t - 1],
                               d["rot"][t - 1], d["ang_vel"][t - 1])
        actions = [
            jnp.asarray(d["actions"][t, i, :, : env.get_agent_action_size(a)])
            for i, a in enumerate(env.agents)
        ]
        obs, rews, dones, infos = env.step(actions)

        # a tie-flip on the injected state can still fork ONE step of
        # dynamics in a chaotic env — allowed per step, never accumulated
        _assert_close(env.state.pos, d["pos"][t], atol, n_chaotic,
                      f"{name} pos (resync) at step {t}")
        _assert_close(env.state.vel, d["vel"][t], 10 * atol, n_chaotic,
                      f"{name} vel (resync) at step {t}")
        _assert_close(env.state.rot, d["rot"][t], 10 * atol, n_chaotic,
                      f"{name} rot (resync) at step {t}")
        for i in range(len(env.agents)):
            _assert_close(obs[i], d[f"obs_{i}"][t], 10 * atol, n_chaotic,
                          f"{name} obs[{i}] (resync) at step {t}")
            _assert_close(
                np.asarray(rews[i]).reshape(B, -1),
                d["rewards"][t, i].reshape(B, -1),
                10 * atol, n_chaotic,
                f"{name} reward[{i}] (resync) at step {t}",
                cap=25.0,
            )
        done_mismatch = np.flatnonzero(np.asarray(dones) != d["done"][t])
        assert len(done_mismatch) <= n_chaotic, (
            f"{name} done (resync) diverged at step {t} in envs "
            f"{done_mismatch}"
        )
