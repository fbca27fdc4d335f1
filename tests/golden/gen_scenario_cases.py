"""Record golden scenario trajectories from the PyTorch reference.

For each scenario we build the reference world, reset it (torch RNG), then
step T times with recorded uniform random actions, recording raw actions,
rewards, observations, dones, and the full entity state trajectory. The JAX
test (tests/test_scenario_parity.py) injects the recorded initial state and
replays the same raw actions through vmas_tpu's full env step (action decode
-> scenario process_action -> physics -> rewards/obs/done), asserting parity.

This extends the world-level golden harness (gen_world_cases.py) to the
scenario layer: per-scenario reward shaping, scripted agents, controllers and
observation composition (reference environment.py:325-404 step protocol,
_get_from_scenario rewards-then-observations ordering at environment.py:221).

Run manually:  python tests/golden/gen_scenario_cases.py
"""

import importlib.util
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(__file__))
from gen_reference_oracle import bootstrap_reference  # noqa: E402

REF = "/root/reference"
OUT = os.path.join(os.path.dirname(__file__), "data")

B = 16
T = 50
SEED = 11

# per-case horizon overrides: contact-saturated scenes fork on closest-point
# argmin ties (CHAOTIC_ENVS in tests/test_scenario_parity.py) — longer
# replays would just accumulate forks, so they keep the short horizon
T_OF = {
    # covered targets respawn with RUNTIME RNG (reference discovery.py
    # samples fresh positions inside the reward step) — torch and jax
    # streams can't match (not even one step out), so the replay forks at
    # the first cover (~step 12 at B=16); keep the horizon below it
    "discovery": 10,
    # The stiff-contact set (asym_joint, ball_trajectory, buzz_wire,
    # joint_passage, passage, kinematic_bicycle, pollock) RECORDS the full
    # 50 steps since round 5: the free-running replay still stops at 10
    # (f32 reorder drift through the substepped constraint forces
    # compounds exponentially — test_scenario_parity.py REPLAY_T), but the
    # RE-SYNC test (test_scenario_parity_resync) injects the recorded
    # state every step and compares ONE step out, so all 50 steps verify
    # without chaos amplification.
}

# scenario -> kwargs (must match the JAX test exactly)
SCENARIOS = {
    "transport": dict(n_agents=4),
    "balance": {},
    "wheel": {},
    "dispersion": {},
    "passage": {},
    "reverse_transport": {},
    "give_way": {},
    "navigation": {},
    "flocking": {},
    "dropout": {},
    "discovery": {},
    "multi_give_way": {},
    "wind_flocking": {},
    "joint_passage": {},
    "joint_passage_size": {},
    "ball_passage": {},
    "ball_trajectory": {},
    "buzz_wire": {},
    "dispersion": {},
    "sampling": {},
    # scripted red team draws runtime RNG (check_better_positions randn
    # candidates, football.py:2151) — unreplayable; record both teams as
    # policy agents instead (AI covered by behavioral tests)
    "football": dict(ai_red_agents=False),
    # scripted AI ON: the per-step check_better_positions objectives are
    # captured (STEP_CAPTURE below) and injected as scratch on replay, so
    # the rest of the AI (possession, dribble, go_to, hermite control, ball
    # script) is trajectory-compared against the reference
    "football_ai": {},
    "painting": {},
    # reference mix_knowledge does torch.logical_or(*in_prox) — only valid
    # for exactly 2 other agents, i.e. n_agents=3 (painting.py:607)
    "painting_full": dict(task_type="full", n_agents=3, n_goals=3),
    "construction": {},
    # obs noise defaults ON in road_traffic (road_traffic.py:2635)
    "road_traffic": dict(is_add_noise=False),
    # map 2: the whole CPM map + challenging initial-state buffer (the ISB
    # record RNG gate only touches scratch, not trajectories)
    "road_traffic_map2": dict(is_add_noise=False, map_type="2"),
    # map 3: per-env random sub-maps + in-step entry/exit agent resets
    "road_traffic_map3": dict(is_add_noise=False, map_type="3", n_agents=4,
                          scenario_probabilities=[0.4, 0.3, 0.3]),
}

# case name -> scenario file when they differ (multiple configs per scenario)
ALIASES = {
    "painting_full": "painting",
    "road_traffic_map2": "road_traffic",
    "road_traffic_map3": "road_traffic",
    "football_ai": "football",
}


def _capture_football_ai(scen):
    """Wrap the scripted red AI's check_better_positions to record each
    step's chosen repositioning objective per agent (football.py:2147-2177).
    dribble_policy calls it with env_index = the non-possession mask
    (football.py:1809), so outputs are scattered into a full-B buffer
    (possession envs never consume the value — they dribble instead).

    The fork's get_wall_separations assumes pos [N, 2] and CRASHES on the
    [N, n_candidates, 2] batches check_better_positions feeds it
    (football.py:2233-2244 boolean-mask indexing) — i.e. the fork's scripted
    AI is unrunnable as shipped. Recording patches it shape-generically
    (flatten trailing candidate dims, call the original, reshape back),
    which is the obvious intended semantics; the replay side never compares
    check_better_positions internals anyway (objectives are injected)."""
    import torch

    ctrl = scen.red_controller
    B = scen.world.batch_dim
    orig = ctrl.check_better_positions
    orig_wall = ctrl.get_wall_separations
    slots = {a: i for i, a in enumerate(scen.red_agents)}
    step_buf = {}

    def wall_fixed(pos):
        if pos.dim() == 2:
            return orig_wall(pos)
        flat = pos.reshape(-1, pos.shape[-1])
        return orig_wall(flat).reshape(*pos.shape[:-1], 2, 2)

    ctrl.get_wall_separations = wall_fixed

    def wrapped(agent, env_index=Ellipsis):
        out = orig(agent, env_index=env_index)
        buf = np.zeros((B, 2), np.float32)
        if isinstance(env_index, torch.Tensor):
            buf[env_index.numpy()] = out.detach().numpy()
        else:
            buf[:] = out.detach().numpy()
        step_buf[slots[agent]] = buf
        return out

    ctrl.check_better_positions = wrapped

    def collect():
        rows = np.stack([step_buf[i] for i in sorted(step_buf)])  # [A, B, 2]
        step_buf.clear()
        return {"extra_step_ai_best_pos": rows}

    return collect


# case -> fn(scenario) -> collect(); collect() is called after every step and
# must return a dict of per-step arrays (stacked over T into the npz)
STEP_CAPTURE = {
    "football_ai": _capture_football_ai,
}

MPE = {
    "mpe/simple": {},
    "mpe/simple_adversary": {},
    "mpe/simple_crypto": {},
    "mpe/simple_push": {},
    "mpe/simple_reference": {},
    "mpe/simple_speaker_listener": {},
    "mpe/simple_spread": {},
    "mpe/simple_tag": {},
    "mpe/simple_world_comm": {},
}
SCENARIOS.update(MPE)

DEBUG = {
    f"debug/{n}": {}
    for n in (
        "asym_joint", "circle_trajectory", "diff_drive", "drone", "goal",
        "het_mass", "kinematic_bicycle", "line_trajectory", "pollock",
        "vel_control", "waterfall",
    )
}
# reference perturbs masses with host RNG at reset (het_mass.py:47-53);
# record with zero noise so masses are exact on both sides
DEBUG["debug/het_mass"] = dict(mass_noise=0)
# default obs_noise=0.2 is uniform observation noise (asym_joint.py:58)
DEBUG["debug/asym_joint"] = dict(obs_noise=0)
# default pollock (45 entities) is contact-saturated: argmin ties fork ~40%
# of envs within 10 steps; a sparser scene keeps the replay meaningful while
# still exercising every shape pair + lidar (5/5/5 instead of the earlier
# 6/6/6 — at 6/6/6 a third of envs stayed in continuous multi-contact and
# up to 5 of 16 envs forked on argmin ties; VERDICT r1 item 4)
DEBUG["debug/pollock"] = dict(n_agents=5, n_lines=5, n_boxes=5, lidar=True)
SCENARIOS.update(DEBUG)


def _dots_knowledge(scen):
    """DOTS state extensions: per-agent knowledge [B,2,K] and per-goal
    expected knowledge [B,K] (dots_core.py:95-160) are random reset scratch."""
    out = {}
    ak = [
        a.state.knowledge.numpy()
        for a in scen.world.agents
        if getattr(a.state, "knowledge", None) is not None
    ]
    if ak:
        out["extra_agent_knowledge"] = np.stack(ak, 1)  # [B, A, 2, K]
    gk = [
        l.state.expected_knowledge.numpy()
        for l in scen.world.landmarks
        if getattr(l.state, "expected_knowledge", None) is not None
    ]
    if gk:
        out["extra_goal_knowledge"] = np.stack(gk, 1)  # [B, G, K]
    return out


def _goal_index(scen):
    w = scen.world
    return {"extra_goal_idx": np.array(w.landmarks.index(w.agents[0].goal))}


# scenario -> fn(scenario) -> dict of extra arrays to record (random scratch
# that is not part of the entity state, e.g. sampled field parameters)
EXTRA_RECORD = {
    "sampling": lambda scen: {
        "extra_locs": np.stack([l.numpy() for l in scen.locs], 1)  # [B, G, 2]
    },
    "mpe/simple_adversary": _goal_index,
    "mpe/simple_push": _goal_index,
    "mpe/simple_speaker_listener": lambda scen: {
        "extra_goal_idx": np.array(
            scen.world.landmarks.index(scen.world.agents[0].goal_b)
        )
    },
    "mpe/simple_reference": lambda scen: {
        "extra_goal_b_0": np.array(
            scen.world.landmarks.index(scen.world.agents[0].goal_b)
        ),
        "extra_goal_b_1": np.array(
            scen.world.landmarks.index(scen.world.agents[1].goal_b)
        ),
    },
    # crypto agents: [eve_0, bob_0, alice_0(speaker)]; key lives on the
    # speaker, secret on everyone (simple_crypto.py:66-69)
    "mpe/simple_crypto": lambda scen: {
        "extra_key": scen.world.agents[2].key.numpy(),
        "extra_secret": scen.world.agents[0].secret.numpy(),
    },
    "road_traffic": lambda scen: {
        "extra_path_id": scen.ref_paths_agent_related.path_id.numpy(),
        "extra_point_id": scen.ref_paths_agent_related.point_id.numpy(),
    },
    # maps 2/3 additionally need the per-(env,agent) sub-map assignment
    "road_traffic_map2": lambda scen: {
        "extra_path_id": scen.ref_paths_agent_related.path_id.numpy(),
        "extra_point_id": scen.ref_paths_agent_related.point_id.numpy(),
        "extra_scenario_id": scen.ref_paths_agent_related.scenario_id.numpy(),
    },
    "road_traffic_map3": lambda scen: {
        "extra_path_id": scen.ref_paths_agent_related.path_id.numpy(),
        "extra_point_id": scen.ref_paths_agent_related.point_id.numpy(),
        "extra_scenario_id": scen.ref_paths_agent_related.scenario_id.numpy(),
    },
    "painting": _dots_knowledge,
    "painting_full": _dots_knowledge,
    "construction": _dots_knowledge,
}


def load_reference_scenario(name):
    bootstrap_reference()
    import vmas

    if not hasattr(vmas, "render_interactively"):
        vmas.render_interactively = lambda *a, **k: None
    path = os.path.join(REF, "vmas", "scenarios", f"{name}.py")
    spec = importlib.util.spec_from_file_location(f"ref_scenario_{name}", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def record(name, kwargs):
    import torch

    mod = load_reference_scenario(ALIASES.get(name, name))
    scen = mod.Scenario()
    torch.manual_seed(SEED)
    world = scen.env_make_world(B, "cpu", **dict(kwargs))
    scen.env_reset_world_at(None)

    entities = world.entities
    pol_agents = world.policy_agents

    def snap():
        return dict(
            pos=torch.stack([e.state.pos for e in entities], 1),
            vel=torch.stack([e.state.vel for e in entities], 1),
            rot=torch.stack([e.state.rot[:, 0] for e in entities], 1),
            ang_vel=torch.stack([e.state.ang_vel[:, 0] for e in entities], 1),
        )

    g = torch.Generator().manual_seed(SEED + 1)
    data = {f"init_{k}": v.numpy() for k, v in snap().items()}
    data["entity_names"] = np.array([e.name for e in entities])
    data["agent_names"] = np.array([a.name for a in pol_agents])
    if name in EXTRA_RECORD:
        data.update(EXTRA_RECORD[name](scen))

    collect = STEP_CAPTURE[name](scen) if name in STEP_CAPTURE else None
    step_extras = []

    acts, rews_t, done_t = [], [], []
    obs_t = [[] for _ in pol_agents]
    traj = {k: [] for k in ("pos", "vel", "rot", "ang_vel")}
    for t in range(T_OF.get(name, T)):
        step_acts = []
        for a in pol_agents:
            assert a.action.u_noise == 0 or a.action.u_noise is None or (
                np.asarray(a.action.u_noise) == 0
            ).all(), f"{name}/{a.name} has action noise; parity recording unsupported"
            rng = a.action.u_range_tensor
            raw = (torch.rand(B, a.action_size, generator=g) * 2 - 1) * rng[None]
            # reference _set_action continuous path (environment.py:615-707)
            a.action.u = (raw * a.action.u_multiplier_tensor).to(torch.float32)
            if world.dim_c > 0 and not a.silent:
                assert not a.c_noise, f"{name}/{a.name} has comm noise"
                c_raw = torch.rand(B, world.dim_c, generator=g)
                a.action.c = c_raw
                raw = torch.cat([raw, c_raw], dim=1)
            step_acts.append(raw)
        for a in world.agents:
            scen.env_process_action(a)
        world.step()
        # rewards first, then observations (reference environment.py:221-258)
        rews = [scen.reward(a).clone() for a in pol_agents]
        obs = [scen.observation(a).clone() for a in pol_agents]
        done = scen.done().clone()

        maxd = max(a.shape[1] for a in step_acts)
        acts.append(
            np.stack(
                [
                    np.pad(a.numpy(), ((0, 0), (0, maxd - a.shape[1])))
                    for a in step_acts
                ]
            )
        )
        rews_t.append(torch.stack(rews).numpy())
        done_t.append(done.numpy())
        for i, o in enumerate(obs):
            obs_t[i].append(o.numpy())
        for k, v in snap().items():
            traj[k].append(v.numpy())
        if collect is not None:
            step_extras.append(collect())

    if step_extras:
        for k in step_extras[0]:
            data[k] = np.stack([se[k] for se in step_extras])  # [T, ...]
    data["actions"] = np.stack(acts)  # [T, A, B, act_max]
    data["rewards"] = np.stack(rews_t)  # [T, A, B]
    data["done"] = np.stack(done_t)  # [T, B]
    for i in range(len(pol_agents)):
        data[f"obs_{i}"] = np.stack(obs_t[i])  # [T, B, obs_dim]
    for k, v in traj.items():
        data[k] = np.stack(v)  # [T, B, E, ...]

    os.makedirs(OUT, exist_ok=True)
    base = os.path.basename(name)  # mpe/simple -> simple
    np.savez_compressed(os.path.join(OUT, f"scenario_{base}.npz"), **data)
    print(
        f"wrote scenario_{name}.npz: E={len(entities)} A={len(pol_agents)} "
        f"obs={[data[f'obs_{i}'].shape[-1] for i in range(len(pol_agents))]}"
    )


if __name__ == "__main__":
    only = sys.argv[1:] or list(SCENARIOS)
    for name in only:
        record(name, SCENARIOS[name])
