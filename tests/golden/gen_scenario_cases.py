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
T = 10
SEED = 11

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

    mod = load_reference_scenario(name)
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

    acts, rews_t, done_t = [], [], []
    obs_t = [[] for _ in pol_agents]
    traj = {k: [] for k in ("pos", "vel", "rot", "ang_vel")}
    for t in range(T):
        step_acts = []
        for a in pol_agents:
            assert a.action.u_noise == 0 or a.action.u_noise is None or (
                np.asarray(a.action.u_noise) == 0
            ).all(), f"{name}/{a.name} has action noise; parity recording unsupported"
            rng = a.action.u_range_tensor
            raw = (torch.rand(B, a.action_size, generator=g) * 2 - 1) * rng[None]
            step_acts.append(raw)
            # reference _set_action continuous path (environment.py:615-707)
            a.action.u = (raw * a.action.u_multiplier_tensor).to(torch.float32)
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

    data["actions"] = np.stack(acts)  # [T, A, B, act_max]
    data["rewards"] = np.stack(rews_t)  # [T, A, B]
    data["done"] = np.stack(done_t)  # [T, B]
    for i in range(len(pol_agents)):
        data[f"obs_{i}"] = np.stack(obs_t[i])  # [T, B, obs_dim]
    for k, v in traj.items():
        data[k] = np.stack(v)  # [T, B, E, ...]

    os.makedirs(OUT, exist_ok=True)
    np.savez_compressed(os.path.join(OUT, f"scenario_{name}.npz"), **data)
    print(
        f"wrote scenario_{name}.npz: E={len(entities)} A={len(pol_agents)} "
        f"obs={[data[f'obs_{i}'].shape[-1] for i in range(len(pol_agents))]}"
    )


if __name__ == "__main__":
    only = sys.argv[1:] or list(SCENARIOS)
    for name in only:
        record(name, SCENARIOS[name])
