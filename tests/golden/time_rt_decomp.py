"""Same-process decomposition of road_traffic's step time on TPU.

Times each phase of the step in its own 50-iteration lax.scan (amortizing
dispatch), all in ONE process — cross-process comparisons through the axon
tunnel are clock noise (docs/PERFORMANCE.md).  Phases:

  full        the real rollout step (the number bench_road_traffic reports)
  pre_rewards _update_distances (pallas sweep kernel + agent interX + reward math)
  sweep       the pallas sweep kernel alone (same inputs every iteration)
  post        post_rewards (short-term refresh + action buffers)
  obs         observations() = the all-ego pallas obs kernel
  physics     decode + dynamics + world.step, via the env step with scenario
              hooks left in place but measured as full - (pre+post+obs)

Usage: python tests/golden/time_rt_decomp.py [B]
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

import jax
import jax.numpy as jnp

from vmas_tpu import make_env
from vmas_tpu.parallel.rollout import rollout_fn

B = int(sys.argv[1]) if len(sys.argv) > 1 else 512
N = 50


def timeit(name, fn, *args):
    out = fn(*args)
    jax.block_until_ready(out)
    # ramp + 3 windows, best-of
    t0 = time.time()
    while time.time() - t0 < 4.0:
        out = fn(*args)
        jax.block_until_ready(out)
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        out = fn(*args)
        jax.block_until_ready(out)
        best = min(best, (time.perf_counter() - t0) / N)
    print(f"  {name:12s} {best*1e6:8.1f} us/step", flush=True)
    return best


def scan_of(f):
    def run(state):
        def body(c, _):
            return f(c), None
        return jax.lax.scan(body, state, None, length=N)[0]
    return jax.jit(run)


def main():
    env = make_env("road_traffic", num_envs=B, seed=0, is_add_noise=False)
    sc = env.scenario
    state = env.state

    print(f"road_traffic decomposition  B={B}  (N={N}-step scans, best-of-3)", flush=True)

    # full honest step via the library rollout
    run_full = jax.jit(rollout_fn(env, horizon=N))
    key = jax.random.PRNGKey(0)
    st, steps, traj = run_full(env.state, env.steps, key)
    jax.block_until_ready(traj["rewards"])

    # full: time directly (rollout_fn already scans N steps)
    out = run_full(st, steps, key)
    jax.block_until_ready(out[2]["rewards"])
    t0 = time.time()
    while time.time() - t0 < 6.0:
        out = run_full(st, steps, key)
        jax.block_until_ready(out[2]["rewards"])
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        out = run_full(st, steps, key)
        jax.block_until_ready(out[2]["rewards"])
        best = min(best, (time.perf_counter() - t0) / N)
    print(f"  {'full':12s} {best*1e6:8.1f} us/step", flush=True)

    # phases, each iterated in a scan over state
    pre = scan_of(lambda s: sc.pre_rewards(s))
    timeit("pre_rewards", pre, state)

    post_state = sc.pre_rewards(state)  # post needs reward-phase scratch
    post = scan_of(lambda s: sc.post_rewards(s))
    timeit("post", post, post_state)

    def obs_step(s):
        obs = sc.observations(s)
        bump = sum(jnp.sum(o) for o in obs) * 0.0
        return s.replace(pos=s.pos + bump)
    obs = scan_of(obs_step)
    timeit("obs", obs, post_state)

    # the sweep kernel alone (fixed inputs re-fed each iteration)
    from vmas_tpu.scenarios import road_traffic_kernel as rtk

    pid = post_state.scenario["path_id"]
    a_idx = jnp.asarray([a.index for a in sc.world.agents])
    pos = post_state.pos[:, a_idx]
    rot = post_state.rot[:, a_idx]

    def sweep_step(s):
        p = s.pos[:, a_idx]
        r = s.rot[:, a_idx]
        out = rtk.sweep_all(
            sc._sweep_tables, pid, p, r,
            Mc=int(sc.P.center.shape[1]), Mb=int(sc.P.left_b.shape[1]),
            lh=(sc.l_f + sc.l_r) / 2, wh=sc.agent_width / 2,
            S=int(sc.n_points_short_term),
            interval=int(sc.sample_interval), shift=1,
        )
        bump = (jnp.sum(out["d_ref"]) + jnp.sum(out["short_term"])) * 0.0
        return s.replace(pos=s.pos + bump)
    sweep = scan_of(sweep_step)
    timeit("sweep_kernel", sweep, post_state)

    # obs kernel alone
    def obsk_step(s):
        sd = s.scenario
        p = s.pos[:, a_idx]
        r = s.rot[:, a_idx]
        v = s.vel[:, a_idx]
        o = rtk.obs_all(
            p, r, v, sd["short_term"], sd["verts"][:, :, 0:4],
            sd["d_ref"], sd["d_left"].min(-1), sd["d_right"].min(-1),
            K=sc.n_nearing_agents, apply_mask=sc.is_apply_mask,
            norm_pos=sc.threshold_mask_agents, norm_v=float(sc.norm_v),
            norm_dist=float(sc.norm_distance_lanelet),
            thresh=sc.threshold_mask_agents,
        )
        return s.replace(pos=s.pos + jnp.sum(o) * 0.0)
    obsk = scan_of(obsk_step)
    timeit("obs_kernel", obsk, post_state)


if __name__ == "__main__":
    main()
