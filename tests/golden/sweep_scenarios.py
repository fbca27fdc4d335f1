"""Per-scenario throughput sweep on the real chip.

Runs every registered scenario (main + debug + MPE) through the compiled
rollout at a fixed env count and prints steady-state µs/step and
env-steps/s. Observations stay in the scan outputs (the honest protocol —
see CLAUDE.md bench note).

Usage: python tests/golden/sweep_scenarios.py [num_envs] [names...]
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

import jax

from vmas_tpu import make_env
from vmas_tpu.parallel.rollout import rollout_fn
from vmas_tpu.scenarios import _DEBUG, _MAIN, _MPE

B = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
ONLY = sys.argv[2:]
HORIZON = 50

# fixed-shape kwargs that make heavyweight scenarios representative
KWARGS = {
    "football": dict(ai_red_agents=True),
    "road_traffic": dict(),
}


def sweep(name):
    t0 = time.time()
    env = make_env(name, num_envs=B, seed=0, **KWARGS.get(name, {}))
    run = jax.jit(rollout_fn(env, horizon=HORIZON))
    key = jax.random.PRNGKey(0)
    state, steps, traj = run(env.state, env.steps, key)
    jax.block_until_ready(traj["rewards"])
    compile_s = time.time() - t0
    # ramp the clock, then take best of 3 windows
    t0 = time.time()
    while time.time() - t0 < 6.0:
        state, steps, traj = run(state, steps, jax.random.fold_in(key, 1))
        jax.block_until_ready(traj["rewards"])
    best = float("inf")
    for w in range(3):
        t0 = time.time()
        for i in range(3):
            state, steps, traj = run(state, steps, jax.random.fold_in(key, 10 * w + i))
        jax.block_until_ready(traj["rewards"])
        best = min(best, (time.time() - t0) / (3 * HORIZON))
    print(
        f"{name:28s} {best * 1e6:9.0f} us/step  {B / best / 1e6:8.2f}M steps/s"
        f"  (compile {compile_s:.0f}s)",
        flush=True,
    )


names = ONLY or (_MAIN + _DEBUG + _MPE)
for name in names:
    try:
        sweep(name)
    except Exception as e:  # keep sweeping; report the straggler
        print(f"{name:28s} FAILED: {type(e).__name__}: {e}", flush=True)
