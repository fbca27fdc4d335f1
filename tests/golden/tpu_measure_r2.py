"""Round-2 TPU measurement battery (run on the real chip, NOT cpu).

Runs, in order, each under its own wall-clock guard so one bad compile
can't eat the session: (1) a tiny probe matmul, (2) road_traffic step
XLA-sweeps vs pallas-sweeps vs pallas-sweeps+pallas-obs at 512 envs,
(3) fused-outputs scenario steps vs plain-fused vs XLA for the newly
covered scenarios, (4) bench.py's transport config sanity number.

Usage: python tests/golden/tpu_measure_r2.py [section ...]
Sections: probe rt fused vmem lanemin bench   (default: probe rt fused bench)

NEVER kill this mid-compile (wedges the axon tunnel claim; see
docs/PERFORMANCE.md); the guards below time out by skipping sections,
not by killing the process.
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

import jax
import jax.numpy as jnp

SECTIONS = sys.argv[1:] or ["probe", "rt", "fused", "bench"]


def log(msg):
    print(f"[{time.strftime('%H:%M:%S')}] {msg}", flush=True)


def ramp(fn, state, seconds=8.0):
    state = fn(state)
    jax.block_until_ready(jax.tree_util.tree_leaves(state)[0])
    t0 = time.time()
    while time.time() - t0 < seconds:
        state = fn(state)
        jax.block_until_ready(jax.tree_util.tree_leaves(state)[0])
    return state


def best_of(fn, state, n=20, reps=3):
    best = float("inf")
    for _ in range(reps):
        s = state
        t0 = time.perf_counter()
        for _ in range(n):
            s = fn(s)
        jax.block_until_ready(jax.tree_util.tree_leaves(s)[0])
        best = min(best, (time.perf_counter() - t0) / n)
    return best


def probe():
    t0 = time.time()
    x = jnp.ones((8, 128)) @ jnp.ones((128, 8))
    jax.block_until_ready(x)
    log(f"probe ok in {time.time() - t0:.1f}s on {jax.devices()}")


def rt():
    from vmas_tpu import make_env
    from vmas_tpu.parallel.rollout import rollout_fn

    for B, label, kw in [
        (512, "xla", dict(pallas_sweeps=False)),
        (512, "sweeps", dict()),
        (512, "sweeps+obs", dict(pallas_obs=True)),
        (4096, "sweeps", dict()),
        (4096, "sweeps+obs", dict(pallas_obs=True)),
    ]:
        t0 = time.time()
        env = make_env("road_traffic", num_envs=B, seed=0,
                       is_add_noise=False, **kw)
        run = jax.jit(rollout_fn(env, horizon=20))
        key = jax.random.PRNGKey(0)
        carry = (env.state, env.steps)
        step = lambda c: run(c[0], c[1], key)[:2]
        carry = step(carry)
        jax.block_until_ready(carry[0].pos)
        log(f"rt/{label}@{B}: compiled in {time.time() - t0:.0f}s")
        carry = ramp(step, carry)
        best = best_of(step, carry, n=3) / 20
        log(f"rt/{label}@{B}: {best * 1e6:8.1f} us/step ({B / best / 1e6:.2f}M steps/s)")


def fused():
    from vmas_tpu import make_env
    from vmas_tpu.parallel.rollout import rollout_fn

    B = 1024
    for name, kw in [
        ("balance", {}), ("dropout", {}), ("flocking", {}),
        ("dispersion", {}), ("navigation", {}), ("give_way", {}),
        ("passage", {}), ("joint_passage", {}),
        ("football", {}), ("transport", dict(n_agents=4)),
    ]:
        row = []
        for label, fkw in [("xla", {}), ("fused", dict(fused_physics=True))]:
            t0 = time.time()
            env = make_env(name, num_envs=B, seed=0, **kw, **fkw)
            run = jax.jit(rollout_fn(env, horizon=50))
            key = jax.random.PRNGKey(0)
            carry = (env.state, env.steps)
            step = lambda c: run(c[0], c[1], key)[:2]
            carry = step(carry)
            jax.block_until_ready(carry[0].pos)
            carry = ramp(step, carry, seconds=5.0)
            best = best_of(step, carry, n=2) / 50
            row.append(f"{label} {best * 1e6:7.1f}us")
        log(f"fused/{name}: " + "  ".join(row))


def _transport_sweep(env_var, values):
    """Run the bench-config transport rollout in a subprocess per value of
    ``env_var`` (fresh process = fresh jit cache + fresh kernel build)."""
    import subprocess

    snippet = (
        "import time, jax;"
        "from vmas_tpu import make_env;"
        "from vmas_tpu.parallel.rollout import rollout_fn;"
        "env = make_env('transport', num_envs=4096, n_agents=4, seed=0,"
        " fused_physics=True);"
        "run = jax.jit(rollout_fn(env, horizon=100));"
        "key = jax.random.PRNGKey(0);"
        "s, st, tr = run(env.state, env.steps, key);"
        "jax.block_until_ready(tr['rewards']);"
        "t0 = time.time()\n"
        "while time.time() - t0 < 8:"
        " s, st, tr = run(s, st, key);"
        " jax.block_until_ready(tr['rewards'])\n"
        "best = 1e9\n"
        "for r in range(3):"
        " t0 = time.perf_counter();"
        " s, st, tr = run(s, st, key);"
        " s, st, tr = run(s, st, key);"
        " jax.block_until_ready(tr['rewards']);"
        " best = min(best, (time.perf_counter() - t0) / 200)\n"
        "print(f'{best*1e6:.1f} us/step')"
    )
    for v in values:
        env = dict(os.environ, **{env_var: v})
        # No hard kill on a TPU child: SIGKILLing it mid-compile/claim wedges
        # the axon tunnel (docs/PERFORMANCE.md). The snippet self-limits via
        # its own wall clocks; the outer timeout is a last-resort backstop,
        # generous enough that only a truly hung claim hits it — and when it
        # does, skip to the next value instead of aborting the sweep.
        try:
            out = subprocess.run(
                [sys.executable, "-c", snippet], capture_output=True, text=True,
                timeout=3600, env=env,
                cwd=os.path.join(os.path.dirname(__file__), "..", ".."),
            )
            log(f"{env_var}={v}: {out.stdout.strip() or out.stderr[-200:]}")
        except subprocess.TimeoutExpired:
            log(f"{env_var}={v}: TIMED OUT after 3600s — skipping "
                "(expect a wedged tunnel claim; let it drain before retrying)")


def vmem():
    """Sweep the fused kernel's VMEM block budget (fused._blk_for) on the
    bench config — docs/PERFORMANCE.md lists raising it as an unmeasured
    lever."""
    _transport_sweep("VMAS_TPU_FUSED_VMEM_MB", ["2", "4", "8"])


def lanemin():
    """Sweep the pair-tile threshold: transport's pair counts (ss=6, bs=4)
    sit just under the default of 8, so lowering it lane-batches the bench
    config's own pair loop (bitwise-identical results by construction)."""
    _transport_sweep("VMAS_TPU_FUSED_LANE_MIN", ["2", "4", "8"])


def enttile():
    """A/B the round-3 entity-tiled per-entity stream (clamp/friction/
    gravity/integrate on [E, BLK] tiles) against the per-row unroll."""
    _transport_sweep("VMAS_TPU_FUSED_ENTITY_TILE", ["0", "1"])


def _scenario_sweep(name, B, env_var, values, horizon=50, mkkw=""):
    """Like _transport_sweep but for an arbitrary scenario/config."""
    import subprocess

    snippet = (
        "import time, jax;"
        "from vmas_tpu import make_env;"
        "from vmas_tpu.parallel.rollout import rollout_fn;"
        f"env = make_env('{name}', num_envs={B}, seed=0, fused_physics=True{mkkw});"
        f"run = jax.jit(rollout_fn(env, horizon={horizon}));"
        "key = jax.random.PRNGKey(0);"
        "s, st, tr = run(env.state, env.steps, key);"
        "jax.block_until_ready(tr['rewards']);"
        "t0 = time.time()\n"
        "while time.time() - t0 < 8:"
        " s, st, tr = run(s, st, key);"
        " jax.block_until_ready(tr['rewards'])\n"
        "best = 1e9\n"
        "for r in range(3):"
        " t0 = time.perf_counter();"
        " s, st, tr = run(s, st, key);"
        " jax.block_until_ready(tr['rewards']);"
        f" best = min(best, (time.perf_counter() - t0) / {horizon})\n"
        "print(f'{best*1e6:.1f} us/step')"
    )
    for v in values:
        env = dict(os.environ, **{env_var: v})
        try:
            out = subprocess.run(
                [sys.executable, "-c", snippet], capture_output=True, text=True,
                timeout=3600, env=env,
                cwd=os.path.join(os.path.dirname(__file__), "..", ".."),
            )
            log(f"{name}@{B} {env_var}={v}: {out.stdout.strip() or out.stderr[-300:]}")
        except subprocess.TimeoutExpired:
            log(f"{name}@{B} {env_var}={v}: TIMED OUT after 3600s — skipping")


def enttile_scen():
    """Entity-tile A/B on the pair-heavy / substeps-heavy worlds."""
    for name, B in [("football", 4096), ("joint_passage", 1024),
                    ("balance", 1024), ("wind_flocking", 1024)]:
        _scenario_sweep(name, B, "VMAS_TPU_FUSED_ENTITY_TILE", ["0", "1"])


def bench():
    import subprocess

    try:
        out = subprocess.run(
            [sys.executable, "bench.py"], capture_output=True, text=True,
            timeout=3600, cwd=os.path.join(os.path.dirname(__file__), "..", ".."),
        )
    except subprocess.TimeoutExpired:
        log("bench.py: TIMED OUT after 3600s — skipping")
        return
    last = out.stdout.strip().splitlines()[-1] if out.stdout.strip() else str(out.stderr)[-200:]
    log("bench.py: " + last)


if __name__ == "__main__":
    for s in SECTIONS:
        log(f"=== {s} ===")
        {"probe": probe, "rt": rt, "fused": fused, "vmem": vmem,
         "lanemin": lanemin, "enttile": enttile,
         "enttile_scen": enttile_scen, "bench": bench}[s]()
