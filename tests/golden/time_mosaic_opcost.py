"""Calibrate Mosaic's per-op cost vs kernel dispatch overhead on TPU.

One process, one program per point but measured via a SWEEP INSIDE the
process (programs built once, each timed in its own loop — no interleaving,
so no program-switch inflation; relative slopes within the session are the
signal). Kernels: read R rows, apply N chained elementwise ops, write R
rows. Sweeping N at fixed shape gives ns/op (slope) and dispatch+copy
overhead (intercept); sweeping the row shape at fixed N separates
vreg-count effects from per-op issue cost.

Motivation: transport's fused kernel retires ~100 µs for ~600-1000 vector
ops — ~100-150 ns/op if the per-op model holds (docs/PERFORMANCE.md
round-4). If the intercept (dispatch) is instead a large fraction, a
multi-step rollout-chunk kernel amortizes it and is the next lever; if the
slope dominates, only op-count reductions pay.

Usage: python tests/golden/time_mosaic_opcost.py [B]
"""
import functools
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

B = int(sys.argv[1]) if len(sys.argv) > 1 else 4096
R = 54  # transport-class row count


def make_kernel(n_ops, rows_shape, trans=False):
    S, _ = rows_shape

    def kernel(x_ref, o_ref):
        rows = [x_ref[i * S : (i + 1) * S, :] for i in range(R // max(S, 1))]
        # chain ops round-robin over the rows, each op depending on the
        # previous result so nothing is dead-code eliminated. trans=False:
        # mul/add/where mix (ALU); trans=True: sqrt/div/exp/log1p (the ops
        # the physics kernel actually spends in _norm/_constraint_force)
        acc = rows[0]
        for i in range(n_ops):
            r = rows[(i + 1) % len(rows)]
            if trans:
                if i % 4 == 0:
                    acc = jnp.sqrt(acc * acc + r * r)
                elif i % 4 == 1:
                    acc = acc / (jnp.abs(r) + 1.5)
                elif i % 4 == 2:
                    acc = jnp.exp(-jnp.abs(acc)) + r
                else:
                    acc = jnp.log1p(jnp.abs(acc)) + r * 0.25
            elif i % 3 == 0:
                acc = acc * r + 0.5
            elif i % 3 == 1:
                acc = jnp.where(acc > r, acc - r, acc)
            else:
                acc = jnp.maximum(acc, r * 0.25)
        for i in range(len(rows)):
            o_ref[i * S : (i + 1) * S, :] = acc if i == 0 else rows[i]

    return kernel


def build(n_ops, S, trans=False):
    rows = R // S * S
    x = jnp.ones((rows, B // S * S), jnp.float32)

    @jax.jit
    def run(x):
        return pl.pallas_call(
            make_kernel(n_ops, (S, B // S), trans),
            out_shape=jax.ShapeDtypeStruct(x.shape, jnp.float32),
            in_specs=[pl.BlockSpec(x.shape, lambda: (0, 0), memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(x.shape, lambda: (0, 0), memory_space=pltpu.VMEM),
        )(x)

    out = run(x)
    jax.block_until_ready(out)
    return run, x


def measure(run, x, iters=200):
    for _ in range(20):
        out = run(x)
    jax.block_until_ready(out)
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(iters):
            out = run(x)
        jax.block_until_ready(out)
        best = min(best, (time.perf_counter() - t0) / iters)
    return best


def main():
    x = jnp.ones((128, 128))
    jax.block_until_ready(x @ x)
    print(f"probe ok on {jax.devices()[0].platform}; B={B} R={R}", flush=True)

    print("--- op sweep at S=1 (rows are (1, B)) ---", flush=True)
    pts = []
    for n in (0, 100, 300, 600, 1200):
        run, xx = build(n, 1)
        t = measure(run, xx)
        pts.append((n, t))
        print(f"  n_ops={n:5d}  {t*1e6:8.1f} us", flush=True)
    (n0, t0_), (n1, t1_) = pts[1], pts[-1]
    slope = (t1_ - t0_) / (n1 - n0)
    print(f"  slope ~{slope*1e9:.1f} ns/op, intercept ~{pts[0][1]*1e6:.1f} us")

    print("--- shape sweep at n_ops=600 ---", flush=True)
    for S in (1, 2, 6):
        run, xx = build(600, S)
        t = measure(run, xx)
        print(f"  rows ({S}, {B//S})  {t*1e6:8.1f} us", flush=True)

    print("--- TRANSCENDENTAL chains (sqrt/div/exp/log1p) ---", flush=True)
    for n in (100, 300, 600):
        run, xx = build(n, 1, trans=True)
        t = measure(run, xx)
        print(f"  trans n_ops={n:4d} (1, {B})  {t*1e6:8.1f} us", flush=True)
    for S in (2, 6):
        run, xx = build(300, S, trans=True)
        t = measure(run, xx)
        print(f"  trans n_ops= 300 ({S}, {B//S})  {t*1e6:8.1f} us", flush=True)


if __name__ == "__main__":
    main()
