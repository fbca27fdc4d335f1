"""Fused path-sweep kernel for road_traffic (pallas/TPU).

The road_traffic step is dominated by dense polyline work: the centerline
distance sweep, the 5-point (CG + rectangle corners) sweeps against both
lane boundaries, the rectangle-vs-boundary curve-intersection tests, and
the short-term reference-path lookup (reference road_traffic.py:1570-1784,
3315-3655). On the XLA path each of these materializes [B, A, 5, M-1]-class
intermediates; the compiled HLO of one step mentions f32[512,20,5,176]
buffers 154 times (~36 MB each) — the step is HBM-pass bound.

This module fuses all of it into ONE pallas kernel over (env, agent) lanes:

* the 40-path polyline tables are VMEM-resident ([rows, 40] block reused by
  every grid step, ~170 KB);
* per-lane path rows are gathered ON THE MXU as a one_hot(path_id) matmul
  at HIGHEST precision — bitwise equal to a row gather (each output element
  is a dot of one exact 1.0 against the row value plus exact zeros);
* every sweep intermediate lives and dies in VMEM; the kernel reads
  [4, B*A] of per-agent state and writes [28, B*A] of results.

Semantics mirror the XLA helpers bit for bit (same guarded sqrt, same
first-min tie-break expressed as min-index-of-min, same end-segment
inheritance, same straddle tests); the golden trajectory-parity suite runs
this kernel in interpret mode on CPU and asserts exact observation/reward
replay against recorded reference trajectories.

Forward-only (pallas defines no VJP): Environment flips
``scenario.pallas_sweeps`` off under ``grad_enabled=True`` the same way it
refuses fused physics there.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# output row layout
_R_D_REF = 0
_R_IDX_REF = 1
_R_DL = 2          # 5 rows
_R_IDX_L = 7
_R_DR = 8          # 5 rows
_R_IDX_R = 13
_R_COLL_L = 14
_R_COLL_R = 15
_R_ST = 16         # 2*S rows (x then y)


def build_tables(paths):
    """Pack the path tables into one [rows, n_paths] f32 block (VMEM
    resident in the kernel): cx, cy | lx, ly, rx, ry | n_pts, n_l, n_r,
    is_loop.

    ``paths`` must be the HOST-side (numpy) path namespace, not the jnp
    view: pulling device arrays back with np.asarray stalls behind every
    queued computation (and hangs outright through the axon tunnel)."""
    import numpy as np

    c = np.asarray(paths.center, np.float32)     # [NP, Mc, 2]
    l = np.asarray(paths.left_b, np.float32)     # [NP, Mb, 2]
    r = np.asarray(paths.right_b, np.float32)
    rows = [
        c[..., 0].T, c[..., 1].T,
        l[..., 0].T, l[..., 1].T,
        r[..., 0].T, r[..., 1].T,
        np.asarray(paths.n_points, np.float32)[None],
        np.asarray(paths.n_left, np.float32)[None],
        np.asarray(paths.n_right, np.float32)[None],
        np.asarray(paths.is_loop, np.float32)[None],
    ]
    return jnp.asarray(np.concatenate(rows, axis=0))  # [2Mc+4Mb+4, NP]


def _make_kernel(NP, Mc, Mb, lh, wh, S, interval, shift):
    """Generate the kernel for static map/agent geometry. ``lh``/``wh`` are
    the rectangle half length/width, S/interval/shift the short-term-path
    parameters (reference road_traffic.py:3458-3525). The only caller stages
    the CENTERLINE short-term path, which uses shift=1; the nearing-boundary
    refresh (shift=-2) still runs on the XLA path — anyone fusing it must
    pass its own shift, not reuse this one."""

    def kernel(t_ref, x_ref, o_ref):
        from vmas_tpu.core.fused import _norm as safe_norm2
        Bk = x_ref.shape[1]
        pid = x_ref[0:1, :]
        px = x_ref[1:2, :]
        py = x_ref[2:3, :]
        yaw = x_ref[3:4, :]

        # --- MXU one-hot gather of this lane's path rows ---------------
        # Mosaic iota must be integer-typed; compare in f32 (small exact ints)
        oh = (
            jax.lax.broadcasted_iota(jnp.int32, (NP, Bk), 0).astype(jnp.float32)
            == pid
        ).astype(jnp.float32)
        dotg = lambda tab: jax.lax.dot_general(
            tab, oh, (((1,), (0,)), ((), ())),
            precision=jax.lax.Precision.HIGHEST,
            preferred_element_type=jnp.float32,
        )
        o = 0
        cx = dotg(t_ref[o : o + Mc, :]); o += Mc
        cy = dotg(t_ref[o : o + Mc, :]); o += Mc
        lx = dotg(t_ref[o : o + Mb, :]); o += Mb
        ly = dotg(t_ref[o : o + Mb, :]); o += Mb
        rx = dotg(t_ref[o : o + Mb, :]); o += Mb
        ry = dotg(t_ref[o : o + Mb, :]); o += Mb
        n_pts = dotg(t_ref[o : o + 1, :]); o += 1
        n_l = dotg(t_ref[o : o + 1, :]); o += 1
        n_r = dotg(t_ref[o : o + 1, :]); o += 1
        is_loop = dotg(t_ref[o : o + 1, :]); o += 1

        # --- closed rectangle vertices (rectangle_vertices) ------------
        cos, sin = jnp.cos(yaw), jnp.sin(yaw)
        base = [(lh, wh), (lh, -wh), (-lh, -wh), (-lh, wh), (lh, wh)]
        vxs = [cos * bx - sin * by + px for bx, by in base]
        vys = [sin * bx + cos * by + py for bx, by in base]

        # --- perpendicular_distances, one polyline at a time ------------
        def sweep(bx, by, M, n, points):
            """points: list of (px, py) rows. Returns (list of dmin rows,
            list of idx rows). Mirrors perpendicular_distances exactly."""
            sx, sy = bx[:-1, :], by[:-1, :]
            vx = bx[1:, :] - sx
            vy = by[1:, :] - sy
            ll = vx * vx + vy * vy + 1e-8
            seg = jax.lax.broadcasted_iota(jnp.int32, (M - 1, Bk), 0).astype(jnp.float32)
            end_seg = jnp.maximum(n - 2.0, 0.0)
            end_mask = seg == end_seg
            tail = seg >= (n - 1.0)
            dmins, idxs = [], []
            for qx, qy in points:
                pvx = qx - sx
                pvy = qy - sy
                t = jnp.clip((pvx * vx + pvy * vy) / ll, 0, 1)
                dx = (sx + vx * t) - qx
                dy = (sy + vy * t) - qy
                d = safe_norm2(dx, dy)
                end_d = jnp.sum(jnp.where(end_mask, d, 0.0), axis=0, keepdims=True)
                d = jnp.where(tail, end_d, d)
                dmin = jnp.min(d, axis=0, keepdims=True)
                # first-min tie-break == jnp.argmin: lowest index hitting dmin
                idx = jnp.min(
                    jnp.where(d == dmin, seg, float(M)), axis=0, keepdims=True
                )
                dmins.append(dmin)
                idxs.append(idx + 1.0)
            return dmins, idxs

        pts5 = list(zip([px] + vxs[:4], [py] + vys[:4]))
        [d_ref], [idx_ref] = sweep(cx, cy, Mc, n_pts, [(px, py)])
        dl, il = sweep(lx, ly, Mb, n_l, pts5)
        dr, ir = sweep(rx, ry, Mb, n_r, pts5)

        # --- interX rectangle-vs-boundary (interX_any) ------------------
        def interx(bx, by):
            dx2 = bx[1:, :] - bx[:-1, :]
            dy2 = by[1:, :] - by[:-1, :]
            S2 = dx2 * by[:-1, :] - dy2 * bx[:-1, :]
            hit = None
            for i in range(4):
                x1i, y1i = vxs[i], vys[i]
                x1n, y1n = vxs[i + 1], vys[i + 1]
                dx1 = x1n - x1i
                dy1 = y1n - y1i
                S1 = dx1 * y1i - dy1 * x1i
                v1 = dx1 * by - dy1 * bx
                C1 = (v1[:-1, :] - S1) * (v1[1:, :] - S1) < 0
                v2i = y1i * dx2 - x1i * dy2
                v2n = y1n * dx2 - x1n * dy2
                C2 = (v2i - S2) * (v2n - S2) < 0
                h = jnp.max((C1 & C2).astype(jnp.float32), axis=0, keepdims=True)
                hit = h if hit is None else jnp.maximum(hit, h)
            return hit

        coll_l = interx(lx, ly)
        coll_r = interx(rx, ry)

        # --- short-term path staging (short_term_path, shift per step) --
        idx_i = idx_ref.astype(jnp.int32)
        n_i = n_pts.astype(jnp.int32)
        loop_b = is_loop > 0.0
        iota_c = jax.lax.broadcasted_iota(jnp.int32, (Mc, Bk), 0).astype(jnp.float32)
        st = []
        for j in range(S):
            fut = idx_i + (j * interval + shift)
            fut = jnp.where(loop_b & (fut >= n_i - 1), (fut + 1) % n_i, fut)
            fut = jnp.where(fut < 0, Mc + fut, fut)
            fut = jnp.clip(fut, 0, Mc - 1).astype(jnp.float32)
            hitrow = iota_c == fut
            st.append(
                (jnp.sum(jnp.where(hitrow, cx, 0.0), axis=0, keepdims=True),
                 jnp.sum(jnp.where(hitrow, cy, 0.0), axis=0, keepdims=True))
            )

        # --- outputs ----------------------------------------------------
        o_ref[_R_D_REF : _R_D_REF + 1, :] = d_ref
        o_ref[_R_IDX_REF : _R_IDX_REF + 1, :] = idx_ref
        for p in range(5):
            o_ref[_R_DL + p : _R_DL + p + 1, :] = dl[p]
            o_ref[_R_DR + p : _R_DR + p + 1, :] = dr[p]
        o_ref[_R_IDX_L : _R_IDX_L + 1, :] = il[0]
        o_ref[_R_IDX_R : _R_IDX_R + 1, :] = ir[0]
        o_ref[_R_COLL_L : _R_COLL_L + 1, :] = coll_l
        o_ref[_R_COLL_R : _R_COLL_R + 1, :] = coll_r
        for j in range(S):
            o_ref[_R_ST + j : _R_ST + j + 1, :] = st[j][0]
            o_ref[_R_ST + S + j : _R_ST + S + j + 1, :] = st[j][1]

    return kernel


# ---------------------------------------------------------------------------
# all-ego observation kernel
# ---------------------------------------------------------------------------


def _make_obs_kernel(A, S, K, apply_mask, norm_pos, norm_v, norm_dist, thresh):
    """Default-config observation (ego view, partial observation, vertices,
    agent distances, boundary distances; reference road_traffic.py:1785-2280)
    for ALL egos in one kernel.

    The XLA path builds every ego's frame by transforming all A agents'
    pos/vel/verts/short-term through atan2/cos/sin chains and THEN gathering
    the n_nearing observed agents (20 per-ego fused chains; the dominant
    residual after the sweep kernel). Restructuring that in XLA — gather
    first, or one batched chain — either hangs the TPU compile or regresses
    (docs/PERFORMANCE.md). Here each ego's top-K nearest agents are selected
    in-kernel (sequential masked min, ties to the lowest index — exactly
    jax.lax.top_k on the diagonal-lifted distance row) and only their rows
    are gathered (masked sublane reductions over the [A, BLK] quantity
    blocks) and transformed; formulas mirror safe_norm/to_local bit for bit.
    """
    W = 1 + 2 * S + 3 + K * 11  # vel_long | ref_self | d_ref,d_l,d_r | K*(vert8+vel2+dist1)
    PX, PY, ROT, VX, VY = 0, A, 2 * A, 3 * A, 4 * A
    STX = lambda s: (5 + s) * A
    STY = lambda s: (5 + S + s) * A
    VTX = lambda c: (5 + 2 * S + c) * A
    VTY = lambda c: (5 + 2 * S + 4 + c) * A
    BASE = (13 + 2 * S) * A
    DREF, DL, DR = BASE, BASE + A, BASE + 2 * A

    def kernel(x_ref, o_ref):
        Bk = x_ref.shape[1]
        row = lambda r: x_ref[r : r + 1, :]
        blk = lambda r: x_ref[r : r + A, :]  # [A, Bk] quantity block
        px_b, py_b, rot_b = blk(PX), blk(PY), blk(ROT)
        vx_b, vy_b = blk(VX), blk(VY)
        iota_A = jax.lax.broadcasted_iota(jnp.int32, (A, Bk), 0).astype(jnp.float32)

        from vmas_tpu.core.fused import _norm as safe_norm2

        def gather(r, idx):
            """row idx (per lane) of quantity block at r -> [1, Bk]."""
            return jnp.sum(
                jnp.where(iota_A == idx, blk(r), 0.0), axis=0, keepdims=True
            )

        for i in range(A):
            pxi, pyi, roti = row(PX + i), row(PY + i), row(ROT + i)
            ci, si = jnp.cos(roti), jnp.sin(roti)

            def to_local(qx, qy, ci=ci, si=si, pxi=pxi, pyi=pyi):
                """one point -> ego-i frame. The observation hook's to_local
                is the polar form cos/sin(atan2(dy,dx) - rot)*|v|; this is
                its exact rotation-matrix identity (equal to ~1 ulp) —
                Mosaic has no atan2 lowering, and hoisting cos/sin(rot) per
                ego removes 3 transcendentals per transformed point."""
                dx, dy = qx - pxi, qy - pyi
                return dx * ci + dy * si, dy * ci - dx * si

            # mutual distances from ego i (d_agents row i, diagonal lifted —
            # the global-max lift only keeps self out of the top-K, so an
            # inf-mask on row i is selection-equivalent)
            ddx, ddy = px_b - pxi, py_b - pyi
            d_row = jnp.sqrt(ddx * ddx + ddy * ddy + 1e-12)
            d_cur = jnp.where(iota_A == float(i), jnp.inf, d_row)

            o = i * W
            # --- self rows ------------------------------------------------
            # vel_others[:, i, 0]: rot_rel is exactly 0 -> cos(0) == 1
            o_ref[o : o + 1, :] = safe_norm2(row(VX + i), row(VY + i)) / norm_v
            o += 1
            for s in range(S):
                sx, sy = to_local(row(STX(s) + i), row(STY(s) + i))
                o_ref[o : o + 1, :] = sx / norm_pos
                o_ref[o + 1 : o + 2, :] = sy / norm_pos
                o += 2
            o_ref[o : o + 1, :] = row(DREF + i) / norm_dist
            o_ref[o + 1 : o + 2, :] = row(DL + i) / norm_dist
            o_ref[o + 2 : o + 3, :] = row(DR + i) / norm_dist
            o += 3

            # --- K nearest agents ----------------------------------------
            for _ in range(K):
                m = jnp.min(d_cur, axis=0, keepdims=True)  # [1, Bk]
                idx = jnp.min(
                    jnp.where(d_cur == m, iota_A, float(A)), axis=0, keepdims=True
                )
                d_cur = jnp.where(iota_A == idx, jnp.inf, d_cur)
                far = (
                    m >= thresh
                    if apply_mask
                    else jnp.zeros_like(m, dtype=bool)
                )
                for c in range(4):
                    cx, cy = to_local(gather(VTX(c), idx), gather(VTY(c), idx))
                    o_ref[o : o + 1, :] = jnp.where(far, 1.0, cx / norm_pos)
                    o_ref[o + 1 : o + 2, :] = jnp.where(far, 1.0, cy / norm_pos)
                    o += 2
                vel_abs = safe_norm2(gather(VX, idx), gather(VY, idx))
                rot_rel = gather(ROT, idx) - roti
                o_ref[o : o + 1, :] = jnp.where(
                    far, 0.0, vel_abs * jnp.cos(rot_rel) / norm_v
                )
                o_ref[o + 1 : o + 2, :] = jnp.where(
                    far, 0.0, vel_abs * jnp.sin(rot_rel) / norm_v
                )
                o += 2
                o_ref[o : o + 1, :] = jnp.where(far, 1.0, m / norm_dist)
                o += 1

    return kernel, W


@functools.partial(
    jax.jit,
    static_argnames=("K", "apply_mask", "norm_pos", "norm_v", "norm_dist", "thresh"),
)
def obs_all(pos, rot, vel, short_term, verts, d_ref, d_left_min, d_right_min,
            *, K, apply_mask, norm_pos, norm_v, norm_dist, thresh):
    """All-ego default-config observations in one pallas kernel.

    pos/vel [B, A, 2]; rot [B, A]; short_term [B, A, S, 2]; verts
    [B, A, >=4, 2] (first 4 corners used); d_ref/d_left_min/d_right_min
    [B, A]. Returns [A, B, W] (noise-free; the caller adds the per-ego
    uniform noise)."""
    B, A = rot.shape
    S = short_term.shape[2]
    rows = [pos[..., 0].T, pos[..., 1].T, rot.T, vel[..., 0].T, vel[..., 1].T]
    rows += [short_term[:, :, s, 0].T for s in range(S)]
    rows += [short_term[:, :, s, 1].T for s in range(S)]
    rows += [verts[:, :, c, 0].T for c in range(4)]
    rows += [verts[:, :, c, 1].T for c in range(4)]
    rows += [d_ref.T, d_left_min.T, d_right_min.T]
    x = jnp.concatenate(rows, axis=0)  # [(16+2S)A, B]

    blk = min(512, -(-B // 128) * 128)
    bp = -(-B // blk) * blk
    if bp != B:
        x = jnp.pad(x, ((0, 0), (0, bp - B)))

    kernel, W = _make_obs_kernel(
        A, S, K, apply_mask, norm_pos, norm_v, norm_dist, thresh
    )
    y = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((A * W, bp), jnp.float32),
        grid=(bp // blk,),
        in_specs=[
            pl.BlockSpec((x.shape[0], blk), lambda i: (0, i), memory_space=pltpu.VMEM)
        ],
        out_specs=pl.BlockSpec((A * W, blk), lambda i: (0, i), memory_space=pltpu.VMEM),
        interpret=jax.default_backend() == "cpu",
    )(x)
    return y[:, :B].reshape(A, W, B).transpose(0, 2, 1)  # [A, B, W]


@functools.partial(
    jax.jit, static_argnames=("Mc", "Mb", "lh", "wh", "S", "interval", "shift")
)
def sweep_all(tables, pid, pos, rot, *, Mc, Mb, lh, wh, S, interval, shift):
    """Run the fused sweep kernel.

    tables: build_tables(P) [rows, N_PATHS]; pid [B, A] int32;
    pos [B, A, 2]; rot [B, A]. Returns a dict of [B, A]-shaped results:
    d_ref, idx_ref, dl5/dr5 [B, A, 5], idx_l, idx_r, coll_l, coll_r (bool),
    short_term [B, A, S, 2].
    """
    B, A = pid.shape
    BA = B * A
    x = jnp.stack(
        [
            pid.reshape(BA).astype(jnp.float32),
            pos[..., 0].reshape(BA),
            pos[..., 1].reshape(BA),
            rot.reshape(BA),
        ],
        axis=0,
    )  # [4, BA]
    blk = min(512, -(-BA // 128) * 128)
    bp = -(-BA // blk) * blk
    if bp != BA:
        x = jnp.pad(x, ((0, 0), (0, bp - BA)))

    n_out = _R_ST + 2 * S
    Rt, NP = tables.shape
    kernel = _make_kernel(NP, Mc, Mb, lh, wh, S, interval, shift)
    y = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((n_out, bp), jnp.float32),
        grid=(bp // blk,),
        in_specs=[
            pl.BlockSpec((Rt, NP), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((4, blk), lambda i: (0, i), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((n_out, blk), lambda i: (0, i), memory_space=pltpu.VMEM),
        interpret=jax.default_backend() == "cpu",
    )(tables, x)

    y = y[:, :BA]
    ba = lambda r: y[r].reshape(B, A)
    st = jnp.stack(
        [
            jnp.stack([ba(_R_ST + j) for j in range(S)], axis=-1),
            jnp.stack([ba(_R_ST + S + j) for j in range(S)], axis=-1),
        ],
        axis=-1,
    )  # [B, A, S, 2]
    return dict(
        d_ref=ba(_R_D_REF),
        idx_ref=ba(_R_IDX_REF).astype(jnp.int32),
        dl5=jnp.stack([ba(_R_DL + p) for p in range(5)], axis=-1),
        dr5=jnp.stack([ba(_R_DR + p) for p in range(5)], axis=-1),
        idx_l=ba(_R_IDX_L).astype(jnp.int32),
        idx_r=ba(_R_IDX_R).astype(jnp.int32),
        coll_l=ba(_R_COLL_L) > 0.0,
        coll_r=ba(_R_COLL_R) > 0.0,
        short_term=st,
    )
