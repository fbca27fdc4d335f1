"""Fused single-kernel physics step (pallas/TPU).

The XLA path (physics.py) lowers one step to ~45 fusions, each round-tripping
the [B, E] state through HBM — at typical scales the step is fusion-count
bound, not FLOP bound. This module emits ONE pallas kernel per WorldSpec that
keeps the whole state in VMEM for all substeps.

Layout: the state is packed as component-rows [9E, B] (px, py, vx, vy, rot,
w, fx, fy, tq per entity); lanes are environments. The kernel is generated
per spec with every entity/pair rule unrolled over static python indices —
a pure-VPU instruction stream with no dynamic gathers or layout changes.
(A matrix formulation with one-hot MXU gathers was measured slower at VMAS
entity counts: MXU<->VPU switching costs more than the extra VPU ops.)

Two pair formulations, auto-selected per pair type: few pairs run one
(1, BLK) row computation each (transport/joint-class worlds); a type with
>= lane_min pairs instead stacks its operands into a [P, BLK] tile
(static sublane concatenation — the indices are compile-time constants) and
runs ONE vectorized computation for all its pairs, with per-pair slice-adds
scattering forces back. The tile form fills all 8 sublanes of every VREG,
which is where the per-entity unroll lost to XLA on many-entity/few-type
worlds (football-class).

Semantics mirror physics.py exactly (same guard chains, same first-min
tie-breaks); tests/test_fused.py asserts near-bitwise agreement against the
XLA path on every shape-pair type.

Forward-only: pallas kernels define no VJP, so a fused world cannot be
differentiated through — construct with fused_physics=False (the default)
for differentiable rollouts; Environment refuses grad_enabled+fused.
Contact-saturated worlds whose unrolled program would explode compile time
fall back to the XLA path via supports(). Joints and per-env dynamic
gravity are fully supported.
"""

from __future__ import annotations

import math
import os

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from vmas_tpu.core.utils import LINE_MIN_DIST

_MIN_DIST = 1e-6


# ---------------------------------------------------------------------------
# helpers on (rows, BLK) arrays; a "vec" is an (x, y) pair of same-shape rows
# ---------------------------------------------------------------------------

def _norm(x, y):
    sq = x * x + y * y
    is_zero = sq == 0.0
    return jnp.where(is_zero, 0.0, jnp.sqrt(jnp.where(is_zero, 1.0, sq)))


def _logaddexp0(x):
    # logaddexp(0, x) = max(x, 0) + log1p(exp(-|x|))
    return jnp.maximum(x, 0.0) + jnp.log1p(jnp.exp(-jnp.abs(x)))


def _constraint_force(cm, ax, ay, bx, by, dist_min, mult, attractive=False):
    """physics.py constraint_forces on row pairs; returns force on a (negate
    for b)."""
    dx, dy = ax - bx, ay - by
    dist = _norm(dx, dy)
    sign = -1.0 if attractive else 1.0
    penetration = _logaddexp0((dist_min - dist) * sign / cm) * cm
    scale = sign * mult * penetration / jnp.where(dist > 0, dist, 1e-8)
    fx, fy = dx * scale, dy * scale
    drop = dist < _MIN_DIST
    drop = drop | ((dist > dist_min) if not attractive else (dist < dist_min))
    fx = jnp.where(drop, 0.0, fx)
    fy = jnp.where(drop, 0.0, fy)
    return fx, fy


def _closest_point_line(lx, ly, cos, sin, half_len, px, py):
    """geometry.closest_point_line with precomputed direction."""
    dot = (lx - px) * cos + (ly - py) * sin
    sign = jnp.sign(dot)
    dist = jnp.minimum(jnp.abs(dot), half_len)
    return lx - sign * dist * cos, ly - sign * dist * sin


def _pick_closest(cands):
    """First-min-wins selection over [(p1x,p1y,p2x,p2y), ...] candidates."""
    bx1, by1, bx2, by2 = cands[0]
    bd = _norm(bx1 - bx2, by1 - by2)
    for cx1, cy1, cx2, cy2 in cands[1:]:
        d = _norm(cx1 - cx2, cy1 - cy2)
        better = d < bd
        bx1 = jnp.where(better, cx1, bx1)
        by1 = jnp.where(better, cy1, by1)
        bx2 = jnp.where(better, cx2, bx2)
        by2 = jnp.where(better, cy2, by2)
        bd = jnp.where(better, d, bd)
    return bx1, by1, bx2, by2


def _line_extrema(lx, ly, cos, sin, half):
    return (lx + cos * half, ly + sin * half, lx - cos * half, ly - sin * half)


def _intersection(a1x, a1y, a2x, a2y, b1x, b1y, b2x, b2y):
    """geometry.intersection_point_line_line on rows."""
    rx, ry = a2x - a1x, a2y - a1y
    sx, sy = b2x - b1x, b2y - b1y
    qpx, qpy = b1x - a1x, b1y - a1y
    cross_qp_r = qpx * ry - qpy * rx
    cross_qp_s = qpx * sy - qpy * sx
    cross_r_s = rx * sy - ry * sx
    den = jnp.where(cross_r_s == 0.0, 1.0, cross_r_s)
    u = cross_qp_r / den
    t = cross_qp_s / den
    cond = (cross_r_s != 0.0) & (t >= 0) & (t <= 1) & (u >= 0) & (u <= 1)
    return a1x + t * rx, a1y + t * ry, cond


def _closest_points_line_line(ax, ay, acos, asin, ahalf, bx, by, bcos, bsin, bhalf):
    a1x, a1y, a2x, a2y = _line_extrema(ax, ay, acos, asin, ahalf)
    b1x, b1y, b2x, b2y = _line_extrema(bx, by, bcos, bsin, bhalf)
    ix, iy, hit = _intersection(a1x, a1y, a2x, a2y, b1x, b1y, b2x, b2y)

    a1bx, a1by = _closest_point_line(bx, by, bcos, bsin, bhalf, a1x, a1y)
    a2bx, a2by = _closest_point_line(bx, by, bcos, bsin, bhalf, a2x, a2y)
    b1ax, b1ay = _closest_point_line(ax, ay, acos, asin, ahalf, b1x, b1y)
    b2ax, b2ay = _closest_point_line(ax, ay, acos, asin, ahalf, b2x, b2y)

    p1x, p1y, p2x, p2y = _pick_closest([
        (a1x, a1y, a1bx, a1by),
        (a2x, a2y, a2bx, a2by),
        (b1ax, b1ay, b1x, b1y),
        (b2ax, b2ay, b2x, b2y),
    ])
    p1x = jnp.where(hit, ix, p1x)
    p1y = jnp.where(hit, iy, p1y)
    p2x = jnp.where(hit, ix, p2x)
    p2y = jnp.where(hit, iy, p2y)
    return p1x, p1y, p2x, p2y


def _box_edges(px, py, cos, sin, half_w, half_l):
    """geometry.all_lines_box: 4 edges as (pos, cos, sin, half_len) in the
    reference's order (+len, -len, +wid, -wid)."""
    wx, wy = -sin, cos
    return [
        (px + cos * half_l, py + sin * half_l, wx, wy, half_w),
        (px - cos * half_l, py - sin * half_l, wx, wy, half_w),
        (px + wx * half_w, py + wy * half_w, cos, sin, half_l),
        (px - wx * half_w, py - wy * half_w, cos, sin, half_l),
    ]


def _closest_point_box(px, py, cos, sin, half_w, half_l, tx, ty):
    cands = []
    for ex, ey, ecos, esin, ehalf in _box_edges(px, py, cos, sin, half_w, half_l):
        cx, cy = _closest_point_line(ex, ey, ecos, esin, ehalf, tx, ty)
        cands.append((cx, cy, tx, ty))
    bx, by, _, _ = _pick_closest(cands)
    return bx, by


def _closest_line_box(px, py, cos, sin, half_w, half_l, lx, ly, lcos, lsin, lhalf):
    """Returns (point_on_box, point_on_line)."""
    cands = []
    for ex, ey, ecos, esin, ehalf in _box_edges(px, py, cos, sin, half_w, half_l):
        cands.append(
            _closest_points_line_line(ex, ey, ecos, esin, ehalf, lx, ly, lcos, lsin, lhalf)
        )
    return _pick_closest(cands)


def _inner_point_box(ox, oy, sx, sy, bx, by):
    """geometry.inner_point_box on rows -> (ix, iy, dist)."""
    vx, vy = sx - ox, sy - oy
    ux, uy = bx - sx, by - sy
    vn = _norm(vx, vy)
    den = jnp.where(vn == 0.0, 1.0, vn)
    mag = (vx * ux + vy * uy) / den
    xx, xy_ = vx / den * mag, vy / den * mag
    degenerate = vn == 0.0
    # geometry.inner_point_box substitutes the SURFACE POINT for the offset
    # in the degenerate lane (inner = 2*surface); mirror it exactly
    ix = sx + jnp.where(degenerate, sx, xx)
    iy = sy + jnp.where(degenerate, sy, xy_)
    d = jnp.where(degenerate, 0.0, jnp.abs(mag))
    return ix, iy, d


# ---------------------------------------------------------------------------
# kernel generation
# ---------------------------------------------------------------------------

# rough per-pair instruction weights for the unrolled kernel; bb expands to
# 8 line-box candidates of 4 line-line tests each
_PAIR_WEIGHT = {"ss": 1, "ls": 2, "ll": 5, "bs": 5, "bl": 20, "bb": 40}
_MAX_UNROLL = 4000
# pair types with at least this many pairs switch from per-pair unrolling to
# ONE vectorized computation over a [P, BLK] tile (pairs on sublanes, envs on
# lanes) — the many-entity/few-pair-type regime (football-class worlds) where
# per-pair (1, BLK) rows waste 7/8 of every VREG. Overridable via
# VMAS_TPU_FUSED_LANE_MIN for on-hardware threshold sweeps
# (tests/golden/tpu_measure_r2.py lanemin); the env var is read at every
# kernel build (NOT at import), so setting it after importing vmas_tpu still
# takes effect — but note a globally-set value alters kernel structure and
# supports() eligibility for every subsequently-built world. Results match
# the unrolled form within 1 ulp either way (the tile scatter preserves
# accumulation order; constant tiles round their float64 bases once, like
# the unrolled path).
def _lane_min() -> int:
    v = int(os.environ.get("VMAS_TPU_FUSED_LANE_MIN", "8"))
    return max(v, 1)


# The per-entity clamp/friction/gravity/integrate stream runs on [E, BLK]
# tiles (entities on sublanes, envs on lanes) instead of E separate (1, BLK)
# rows — the same lever as the lane-batched pair tiles, applied to the
# per-entity stream (docs/PERFORMANCE.md "Speed-of-light check"). Pair/joint
# force scatters chain onto SLICES of the tile-computed base force, so the
# per-entity accumulation order (action + friction + gravity, then joints,
# then pairs) is element-for-element the order the unrolled path retires —
# results match within the usual +0.0/-0.0 equivalence.
#
# Auto-selected by entity count (like the pair tiles' lane_min): measured on
# hardware (docs/PERFORMANCE.md round-3), tiles win at MANY entities
# (football E=19: -14% step time) and lose at few (wind_flocking E=5: +15%;
# joint-class substeps pay per-substep sublane extracts for the pair reads),
# with transport (E=6) a wash. VMAS_TPU_FUSED_ENTITY_TILE=0/1 forces it for
# A/B sweeps; unset/auto applies the threshold.
_ENTITY_TILE_MIN_E = 16


def _entity_tile_on(E: int) -> bool:
    v = os.environ.get("VMAS_TPU_FUSED_ENTITY_TILE", "auto").strip().lower()
    if v in ("0", "false", "off"):
        return False
    if v in ("1", "true", "on"):
        return True
    return E >= _ENTITY_TILE_MIN_E


# Sublane packing (VMAS_TPU_FUSED_SUBLANES, default OFF): a logical (1, B)
# state row nominally occupies ceil(B/128) VREGs with 1 of 8 sublanes live,
# which round 2's roofline note blamed for the kernel's VPU-issue floor.
# Packing S row-segments onto sublanes tests that theory WITHOUT in-kernel
# relayouts (the round-2 attempt reshaped inside the kernel and paid real
# layout copies): the host-side [R, B] -> [R*S, B/S] reshape is row-major
# contiguous — a free XLA bitcast — and every kernel row view becomes a
# fully-packed (S, B/S) tile, values per env bit-identical to S=1.
#
# MEASURED A LOSS on hardware (round 4, same-process interleaved A/B,
# transport@4096 fused bench rollout: S=1 281.5 vs S=8 318.3 us/step best,
# S=8 behind in every window) — i.e. the kernel is bound by per-op issue
# overhead that is INDEPENDENT of how many VREGs an op retires; Mosaic
# evidently already streams (1, N) rows efficiently. Default stays 1; the
# knob and its bit-equality tests stay so the theory is not re-derived a
# fourth time (docs/PERFORMANCE.md). "auto" (opt-in) picks the largest S
# that the 128-padded batch divides by; no extra padding is ever introduced.
def _sublanes(bp: int) -> int:
    v = os.environ.get("VMAS_TPU_FUSED_SUBLANES", "1").strip().lower()
    if v in ("auto",):
        for s in (8, 4, 2):
            if bp % (128 * s) == 0:
                return s
        return 1
    s = int(v or "1")
    assert s in (1, 2, 4, 8), f"VMAS_TPU_FUSED_SUBLANES must be 1/2/4/8, got {s}"
    # an EXPLICIT S that cannot divide the padded batch must fail loudly:
    # a silent S=1 fallback would mislabel sweep measurements as S=s (the
    # measurement-integrity bug class docs/PERFORMANCE.md exists to kill)
    assert s == 1 or bp % (128 * s) == 0, (
        f"VMAS_TPU_FUSED_SUBLANES={s} needs num_envs padded to a "
        f"{128 * s}-multiple (got {bp}); use 'auto' for best-fit"
    )
    return s


class _Rows:
    """Lazy per-entity (S, BLK/S) row views over an [E*S, BLK/S] tile; rows
    are sliced (and cached) only when the pair/joint/emit code actually reads
    them, so untouched entities cost no sublane extracts."""

    __slots__ = ("t", "c", "s")

    def __init__(self, t, s=1):
        self.t = t
        self.c = {}
        self.s = s

    def __getitem__(self, e):
        if e not in self.c:
            self.c[e] = self.t[e * self.s : (e + 1) * self.s, :]
        return self.c[e]

    def __len__(self):
        return int(self.t.shape[0]) // self.s

    def __iter__(self):
        return (self[e] for e in range(len(self)))


def _assemble(rows, base, s=1):
    """Rebuild the [E*S, BLK/S] force tile from per-entity accumulator rows,
    taking maximal runs of untouched entities as multi-row slices of the
    base tile (one sublane copy per run instead of per entity)."""
    E = int(base.shape[0]) // s
    segs = []
    i = 0
    while i < E:
        if rows[i] is None:
            j = i
            while j < E and rows[j] is None:
                j += 1
            segs.append(base[i * s : j * s, :])
            i = j
        else:
            segs.append(rows[i])
            i += 1
    if len(segs) == 1:
        return segs[0]
    return jnp.concatenate(segs, axis=0)


def _pair_cost(n, weight, substeps):
    """Instruction-stream cost of one pair type: batched types cost one
    vectorized computation per 8 sublanes, unrolled types one per pair."""
    if n >= _lane_min():
        return (-(-n // 8) + n // 4) * weight * substeps  # compute + scatter
    return n * weight * substeps


def supports(world) -> bool:
    """Static eligibility for the fused path."""
    spec = world.spec
    substeps = int(world.substeps)
    cost = (
        _pair_cost(len(spec.ss_a), _PAIR_WEIGHT["ss"], substeps)
        + _pair_cost(len(spec.ls_line), _PAIR_WEIGHT["ls"], substeps)
        + _pair_cost(len(spec.ll_a), _PAIR_WEIGHT["ll"], substeps)
        + _pair_cost(len(spec.bs_box), _PAIR_WEIGHT["bs"], substeps)
        + _pair_cost(len(spec.bl_box), _PAIR_WEIGHT["bl"], substeps)
        + _pair_cost(len(spec.bb_a), _PAIR_WEIGHT["bb"], substeps)
        + len(spec.joint_idx_a) * 2 * substeps
        # per-entity clamp/friction/gravity/integrate stream — a zero-pair
        # world with hundreds of movable entities unrolls just as badly as
        # a pair-heavy one
        + len(spec.movable) * substeps
    )
    # very large unrolled programs explode Mosaic compile time; use XLA
    return cost <= _MAX_UNROLL


class FusedOutputs:
    """Protocol for fusing a scenario's observations/rewards/termination
    into the physics kernel (opt-in per scenario via
    ``Scenario.make_fused_outputs(world)``; see transport's implementation).

    The non-physics half of an env step (obs + rewards + done) costs as much
    HBM/dispatch as the physics at VMAS scales; a scenario whose outputs are
    arithmetic over entity state can emit them as extra kernel output rows
    while the state is still in VMEM. The scenario remains the single
    source of the MATH (its emit mirrors observation()/reward() line for
    line and is asserted equal by tests/test_fused.py); the env pipeline
    stays the single source of the STEP STRUCTURE (environment.py gates on
    this object and skips only the hooks the kernel replaced).

    Required members:
      n_scratch_in: int — extra input rows appended after the state rows
      n_out: int — extra output rows appended after the 9E state rows
      scratch_rows(state) -> [n_scratch_in, B] array
      emit(ctx) -> list of n_out (1, BLK) rows; ctx is a dict with the
          post-integration per-entity rows px/py/vx/vy/rot/w and the
          scratch rows under "scratch"
      unpack(extra [n_out, B], state) -> (obs_tuple, rews_tuple,
          terminated [B] bool, scratch_updates dict)

    Optional:
      carry_extra_idx: tuple, one entry per scratch-in row — opts into the
          rows-carried rollout (parallel/rollout.py rows_rollout_fn). An
          int entry is the emit-row index holding that scratch row's NEXT
          value; None means rollout-constant (carried unchanged). Only
          declare when unpack reads no step-varying state beyond what
          unpack_reads names; authoring rules in docs/FUSED_OUTPUTS.md.
      unpack_reads: tuple of step-varying state fields unpack reads.
          Default () = none (the base promise). ("u",) marks an unpack
          whose ONLY step-varying read is the agents' decoded action
          (dropout's energy term); the rows rollout substitutes the
          per-step u it already holds before calling unpack.
      process_action_noop: bool (default False) — the scenario OVERRIDES
          process_action, but for THIS config the override provably
          returns the state unchanged (give_way / joint_passage with
          their velocity controllers disabled). The rows rollout then
          stays eligible.
      post_rewards_rollout_safe: bool (default False) — the scenario's
          post_rewards override only (a) rewrites scratch idempotently
          with values unpack already merged and (b) touches fields no
          kernel row or observation reads (rendering toggles). The rows
          rollout then stays eligible and applies post_rewards ONCE to
          the final state instead of per step.
      finish_obs(obs_tuple, state) -> obs_tuple — called AFTER the scratch
          updates are merged and post_rewards has run. unpack sees the
          pre-post_rewards state, but the non-fused hook order computes
          observations after post_rewards; a scenario whose post_rewards
          MOVES entities the observation reads (discovery's target respawn
          + its Lidar) must defer that part of the observation to here.
          Default: identity.
      script_slots / script_us(state, horizon): precomputable scripted
          agents (flocking's circling target). script_slots names their
          entity indices; script_us returns one [T, B, 2] u array per slot
          — the exact values the XLA script would produce each step. The
          rows rollout rides them on the action rows like policy actions.
      n_ctrl / ctrl_rows(state) / process_act_rows(ctx) /
      ctrl_updates(rows, scenario): an in-kernel realization of the
          scenario's process_action override for the rows path (give_way's
          PID velocity controller — reference velocity_controller.py:29-124
          runs per step in elementwise state). ``n_ctrl`` controller rows
          ride the rows carry after the scratch rows (packed by
          ``ctrl_rows``); the kernel calls ``process_act_rows`` after the
          action-row override and BEFORE the physics substeps — it mutates
          the ``fx``/``fy`` force rows (decoded u in, actual force out) and
          the ``ctrl`` rows in place. ``ctrl_updates`` maps the final
          carried rows back to scenario scratch. ``ctrl_u_idx`` (optional):
          per-policy-agent (ix, iy) emit-row indices holding the
          post-process u, so the final state's ``u`` matches the hook
          pipeline's (which stores the controller's output, not the
          decoded action).
    """

    n_scratch_in = 0
    n_ctrl = 0
    unpack_reads = ()

    @staticmethod
    def scratch_rows(state):
        """Default: no extra input rows (override with n_scratch_in)."""
        import numpy as np

        return np.zeros((0, state.batch_dim), np.float32)

    @staticmethod
    def finish_obs(obs, state):
        return obs


def _one_hot_select(idx_row, rows):
    """Per-lane select of one row from ``rows`` by the float index row
    ``idx_row`` — ``sum((idx == k) * rows[k])``, bitwise equal to a gather
    (one exact 1.0 term against the exact row value). The canonical way to
    realize a per-env integer index inside the kernel (docs/FUSED_OUTPUTS.md
    rule 7); exact for the small non-negative indices scratch rows carry."""
    return sum(
        (idx_row == float(k)).astype(jnp.float32) * r for k, r in enumerate(rows)
    )


def _make_kernel(world, outputs=None, sublanes=1, rows_mode=False,
                 act_slots=None, k_steps=1):
    """Generate the per-spec kernel: static structure is baked into the
    program as python scalars (one unrolled instruction stream per spec —
    no array constants, which TPU pallas kernels may not capture). Rows are
    (S, BLK/S) sublane-packed lane tiles (see _sublanes; S=1 reproduces the
    round-2 (1, BLK) row form); at small entity counts this beats a matrix
    formulation because it never touches the MXU and Mosaic pipelines the
    pure-VPU stream.

    ``rows_mode`` (the rows-carried rollout, parallel/rollout.py
    rows_rollout_fn): signature becomes kernel(x_ref, s_ref, a_ref, o_ref) —
    state rows, scratch rows and this step's decoded action-force rows
    arrive as separate refs (so the scan carry needs ZERO host-side
    assembly ops between steps), the action rows OVERRIDE the force rows of
    the ``act_slots`` entities (the per-step equivalent of holonomic
    process_action writing state.force), and the output grows K_in
    scratch-carry rows (outputs.carry_extra_idx) between the state rows and
    the emit rows. Joint fixed-rotation rows ride the carry unchanged
    (sync_joints is reset-only). Requires outputs, non-dyn-gravity worlds, and
    runs the non-entity-tiled stream (v1 scope — the bench class)."""
    S = int(sublanes)
    spec = world.spec
    lane_min = _lane_min()
    E = len(spec.mass)
    cm = float(world.contact_margin)
    cf = float(world.collision_force)
    sub_dt = float(world.sub_dt)
    substeps = int(world.substeps)
    gx, gy = float(world.gravity[0]), float(world.gravity[1])

    movable = [bool(m) for m in spec.movable]
    rotatable = [bool(r) for r in spec.rotatable]
    is_agent = [bool(a) for a in spec.is_agent]
    J = len(spec.joint_idx_a)
    joint_force = float(world.joint_force)
    torque_constraint_force = float(world.torque_constraint_force)
    dyn_gravity = bool(getattr(world, "dynamic_gravity", False))

    K_in = int(outputs.n_scratch_in) if outputs is not None else 0

    if rows_mode:
        assert outputs is not None and not dyn_gravity
        assert act_slots, "rows_mode needs the policy agents' entity slots"
        assert k_steps >= 1
        act_slots = [int(e) for e in act_slots]
        ent_tile = False
        n_ctrl = int(getattr(outputs, "n_ctrl", 0))
        n_ctrl_out = int(getattr(outputs, "n_ctrl_out", 0))
        act_hook = getattr(outputs, "process_act_rows", None)
        assert (n_ctrl == 0 and n_ctrl_out == 0) or act_hook is not None
    else:
        assert k_steps == 1, "k_steps>1 is a rows_mode feature"
        ent_tile = E >= 2 and _entity_tile_on(E)
        n_ctrl = n_ctrl_out = 0
        act_hook = None
    inf = float("inf")
    # Static per-entity constants / gates for the tiled stream. Every value
    # is rounded float64 -> float32 exactly once (inside crow), matching the
    # unrolled path's python-float constants; entities a clamp/friction/
    # gravity term does not apply to get the identity element (inf bound,
    # zero term, unit drag factor), which the VPU applies bitwise-neutrally.
    mass_l = [float(m) for m in spec.mass]
    lf_l = [float(v) for v in spec.lin_fric]
    af_l = [float(v) for v in spec.ang_fric]
    drag_l = [float(v) for v in spec.drag]
    has_lf = any(lf_l[e] != 0.0 and movable[e] for e in range(E))
    has_af = any(af_l[e] != 0.0 and rotatable[e] for e in range(E))
    any_drag = any(d != 0.0 for d in drag_l)
    mf_l = [float(spec.max_f[e]) if (is_agent[e] and movable[e]) else inf
            for e in range(E)]
    fr_l = [float(spec.f_range[e]) if (is_agent[e] and movable[e]) else inf
            for e in range(E)]
    mt_l = [float(spec.max_t[e]) if (is_agent[e] and rotatable[e]) else inf
            for e in range(E)]
    tr_l = [float(spec.t_range[e]) if (is_agent[e] and rotatable[e]) else inf
            for e in range(E)]
    ms_l = [float(spec.max_speed[e]) if movable[e] else inf for e in range(E)]
    vr_l = [float(spec.v_range[e]) if movable[e] else inf for e in range(E)]
    has_mf = any(math.isfinite(v) for v in mf_l)
    has_fr = any(math.isfinite(v) for v in fr_l)
    has_mt = any(math.isfinite(v) for v in mt_l)
    has_tr = any(math.isfinite(v) for v in tr_l)
    has_ms = any(math.isfinite(v) for v in ms_l)
    has_vr = any(math.isfinite(v) for v in vr_l)
    egx_l = [gx + float(spec.ent_gravity[e, 0]) for e in range(E)]
    egy_l = [gy + float(spec.ent_gravity[e, 1]) for e in range(E)]
    gsx_l = [mass_l[e] * egx_l[e]
             if movable[e] and (egx_l[e] != 0.0 or egy_l[e] != 0.0) else 0.0
             for e in range(E)]
    gsy_l = [mass_l[e] * egy_l[e]
             if movable[e] and (egx_l[e] != 0.0 or egy_l[e] != 0.0) else 0.0
             for e in range(E)]
    has_static_grav = any(
        gsx_l[e] != 0.0 or gsy_l[e] != 0.0 for e in range(E)
    )
    # entities whose rotation trig the pair/joint code reads; if many, one
    # whole-tile cos/sin pair beats per-row transcendentals
    trig_ents = set()
    for seq in (spec.ls_line, spec.ll_a, spec.ll_b, spec.bs_box,
                spec.bl_box, spec.bl_line, spec.bb_a, spec.bb_b,
                spec.joint_idx_a, spec.joint_idx_b):
        for v in seq:
            trig_ents.add(int(v))
    tile_trig = ent_tile and len(trig_ents) >= 8

    def kernel(*refs):
        if rows_mode:
            x_ref, a_ref, o_ref, e_ref = refs
        else:
            (x_ref, o_ref) = refs
            a_ref = e_ref = None
        # logical row r lives at physical rows [r*S, (r+1)*S): S sublane-
        # packed segments of the env axis (see _sublanes). All math below is
        # elementwise per (sublane, lane) position, so the logical-row code
        # is untouched by S.
        row = lambda r: x_ref[r * S : (r + 1) * S, :]
        tmpl = x_ref[0:S, :]
        stack = lambda rows: jnp.concatenate(rows, axis=0)  # [(S,BLK)] -> [P*S,BLK]
        crow = lambda vals: stack([jnp.full_like(tmpl, float(v)) for v in vals])

        if ent_tile:
            PX = x_ref[0 : E * S, :]
            PY = x_ref[E * S : 2 * E * S, :]
            VX = x_ref[2 * E * S : 3 * E * S, :]
            VY = x_ref[3 * E * S : 4 * E * S, :]
            ROT = x_ref[4 * E * S : 5 * E * S, :]
            W = x_ref[5 * E * S : 6 * E * S, :]
            FX = x_ref[6 * E * S : 7 * E * S, :]
            FY = x_ref[7 * E * S : 8 * E * S, :]
            TQ = x_ref[8 * E * S : 9 * E * S, :]
            mvT = crow([1.0 if m else 0.0 for m in movable]) > 0.5
            roT = crow([1.0 if r else 0.0 for r in rotatable]) > 0.5
            inv_mT = crow(spec.inv_mass)
            inv_moiT = crow(spec.inv_moi)
            if any_drag:
                dragfacT = crow([1.0 - d for d in drag_l])
            if has_mf:
                mfT = crow(mf_l)
            if has_fr:
                frT = crow(fr_l)
            if has_mt:
                mtT = crow(mt_l)
            if has_tr:
                trT = crow(tr_l)
            if has_ms:
                msT = crow(ms_l)
            if has_vr:
                vrT = crow(vr_l)
            if has_lf:
                mT = crow(mass_l)
                lfmT = crow([lf_l[e] * mass_l[e] for e in range(E)])
                lf_onT = crow([1.0 if (lf_l[e] != 0.0 and movable[e]) else 0.0
                               for e in range(E)]) > 0.5
            if has_af:
                moiT = crow(spec.moi)
                afmT = crow([af_l[e] * float(spec.moi[e]) for e in range(E)])
                af_onT = crow([1.0 if (af_l[e] != 0.0 and rotatable[e]) else 0.0
                               for e in range(E)]) > 0.5
            if dyn_gravity:
                gmT = crow(mass_l)
                egxT = crow(egx_l)
                egyT = crow(egy_l)
                DGX = x_ref[(9 * E + J) * S : (9 * E + J + E) * S, :]
                DGY = x_ref[(9 * E + J + E) * S : (9 * E + J + 2 * E) * S, :]
            elif has_static_grav:
                gsxT = crow(gsx_l)
                gsyT = crow(gsy_l)
        else:
            px = [row(e) for e in range(E)]
            py = [row(E + e) for e in range(E)]
            vx = [row(2 * E + e) for e in range(E)]
            vy = [row(3 * E + e) for e in range(E)]
            rot = [row(4 * E + e) for e in range(E)]
            w = [row(5 * E + e) for e in range(E)]
            fx = [row(6 * E + e) for e in range(E)]
            fy = [row(7 * E + e) for e in range(E)]
            tq = [row(8 * E + e) for e in range(E)]
            if dyn_gravity:
                dgx = [row(9 * E + J + e) for e in range(E)]
                dgy = [row(9 * E + J + E + e) for e in range(E)]
        # per-pair-type constant tiles, hoisted out of the substep AND k_steps
        # loops (they depend only on spec, not on the step index)
        if len(spec.ss_a) >= lane_min:
            ss_dmin = crow(np.asarray(spec.ss_ra) + np.asarray(spec.ss_rb))
        if len(spec.ls_line) >= lane_min:
            ls_half = crow(np.asarray(spec.ls_len) / 2)
            ls_dmin = crow(np.asarray(spec.ls_rad) + LINE_MIN_DIST)
        if len(spec.ll_a) >= lane_min:
            ll_ha = crow(np.asarray(spec.ll_la) / 2)
            ll_hb = crow(np.asarray(spec.ll_lb) / 2)
        if len(spec.bs_box) >= lane_min:
            bs_hw = crow(np.asarray(spec.bs_wid) / 2)
            bs_hl = crow(np.asarray(spec.bs_len) / 2)
            # round the float64 sum once, exactly like the unrolled path's
            # float(spec.bs_rad[k]) + LINE_MIN_DIST python constant
            bs_dmin0 = crow(np.asarray(spec.bs_rad) + LINE_MIN_DIST)
            bs_nh = crow(np.asarray(spec.bs_not_hollow, np.float32))
        if len(spec.bl_box) >= lane_min:
            bl_hw = crow(np.asarray(spec.bl_bwid) / 2)
            bl_hl = crow(np.asarray(spec.bl_blen) / 2)
            bl_lh = crow(np.asarray(spec.bl_llen) / 2)
            bl_nh = crow(np.asarray(spec.bl_not_hollow, np.float32))
        if len(spec.bb_a) >= lane_min:
            bb_hwa = crow(np.asarray(spec.bb_wa) / 2)
            bb_hla = crow(np.asarray(spec.bb_la) / 2)
            bb_hwb = crow(np.asarray(spec.bb_wb) / 2)
            bb_hlb = crow(np.asarray(spec.bb_lb) / 2)
            bb_nha = crow(np.asarray(spec.bb_nha, np.float32))
            bb_nhb = crow(np.asarray(spec.bb_nhb, np.float32))

        for _k in range(k_steps):
            if rows_mode:
                # step _k's decoded action forces override the carried (or
                # previous step's) force rows for the policy agents (holonomic
                # process_action: force=u); a_ref holds k_steps blocks of
                # [u_x rows, u_y rows]
                A_n = len(act_slots)
                _ab = _k * 2 * A_n
                for i, e in enumerate(act_slots):
                    fx[e] = a_ref[(_ab + i) * S : (_ab + i + 1) * S, :]
                    fy[e] = a_ref[(_ab + A_n + i) * S : (_ab + A_n + i + 1) * S, :]
                if _k == 0:
                    # joint fixed rotations are reset-only state (sync_joints
                    # runs only in env_reset_world_at) — they ride the carry
                    # unchanged, between the state rows and the scratch rows
                    jfr = [row(9 * E + j) for j in range(J)]
                    # scratch rows sit after the state + jfr rows, at the same
                    # offsets the kernel WRITES them to — the scan carry is
                    # the kernel output verbatim; later steps rebind
                    # scratch_in from their emit rows below
                    scratch_in = [row(9 * E + J + k) for k in range(K_in)]
                    # controller carry rows (in-kernel process_action state,
                    # e.g. the PID integrator) sit after the scratch rows;
                    # process_act_rows mutates this list in place per step
                    ctrl = [
                        row(9 * E + J + K_in + k) for k in range(n_ctrl)
                    ]
                if act_hook is not None:
                    # the scenario's process_action realized in-kernel:
                    # transforms the decoded-u force rows into the actual
                    # forces (e.g. PID velocity control) and advances the
                    # controller rows — BEFORE the substep loop, exactly
                    # where the XLA path runs scenario.process_action.
                    # Optionally returns n_ctrl_out rows (e.g. the
                    # controller's raw output u) appended after this step's
                    # emit rows.
                    hook_rows = act_hook({
                        "fx": fx, "fy": fy, "vx": vx, "vy": vy,
                        "px": px, "py": py, "rot": rot, "w": w,
                        "ctrl": ctrl,
                    }) or []
                    assert len(hook_rows) == n_ctrl_out, (
                        f"process_act_rows returned {len(hook_rows)} rows, "
                        f"n_ctrl_out={n_ctrl_out}"
                    )
                else:
                    hook_rows = []
            else:
                jfr = [row(9 * E + j) for j in range(J)]
                n_dyn = 2 * E if dyn_gravity else 0
                scratch_in = [row(9 * E + J + n_dyn + k) for k in range(K_in)]

            def clamp_actions_rows():
                """Action clamps persisting on state.force/torque
                (physics.py:229-248). The XLA path runs this at the start of
                EVERY substep on the persistent rows, and clamp_with_norm is not
                exactly idempotent in f32 (a rescaled norm can round just above
                max_f), so the fused path must re-clamp per substep too; the
                divide-then-multiply order matches clamp_with_norm's
                ``tensor / norm * max_norm`` rounding."""
                for e in range(E):
                    if is_agent[e] and movable[e]:
                        mf = float(spec.max_f[e])
                        if math.isfinite(mf):
                            n = jnp.sqrt(fx[e] * fx[e] + fy[e] * fy[e])
                            over = n > mf
                            den = jnp.where(over, n, 1.0)
                            fx[e] = jnp.where(over, fx[e] / den * mf, fx[e])
                            fy[e] = jnp.where(over, fy[e] / den * mf, fy[e])
                        fr = float(spec.f_range[e])
                        if math.isfinite(fr):
                            fx[e] = jnp.clip(fx[e], -fr, fr)
                            fy[e] = jnp.clip(fy[e], -fr, fr)
                    if is_agent[e] and rotatable[e]:
                        mt = float(spec.max_t[e])
                        if math.isfinite(mt):
                            tq[e] = jnp.clip(tq[e], -mt, mt)
                        tr = float(spec.t_range[e])
                        if math.isfinite(tr):
                            tq[e] = jnp.clip(tq[e], -tr, tr)

            for substep in range(substeps):
                if ent_tile:
                    # clamp (tile form): entities a clamp does not apply to carry
                    # an inf bound, making over=False / clip an exact identity —
                    # same per-lane values as the unrolled per-entity branches
                    if has_mf:
                        n = jnp.sqrt(FX * FX + FY * FY)
                        over = n > mfT
                        den = jnp.where(over, n, 1.0)
                        FX = jnp.where(over, FX / den * mfT, FX)
                        FY = jnp.where(over, FY / den * mfT, FY)
                    if has_fr:
                        FX = jnp.clip(FX, -frT, frT)
                        FY = jnp.clip(FY, -frT, frT)
                    if has_mt:
                        TQ = jnp.clip(TQ, -mtT, mtT)
                    if has_tr:
                        TQ = jnp.clip(TQ, -trT, trT)
                    px = _Rows(PX, S)
                    py = _Rows(PY, S)
                    rot = _Rows(ROT, S)
                else:
                    clamp_actions_rows()
                Fx = [None] * E
                Fy = [None] * E
                Tq = [None] * E
                trig = {}

                if tile_trig:
                    COSr = _Rows(jnp.cos(ROT), S)
                    SINr = _Rows(jnp.sin(ROT), S)

                    def cs(e):
                        return COSr[e], SINr[e]
                else:
                    def cs(e):
                        """cos/sin of entity e's rotation, once per substep."""
                        if e not in trig:
                            trig[e] = (jnp.cos(rot[e]), jnp.sin(rot[e]))
                        return trig[e]

                if ent_tile:
                    # base force/torque tiles: action + friction + gravity, the
                    # exact per-entity accumulation order of the unrolled path
                    # (terms that don't apply contribute an exact 0.0)
                    BFX, BFY, BTQ = FX, FY, TQ
                    if has_lf:
                        speed = _norm(VX, VY)
                        den = jnp.where(speed == 0.0, 1.0, speed)
                        fcx = jnp.minimum(lfmT, jnp.abs(VX) / sub_dt * mT)
                        fcy = jnp.minimum(lfmT, jnp.abs(VY) / sub_dt * mT)
                        drop = (speed == 0.0) | ~lf_onT
                        BFX = BFX + jnp.where(drop, 0.0, -(VX / den) * fcx)
                        BFY = BFY + jnp.where(drop, 0.0, -(VY / den) * fcy)
                    if has_af:
                        sp = jnp.abs(W)
                        den = jnp.where(sp == 0.0, 1.0, sp)
                        fc = jnp.minimum(afmT, sp / sub_dt * moiT)
                        BTQ = BTQ + jnp.where(
                            (sp == 0.0) | ~af_onT, 0.0, -(W / den) * fc
                        )
                    if dyn_gravity:
                        BFX = BFX + gmT * (DGX + egxT)
                        BFY = BFY + gmT * (DGY + egyT)
                    elif has_static_grav:
                        BFX = BFX + gsxT
                        BFY = BFY + gsyT

                    def addf(e, ax, ay):
                        if not movable[e]:
                            return
                        if Fx[e] is None:
                            Fx[e] = BFX[e * S : (e + 1) * S, :]
                            Fy[e] = BFY[e * S : (e + 1) * S, :]
                        Fx[e] = Fx[e] + ax
                        Fy[e] = Fy[e] + ay

                    def addt(e, t):
                        if not rotatable[e]:
                            return
                        if Tq[e] is None:
                            Tq[e] = BTQ[e * S : (e + 1) * S, :]
                        Tq[e] = Tq[e] + t
                else:
                    def addf(e, ax, ay):
                        if not movable[e]:
                            return
                        Fx[e] = ax if Fx[e] is None else Fx[e] + ax
                        Fy[e] = ay if Fy[e] is None else Fy[e] + ay

                    def addt(e, t):
                        if not rotatable[e]:
                            return
                        Tq[e] = t if Tq[e] is None else Tq[e] + t

                    # action forces
                    for e in range(E):
                        addf(e, fx[e], fy[e])
                        addt(e, tq[e])

                    # coulomb friction (physics.py:255-263)
                    for e in range(E):
                        lf = float(spec.lin_fric[e])
                        m = float(spec.mass[e])
                        if lf != 0.0 and movable[e]:
                            speed = _norm(vx[e], vy[e])
                            den = jnp.where(speed == 0.0, 1.0, speed)
                            fcx = jnp.minimum(lf * m, jnp.abs(vx[e]) / sub_dt * m)
                            fcy = jnp.minimum(lf * m, jnp.abs(vy[e]) / sub_dt * m)
                            zero = speed == 0.0
                            addf(e, jnp.where(zero, 0.0, -(vx[e] / den) * fcx),
                                 jnp.where(zero, 0.0, -(vy[e] / den) * fcy))
                        af = float(spec.ang_fric[e])
                        if af != 0.0 and rotatable[e]:
                            moi = float(spec.moi[e])
                            sp = jnp.abs(w[e])
                            den = jnp.where(sp == 0.0, 1.0, sp)
                            fc = jnp.minimum(af * moi, sp / sub_dt * moi)
                            addt(e, jnp.where(sp == 0.0, 0.0, -(w[e] / den) * fc))

                    # gravity (world + per-entity static + per-env dynamic)
                    for e in range(E):
                        if not movable[e]:
                            continue
                        egx = gx + float(spec.ent_gravity[e, 0])
                        egy = gy + float(spec.ent_gravity[e, 1])
                        m = float(spec.mass[e])
                        if dyn_gravity:
                            addf(e, m * (dgx[e] + egx), m * (dgy[e] + egy))
                        elif egx != 0.0 or egy != 0.0:
                            addf(e, jnp.full_like(px[e], m * egx), jnp.full_like(px[e], m * egy))

                # joint constraints (physics.py:266-300)
                for j in range(J):
                    a, b = int(spec.joint_idx_a[j]), int(spec.joint_idx_b[j])
                    aax, aay = float(spec.joint_anchor_a[j, 0]), float(spec.joint_anchor_a[j, 1])
                    abx, aby = float(spec.joint_anchor_b[j, 0]), float(spec.joint_anchor_b[j, 1])
                    dist = float(spec.joint_dist[j])
                    ca, sa = cs(a)
                    cb, sb = cs(b)
                    pjax = px[a] + aax * ca - aay * sa
                    pjay = py[a] + aax * sa + aay * ca
                    pjbx = px[b] + abx * cb - aby * sb
                    pjby = py[b] + abx * sb + aby * cb
                    fax_att, fay_att = _constraint_force(
                        cm, pjax, pjay, pjbx, pjby, dist, joint_force, attractive=True
                    )
                    fax_rep, fay_rep = _constraint_force(
                        cm, pjax, pjay, pjbx, pjby, dist, joint_force, attractive=False
                    )
                    fax, fay = fax_att + fax_rep, fay_att + fay_rep
                    ta_rot = (pjax - px[a]) * fay - (pjay - py[a]) * fax
                    tb_rot = (pjbx - px[b]) * (-fay) - (pjby - py[b]) * (-fax)
                    if bool(spec.joint_rotate[j]):
                        ta, tb = ta_rot, tb_rot
                    else:
                        # constraint_torques on (rot_a, rot_b + fixed_rot)
                        delta = rot[a] - (rot[b] + jfr[j])
                        pen = jnp.exp(jnp.abs(delta)) - 1.0
                        tqc = torque_constraint_force * jnp.sign(delta) * pen
                        tqc = jnp.where(jnp.abs(delta) < 1e-9, 0.0, tqc)
                        ta, tb = ta_rot + (-tqc), tb_rot + tqc
                    addf(a, fax, fay)
                    addt(a, ta)
                    addf(b, -fax, -fay)
                    addt(b, tb)

                def scatter2(pairs, fx_p, fy_p):
                    """Slice-add a [P, BLK] pair force onto its two entities
                    (+ on a, - on b), in pair order — the same accumulation
                    order as the unrolled path."""
                    for k, (a, b) in enumerate(pairs):
                        addf(a, fx_p[k * S : (k + 1) * S], fy_p[k * S : (k + 1) * S])
                        addf(b, -fx_p[k * S : (k + 1) * S], -fy_p[k * S : (k + 1) * S])

                # sphere-sphere
                ss_pairs = [(int(a), int(b)) for a, b in zip(spec.ss_a, spec.ss_b)]
                if len(ss_pairs) >= lane_min:
                    ax = stack([px[a] for a, _ in ss_pairs])
                    ay = stack([py[a] for a, _ in ss_pairs])
                    bx = stack([px[b] for _, b in ss_pairs])
                    by = stack([py[b] for _, b in ss_pairs])
                    cfx, cfy = _constraint_force(cm, ax, ay, bx, by, ss_dmin, cf)
                    scatter2(ss_pairs, cfx, cfy)
                else:
                    for k, (a, b) in enumerate(ss_pairs):
                        dmin = float(spec.ss_ra[k] + spec.ss_rb[k])
                        cfx, cfy = _constraint_force(cm, px[a], py[a], px[b], py[b], dmin, cf)
                        addf(a, cfx, cfy)
                        addf(b, -cfx, -cfy)

                # line-sphere
                ls_pairs = [(int(l), int(s)) for l, s in zip(spec.ls_line, spec.ls_sphere)]
                if len(ls_pairs) >= lane_min:
                    lx = stack([px[l] for l, _ in ls_pairs])
                    ly = stack([py[l] for l, _ in ls_pairs])
                    sx = stack([px[s] for _, s in ls_pairs])
                    sy = stack([py[s] for _, s in ls_pairs])
                    lcs = stack([cs(l)[0] for l, _ in ls_pairs])
                    lsn = stack([cs(l)[1] for l, _ in ls_pairs])
                    cx, cy = _closest_point_line(lx, ly, lcs, lsn, ls_half, sx, sy)
                    sfx, sfy = _constraint_force(cm, sx, sy, cx, cy, ls_dmin, cf)
                    tql = (cx - lx) * (-sfy) - (cy - ly) * (-sfx)
                    for k, (l, s) in enumerate(ls_pairs):
                        addf(s, sfx[k * S : (k + 1) * S], sfy[k * S : (k + 1) * S])
                        addf(l, -sfx[k * S : (k + 1) * S], -sfy[k * S : (k + 1) * S])
                        addt(l, tql[k * S : (k + 1) * S])
                else:
                    for k, (l, s) in enumerate(ls_pairs):
                        half = float(spec.ls_len[k]) / 2
                        cos, sin = cs(l)
                        cx, cy = _closest_point_line(px[l], py[l], cos, sin, half, px[s], py[s])
                        dmin = float(spec.ls_rad[k] + LINE_MIN_DIST)
                        sfx, sfy = _constraint_force(cm, px[s], py[s], cx, cy, dmin, cf)
                        addf(s, sfx, sfy)
                        addf(l, -sfx, -sfy)
                        addt(l, (cx - px[l]) * (-sfy) - (cy - py[l]) * (-sfx))

                # line-line
                ll_pairs = [(int(a), int(b)) for a, b in zip(spec.ll_a, spec.ll_b)]
                if len(ll_pairs) >= lane_min:
                    ax = stack([px[a] for a, _ in ll_pairs])
                    ay = stack([py[a] for a, _ in ll_pairs])
                    bx = stack([px[b] for _, b in ll_pairs])
                    by = stack([py[b] for _, b in ll_pairs])
                    ca = stack([cs(a)[0] for a, _ in ll_pairs])
                    sa = stack([cs(a)[1] for a, _ in ll_pairs])
                    cb = stack([cs(b)[0] for _, b in ll_pairs])
                    sb = stack([cs(b)[1] for _, b in ll_pairs])
                    pax, pay, pbx, pby = _closest_points_line_line(
                        ax, ay, ca, sa, ll_ha, bx, by, cb, sb, ll_hb
                    )
                    afx, afy = _constraint_force(cm, pax, pay, pbx, pby, LINE_MIN_DIST, cf)
                    tqa = (pax - ax) * afy - (pay - ay) * afx
                    tqb = (pbx - bx) * (-afy) - (pby - by) * (-afx)
                    for k, (a, b) in enumerate(ll_pairs):
                        addf(a, afx[k * S : (k + 1) * S], afy[k * S : (k + 1) * S])
                        addt(a, tqa[k * S : (k + 1) * S])
                        addf(b, -afx[k * S : (k + 1) * S], -afy[k * S : (k + 1) * S])
                        addt(b, tqb[k * S : (k + 1) * S])
                else:
                    for k, (a, b) in enumerate(ll_pairs):
                        ha, hb = float(spec.ll_la[k]) / 2, float(spec.ll_lb[k]) / 2
                        ca, sa = cs(a)
                        cb, sb = cs(b)
                        pax, pay, pbx, pby = _closest_points_line_line(
                            px[a], py[a], ca, sa, ha, px[b], py[b], cb, sb, hb
                        )
                        afx, afy = _constraint_force(cm, pax, pay, pbx, pby, LINE_MIN_DIST, cf)
                        addf(a, afx, afy)
                        addt(a, (pax - px[a]) * afy - (pay - py[a]) * afx)
                        addf(b, -afx, -afy)
                        addt(b, (pbx - px[b]) * (-afy) - (pby - py[b]) * (-afx))

                # box-sphere
                bs_pairs = [(int(b), int(s)) for b, s in zip(spec.bs_box, spec.bs_sphere)]
                if len(bs_pairs) >= lane_min:
                    bx = stack([px[b] for b, _ in bs_pairs])
                    by = stack([py[b] for b, _ in bs_pairs])
                    sx = stack([px[s] for _, s in bs_pairs])
                    sy = stack([py[s] for _, s in bs_pairs])
                    bcs = stack([cs(b)[0] for b, _ in bs_pairs])
                    bsn = stack([cs(b)[1] for b, _ in bs_pairs])
                    cx, cy = _closest_point_box(bx, by, bcs, bsn, bs_hw, bs_hl, sx, sy)
                    ihx, ihy, dh = _inner_point_box(sx, sy, cx, cy, bx, by)
                    nh = bs_nh > 0.5
                    ix = jnp.where(nh, ihx, cx)
                    iy = jnp.where(nh, ihy, cy)
                    d = jnp.where(nh, dh, 0.0)
                    dmin = bs_dmin0 + d
                    sfx, sfy = _constraint_force(cm, sx, sy, ix, iy, dmin, cf)
                    tqb = (cx - bx) * (-sfy) - (cy - by) * (-sfx)
                    for k, (b, s) in enumerate(bs_pairs):
                        addf(s, sfx[k * S : (k + 1) * S], sfy[k * S : (k + 1) * S])
                        addf(b, -sfx[k * S : (k + 1) * S], -sfy[k * S : (k + 1) * S])
                        addt(b, tqb[k * S : (k + 1) * S])
                else:
                    for k, (b, s) in enumerate(bs_pairs):
                        cos, sin = cs(b)
                        hw, hl = float(spec.bs_wid[k]) / 2, float(spec.bs_len[k]) / 2
                        cx, cy = _closest_point_box(px[b], py[b], cos, sin, hw, hl, px[s], py[s])
                        if bool(spec.bs_not_hollow[k]):
                            ix, iy, d = _inner_point_box(px[s], py[s], cx, cy, px[b], py[b])
                        else:
                            ix, iy, d = cx, cy, 0.0
                        dmin = float(spec.bs_rad[k]) + LINE_MIN_DIST + d
                        sfx, sfy = _constraint_force(cm, px[s], py[s], ix, iy, dmin, cf)
                        addf(s, sfx, sfy)
                        addf(b, -sfx, -sfy)
                        addt(b, (cx - px[b]) * (-sfy) - (cy - py[b]) * (-sfx))

                # box-line
                bl_pairs = [(int(b), int(l)) for b, l in zip(spec.bl_box, spec.bl_line)]
                if len(bl_pairs) >= lane_min:
                    bx = stack([px[b] for b, _ in bl_pairs])
                    by = stack([py[b] for b, _ in bl_pairs])
                    lx = stack([px[l] for _, l in bl_pairs])
                    ly = stack([py[l] for _, l in bl_pairs])
                    bcs = stack([cs(b)[0] for b, _ in bl_pairs])
                    bsn = stack([cs(b)[1] for b, _ in bl_pairs])
                    lcs = stack([cs(l)[0] for _, l in bl_pairs])
                    lsn = stack([cs(l)[1] for _, l in bl_pairs])
                    qbx, qby, qlx, qly = _closest_line_box(
                        bx, by, bcs, bsn, bl_hw, bl_hl, lx, ly, lcs, lsn, bl_lh
                    )
                    ihx, ihy, dh = _inner_point_box(qlx, qly, qbx, qby, bx, by)
                    nh = bl_nh > 0.5
                    ix = jnp.where(nh, ihx, qbx)
                    iy = jnp.where(nh, ihy, qby)
                    d = jnp.where(nh, dh, 0.0)
                    bfx, bfy = _constraint_force(cm, ix, iy, qlx, qly, LINE_MIN_DIST + d, cf)
                    tqb = (qbx - bx) * bfy - (qby - by) * bfx
                    tql = (qlx - lx) * (-bfy) - (qly - ly) * (-bfx)
                    for k, (b, l) in enumerate(bl_pairs):
                        addf(b, bfx[k * S : (k + 1) * S], bfy[k * S : (k + 1) * S])
                        addt(b, tqb[k * S : (k + 1) * S])
                        addf(l, -bfx[k * S : (k + 1) * S], -bfy[k * S : (k + 1) * S])
                        addt(l, tql[k * S : (k + 1) * S])
                else:
                    for k, (b, l) in enumerate(bl_pairs):
                        cos, sin = cs(b)
                        lcos, lsin = cs(l)
                        hw, hl = float(spec.bl_bwid[k]) / 2, float(spec.bl_blen[k]) / 2
                        lhalf = float(spec.bl_llen[k]) / 2
                        qbx, qby, qlx, qly = _closest_line_box(
                            px[b], py[b], cos, sin, hw, hl, px[l], py[l], lcos, lsin, lhalf
                        )
                        if bool(spec.bl_not_hollow[k]):
                            ix, iy, d = _inner_point_box(qlx, qly, qbx, qby, px[b], py[b])
                        else:
                            ix, iy, d = qbx, qby, 0.0
                        bfx, bfy = _constraint_force(cm, ix, iy, qlx, qly, LINE_MIN_DIST + d, cf)
                        addf(b, bfx, bfy)
                        addt(b, (qbx - px[b]) * bfy - (qby - py[b]) * bfx)
                        addf(l, -bfx, -bfy)
                        addt(l, (qlx - px[l]) * (-bfy) - (qly - py[l]) * (-bfx))

                # box-box
                bb_pairs = [(int(a), int(b)) for a, b in zip(spec.bb_a, spec.bb_b)]

                def _bb_closest(ax_, ay_, ca, sa, hwa, hla, bx_, by_, cb, sb, hwb, hlb):
                    # candidate order mirrors geometry.closest_box_box: a's edges
                    # vs b's perimeter first, then b's edges vs a's perimeter;
                    # tuples are (point_on_a, point_on_b), first minimum wins
                    cands = []
                    for ex, ey, ecos, esin, ehalf in _box_edges(ax_, ay_, ca, sa, hwa, hla):
                        onb_x, onb_y, ona_x, ona_y = _closest_line_box(
                            bx_, by_, cb, sb, hwb, hlb, ex, ey, ecos, esin, ehalf
                        )
                        cands.append((ona_x, ona_y, onb_x, onb_y))
                    for ex, ey, ecos, esin, ehalf in _box_edges(bx_, by_, cb, sb, hwb, hlb):
                        ona_x, ona_y, onb_x, onb_y = _closest_line_box(
                            ax_, ay_, ca, sa, hwa, hla, ex, ey, ecos, esin, ehalf
                        )
                        cands.append((ona_x, ona_y, onb_x, onb_y))
                    return _pick_closest(cands)

                if len(bb_pairs) >= lane_min:
                    ax = stack([px[a] for a, _ in bb_pairs])
                    ay = stack([py[a] for a, _ in bb_pairs])
                    bx = stack([px[b] for _, b in bb_pairs])
                    by = stack([py[b] for _, b in bb_pairs])
                    ca = stack([cs(a)[0] for a, _ in bb_pairs])
                    sa = stack([cs(a)[1] for a, _ in bb_pairs])
                    cb = stack([cs(b)[0] for _, b in bb_pairs])
                    sb = stack([cs(b)[1] for _, b in bb_pairs])
                    qax, qay, qbx, qby = _bb_closest(
                        ax, ay, ca, sa, bb_hwa, bb_hla, bx, by, cb, sb, bb_hwb, bb_hlb
                    )
                    iahx, iahy, dah = _inner_point_box(qbx, qby, qax, qay, ax, ay)
                    nha = bb_nha > 0.5
                    iax = jnp.where(nha, iahx, qax)
                    iay = jnp.where(nha, iahy, qay)
                    da = jnp.where(nha, dah, 0.0)
                    ibhx, ibhy, dbh = _inner_point_box(qax, qay, qbx, qby, bx, by)
                    nhb = bb_nhb > 0.5
                    ibx = jnp.where(nhb, ibhx, qbx)
                    iby = jnp.where(nhb, ibhy, qby)
                    db = jnp.where(nhb, dbh, 0.0)
                    afx, afy = _constraint_force(
                        cm, iax, iay, ibx, iby, da + db + LINE_MIN_DIST, cf
                    )
                    tqa = (qax - ax) * afy - (qay - ay) * afx
                    tqb = (qbx - bx) * (-afy) - (qby - by) * (-afx)
                    for k, (a, b) in enumerate(bb_pairs):
                        addf(a, afx[k * S : (k + 1) * S], afy[k * S : (k + 1) * S])
                        addt(a, tqa[k * S : (k + 1) * S])
                        addf(b, -afx[k * S : (k + 1) * S], -afy[k * S : (k + 1) * S])
                        addt(b, tqb[k * S : (k + 1) * S])
                else:
                    for k, (a, b) in enumerate(bb_pairs):
                        ca, sa = cs(a)
                        cb, sb = cs(b)
                        hwa, hla = float(spec.bb_wa[k]) / 2, float(spec.bb_la[k]) / 2
                        hwb, hlb = float(spec.bb_wb[k]) / 2, float(spec.bb_lb[k]) / 2
                        qax, qay, qbx, qby = _bb_closest(
                            px[a], py[a], ca, sa, hwa, hla, px[b], py[b], cb, sb, hwb, hlb
                        )
                        if bool(spec.bb_nha[k]):
                            iax, iay, da = _inner_point_box(qbx, qby, qax, qay, px[a], py[a])
                        else:
                            iax, iay, da = qax, qay, 0.0
                        if bool(spec.bb_nhb[k]):
                            ibx, iby, db = _inner_point_box(qax, qay, qbx, qby, px[b], py[b])
                        else:
                            ibx, iby, db = qbx, qby, 0.0
                        afx, afy = _constraint_force(cm, iax, iay, ibx, iby, da + db + LINE_MIN_DIST, cf)
                        addf(a, afx, afy)
                        addt(a, (qax - px[a]) * afy - (qay - py[a]) * afx)
                        addf(b, -afx, -afy)
                        addt(b, (qbx - px[b]) * (-afy) - (qby - py[b]) * (-afx))

                # integrate (physics.py:413-441)
                if ent_tile:
                    FTx = _assemble(Fx, BFX, S)
                    FTy = _assemble(Fy, BFY, S)
                    TT = _assemble(Tq, BTQ, S)
                    VXn, VYn = VX, VY
                    if any_drag and substep == 0:
                        VXn = VXn * dragfacT
                        VYn = VYn * dragfacT
                    VXn = VXn + FTx * inv_mT * sub_dt
                    VYn = VYn + FTy * inv_mT * sub_dt
                    if has_ms:
                        n = jnp.sqrt(VXn * VXn + VYn * VYn)
                        over = n > msT
                        s = jnp.where(over, msT / jnp.where(over, n, 1.0), 1.0)
                        VXn = VXn * s
                        VYn = VYn * s
                    if has_vr:
                        VXn = jnp.clip(VXn, -vrT, vrT)
                        VYn = jnp.clip(VYn, -vrT, vrT)
                    PXn = PX + VXn * sub_dt
                    PYn = PY + VYn * sub_dt
                    if world.x_semidim is not None:
                        PXn = jnp.clip(PXn, -world.x_semidim, world.x_semidim)
                    if world.y_semidim is not None:
                        PYn = jnp.clip(PYn, -world.y_semidim, world.y_semidim)
                    PX = jnp.where(mvT, PXn, PX)
                    PY = jnp.where(mvT, PYn, PY)
                    VX = jnp.where(mvT, VXn, VX)
                    VY = jnp.where(mvT, VYn, VY)
                    Wn = W
                    if any_drag and substep == 0:
                        Wn = Wn * dragfacT
                    Wn = Wn + TT * inv_moiT * sub_dt
                    ROTn = ROT + Wn * sub_dt
                    W = jnp.where(roT, Wn, W)
                    ROT = jnp.where(roT, ROTn, ROT)
                else:
                    for e in range(E):
                        if movable[e]:
                            drag = float(spec.drag[e])
                            if substep == 0 and drag != 0.0:
                                vx[e] = vx[e] * (1 - drag)
                                vy[e] = vy[e] * (1 - drag)
                            inv_m = float(spec.inv_mass[e])
                            fex = Fx[e] if Fx[e] is not None else 0.0
                            fey = Fy[e] if Fy[e] is not None else 0.0
                            vx[e] = vx[e] + fex * inv_m * sub_dt
                            vy[e] = vy[e] + fey * inv_m * sub_dt
                            ms = float(spec.max_speed[e])
                            if math.isfinite(ms):
                                n = jnp.sqrt(vx[e] * vx[e] + vy[e] * vy[e])
                                over = n > ms
                                s = jnp.where(over, ms / jnp.where(over, n, 1.0), 1.0)
                                vx[e] = vx[e] * s
                                vy[e] = vy[e] * s
                            vr = float(spec.v_range[e])
                            if math.isfinite(vr):
                                vx[e] = jnp.clip(vx[e], -vr, vr)
                                vy[e] = jnp.clip(vy[e], -vr, vr)
                            px[e] = px[e] + vx[e] * sub_dt
                            py[e] = py[e] + vy[e] * sub_dt
                            if world.x_semidim is not None:
                                px[e] = jnp.clip(px[e], -world.x_semidim, world.x_semidim)
                            if world.y_semidim is not None:
                                py[e] = jnp.clip(py[e], -world.y_semidim, world.y_semidim)
                        if rotatable[e]:
                            drag = float(spec.drag[e])
                            if substep == 0 and drag != 0.0:
                                w[e] = w[e] * (1 - drag)
                            te = Tq[e] if Tq[e] is not None else 0.0
                            w[e] = w[e] + te * float(spec.inv_moi[e]) * sub_dt
                            rot[e] = rot[e] + w[e] * sub_dt

            _last = _k == k_steps - 1
            if ent_tile and _last:
                o_ref[0 : E * S, :] = PX
                o_ref[E * S : 2 * E * S, :] = PY
                o_ref[2 * E * S : 3 * E * S, :] = VX
                o_ref[3 * E * S : 4 * E * S, :] = VY
                o_ref[4 * E * S : 5 * E * S, :] = ROT
                o_ref[5 * E * S : 6 * E * S, :] = W
                o_ref[6 * E * S : 7 * E * S, :] = FX
                o_ref[7 * E * S : 8 * E * S, :] = FY
                o_ref[8 * E * S : 9 * E * S, :] = TQ
            elif _last:
                for e in range(E):
                    o_ref[e * S : (e + 1) * S, :] = px[e]
                    o_ref[(E + e) * S : (E + e + 1) * S, :] = py[e]
                    o_ref[(2 * E + e) * S : (2 * E + e + 1) * S, :] = vx[e]
                    o_ref[(3 * E + e) * S : (3 * E + e + 1) * S, :] = vy[e]
                    o_ref[(4 * E + e) * S : (4 * E + e + 1) * S, :] = rot[e]
                    o_ref[(5 * E + e) * S : (5 * E + e + 1) * S, :] = w[e]
                    o_ref[(6 * E + e) * S : (6 * E + e + 1) * S, :] = fx[e]
                    o_ref[(7 * E + e) * S : (7 * E + e + 1) * S, :] = fy[e]
                    o_ref[(8 * E + e) * S : (8 * E + e + 1) * S, :] = tq[e]

            if outputs is not None:
                if ent_tile:
                    ctx = {"px": _Rows(PX, S), "py": _Rows(PY, S),
                           "vx": _Rows(VX, S), "vy": _Rows(VY, S),
                           "rot": _Rows(ROT, S), "w": _Rows(W, S),
                           "fx": _Rows(FX, S), "fy": _Rows(FY, S),
                           "scratch": scratch_in}
                else:
                    ctx = {"px": px, "py": py, "vx": vx, "vy": vy, "rot": rot,
                           "w": w, "fx": fx, "fy": fy, "scratch": scratch_in}
                extra = outputs.emit(ctx)
                assert len(extra) == int(outputs.n_out), (
                    f"emit produced {len(extra)} rows, n_out={outputs.n_out}"
                )
                if rows_mode:
                    # joint fixed rotations pass through the carry unchanged
                    if _last:
                        for j in range(J):
                            o_ref[(9 * E + j) * S : (9 * E + j + 1) * S, :] = (
                                jfr[j]
                            )
                    # scratch-carry rows: the next step's scratch inputs are
                    # emit rows this step already computed (e.g. transport's
                    # fresh global_shaping) — written right after the state
                    # (+ jfr) rows so the scan carry IS the kernel output, no
                    # host ops; the emit rows go to their own output so
                    # recording them needs no slicing either
                    _new_scratch = []
                    for k, ei in enumerate(outputs.carry_extra_idx):
                        # None = rollout-constant scratch (e.g. a per-env goal
                        # index chosen at reset): carry the input row unchanged
                        src = (
                            scratch_in[k]
                            if ei is None
                            else extra[int(ei)].astype(jnp.float32)
                        )
                        _new_scratch.append(src)
                        if _last:
                            o_ref[
                                (9 * E + J + k) * S : (9 * E + J + k + 1) * S, :
                            ] = src
                    # next in-kernel step reads this step's carried scratch
                    scratch_in = _new_scratch
                    # controller rows: process_act_rows already advanced the
                    # `ctrl` list in place; persist them into the carry
                    if _last:
                        for k in range(n_ctrl):
                            o_ref[
                                (9 * E + J + K_in + k) * S
                                : (9 * E + J + K_in + k + 1) * S, :
                            ] = ctrl[k]
                    _eb = _k * (int(outputs.n_out) + n_ctrl_out)
                    for k, r in enumerate(list(extra) + hook_rows):
                        e_ref[(_eb + k) * S : (_eb + k + 1) * S, :] = (
                            r.astype(jnp.float32)
                        )
                else:
                    for k, r in enumerate(extra):
                        o_ref[(9 * E + k) * S : (9 * E + k + 1) * S, :] = (
                            r.astype(jnp.float32)
                        )

    return kernel


def _blk_for(bp: int, n_rows: int, sublanes: int = 1) -> int:
    """Largest block (in ENVS, multiple of 128*sublanes so each block's lane
    count stays a 128-multiple after packing) that divides the padded batch
    while the kernel's resident f32 rows (``n_rows`` = input rows + output
    rows + lane-batched intermediate allowance, all passed in by the caller)
    stay within budget — a block's VMEM footprint is n_rows*blk*4 bytes
    independent of the packing. The 4 MB default budget is deliberately
    conservative — a quarter of the v5e's ~16 MB VMEM — leaving headroom for
    Mosaic's own temporaries. ``VMAS_TPU_FUSED_VMEM_MB`` overrides it for
    on-hardware sweeps (all round-2 timings were taken at the default)."""
    budget = int(float(os.environ.get("VMAS_TPU_FUSED_VMEM_MB", "4")) * 2**20)
    step = 128 * sublanes
    best = step
    blk = step
    while blk <= bp:
        if bp % blk == 0 and n_rows * blk * 4 <= budget:
            best = blk
        blk += step
    return best


def _batched_rows_estimate(spec) -> int:
    """Rough count of live [P, BLK] rows for the lane-batched pair
    computations (used to shrink the batch block so they fit VMEM):
    the largest transient per-type working set PLUS the per-type constant
    tiles, which are hoisted before the substep loop and stay resident."""
    transient = 0
    resident = 0
    if _entity_tile_on(len(spec.mass)):
        # entity-tiled stream: ~20 resident per-entity constant tiles plus
        # the state/base/integrate working tiles
        resident += 20 * len(spec.mass)
        transient += 12 * len(spec.mass)
    for n, per_pair, n_consts in (
        (len(spec.ss_a), 6, 1),
        (len(spec.ls_line), 10, 2),
        (len(spec.ll_a), 16, 2),
        (len(spec.bs_box), 14, 4),
        (len(spec.bl_box), 24, 4),
        (len(spec.bb_a), 32, 6),
    ):
        if n >= _lane_min():
            transient = max(transient, n * per_pair)
            resident += n * n_consts
    return transient + resident


def fused_physics_step(world, state, outputs=None):
    """Drop-in replacement for physics.physics_step on supported worlds.

    With ``outputs`` (a :class:`FusedOutputs`), also computes the
    scenario's fused output rows and returns ``(state, extra [n_out, B])``
    instead of just ``state``."""
    spec = world.spec
    B, E = state.pos.shape[:2]
    J = len(spec.joint_idx_a)
    K_in = int(outputs.n_scratch_in) if outputs is not None else 0
    K_out = int(outputs.n_out) if outputs is not None else 0
    R = 9 * E + J + (2 * E if getattr(world, "dynamic_gravity", False) else 0) + K_in

    parts = [
        state.pos[..., 0].T, state.pos[..., 1].T,
        state.vel[..., 0].T, state.vel[..., 1].T,
        state.rot.T, state.ang_vel.T,
        state.force[..., 0].T, state.force[..., 1].T,
        state.torque.T,
    ]
    if J:
        parts.append(state.joint_fixed_rot.T)
    dyn = getattr(world, "dynamic_gravity", False)
    if dyn:
        parts.append(state.dyn_gravity[..., 0].T)
        parts.append(state.dyn_gravity[..., 1].T)
    if outputs is not None:
        parts.append(jnp.asarray(outputs.scratch_rows(state), jnp.float32))
    x = jnp.concatenate(parts, axis=0)  # [R, B]

    bp = -(-B // 128) * 128
    if bp != B:
        x = jnp.pad(x, ((0, 0), (0, bp - B)))
    S = _sublanes(bp)
    blk = _blk_for(bp, R + 9 * E + K_out + _batched_rows_estimate(spec), S)
    # sublane packing (see _sublanes): [R, bp] -> [R*S, bp/S] is a row-major
    # contiguous reshape — a free bitcast for XLA — after which every kernel
    # row view is a fully-packed (S, blk/S) tile instead of a (1, blk) row
    # wasting 7/8 of every VREG it touches
    if S > 1:
        x = x.reshape(R * S, bp // S)

    kernel = _make_kernel(world, outputs, S)
    # donate the input buffer to the output only when the two have identical
    # shape AND identical row meaning (pure 9E state rows, no joint /
    # dyn-gravity / scratch inputs, no fused outputs) — shape equality alone
    # (e.g. J + K_in == K_out by coincidence) would rely on every x_ref read
    # preceding every o_ref write inside the kernel body, which nothing
    # enforces structurally
    alias = {0: 0} if (J == 0 and not dyn and K_in == 0 and K_out == 0) else {}
    y = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct(((9 * E + K_out) * S, bp // S), jnp.float32),
        grid=(bp // blk,),
        in_specs=[
            pl.BlockSpec((R * S, blk // S), lambda i: (0, i), memory_space=pltpu.VMEM)
        ],
        out_specs=pl.BlockSpec(
            ((9 * E + K_out) * S, blk // S), lambda i: (0, i),
            memory_space=pltpu.VMEM,
        ),
        input_output_aliases=alias,
        interpret=jax.default_backend() == "cpu",
    )(x)

    if S > 1:
        y = y.reshape(9 * E + K_out, bp)
    y = y[:, :B]
    pos = jnp.stack([y[0:E].T, y[E : 2 * E].T], axis=-1)
    vel = jnp.stack([y[2 * E : 3 * E].T, y[3 * E : 4 * E].T], axis=-1)
    rot = y[4 * E : 5 * E].T
    ang_vel = y[5 * E : 6 * E].T
    force = jnp.stack([y[6 * E : 7 * E].T, y[7 * E : 8 * E].T], axis=-1)
    torque = y[8 * E : 9 * E].T
    state = state.replace(
        pos=pos, vel=vel, rot=rot, ang_vel=ang_vel, force=force, torque=torque
    )

    if world.dim_c > 0 and len(world.agents):
        c = jnp.where(spec.silent[None, :, None], state.c, state.uc)
        state = state.replace(c=c)
    if outputs is not None:
        return state, y[9 * E :]
    return state


# ---------------------------------------------------------------------------
# rows-carried rollout (the bench fast path; parallel/rollout.py)
# ---------------------------------------------------------------------------
#
# The standard compiled rollout scans env._step_fn_raw: per step it unpacks
# the kernel's row output back into the [B, E, 2] state pytree, reassembles
# rows for the next call, and lets XLA relayout the carry — compiled, that
# is ~10 `copy` ops of [B, E, 2]-class arrays and the per-agent obs
# transposes EVERY step, measured at ~38 of transport@4096's ~44 us/step
# real cost (round 4, tests/golden/time_glue_split.py + HLO dump: the fused
# kernel itself is ~6 us). Here the scan carry IS the kernel's row buffer:
# pack once, scan (one pallas call + one output-row slice per step), unpack
# once. Decoded action-force rows ride the scan xs; scratch rides dedicated
# carry rows the kernel writes at the offsets it reads them from.

def rows_step_supported(world, outputs, agents) -> bool:
    """Static eligibility for the rows-carried rollout (v1 = the bench
    class): fused-outputs scenario with declared scratch carry,
    non-dyn-gravity world, and pure-Holonomic noise-free agents (their
    process_action is exactly 'force = u', realized in-kernel by the
    action-row override). Comm worlds qualify when the comm stream is
    noise-free — the physics kernel ignores comm entirely; the rollout
    hoists the comm decode and substitutes per-step uc into unpack."""
    from vmas_tpu.dynamics.holonomic import Holonomic

    if outputs is None or not supports(world):
        return False
    if getattr(outputs, "carry_extra_idx", None) is None:
        return False
    if len(outputs.carry_extra_idx) != int(outputs.n_scratch_in):
        return False
    if getattr(world, "dynamic_gravity", False):
        return False
    for a in agents:
        if type(a.dynamics) is not Holonomic or a.action_script is not None:
            return False
        if a.action_size != 2:
            return False
        # u_noise / c_noise are fine since round 5: the rollout hoists the
        # noise draws over the horizon with the step pipeline's own key
        # schedule (parallel/rollout.py _noise_streams) — bitwise the
        # per-step draws
    # non-policy SCRIPTED agents run their scripts in XLA per step — the
    # rows kernel would carry their stale force rows. They are eligible
    # ONLY when the scenario declares the script precomputable over the
    # horizon (``script_slots`` + ``script_us`` on the FusedOutputs —
    # flocking's circling target is a pure function of its step counter,
    # reference flocking.py:37-40): the rollout then rides the scripted
    # agents' per-step u on the action rows exactly like policy actions.
    scripted = [a for a in world.agents if a.action_script is not None]
    if scripted:
        pre_slots = set(getattr(outputs, "script_slots", ()))
        kern_slots = set(getattr(outputs, "kernel_script_slots", ()))
        if {a.index for a in scripted} != pre_slots | kern_slots:
            return False
        if pre_slots and not callable(getattr(outputs, "script_us", None)):
            return False
        # kernel scripts (football's state-dependent ball anti-stall
        # impulses) run INSIDE process_act_rows each step
        if kern_slots and getattr(outputs, "process_act_rows", None) is None:
            return False
        for a in scripted:
            if (
                type(a.dynamics) is not Holonomic
                or np.any(np.asarray(a.u_noise_array) > 0)
            ):
                return False
    return True


def rows_layout(world, outputs):
    """R_in: carried rows (9E state + J joint fixed rotations + K scratch
    + n_ctrl controller rows). The emit rows are a separate kernel output,
    not part of the carry."""
    E = len(world.spec.mass)
    J = len(world.spec.joint_idx_a)
    K = int(outputs.n_scratch_in)
    return 9 * E + J + K + int(getattr(outputs, "n_ctrl", 0))


def pack_carry(world, state, outputs, bp):
    """State + joint fixed rotations + scratch (+ controller rows) as one
    [R_in, bp] buffer."""
    parts = [
        state.pos[..., 0].T, state.pos[..., 1].T,
        state.vel[..., 0].T, state.vel[..., 1].T,
        state.rot.T, state.ang_vel.T,
        state.force[..., 0].T, state.force[..., 1].T,
        state.torque.T,
        state.joint_fixed_rot.T.astype(jnp.float32),
        jnp.asarray(outputs.scratch_rows(state), jnp.float32),
    ]
    if int(getattr(outputs, "n_ctrl", 0)):
        parts.append(jnp.asarray(outputs.ctrl_rows(state), jnp.float32))
    x = jnp.concatenate(parts, axis=0)
    if bp != state.batch_dim:
        x = jnp.pad(x, ((0, 0), (0, bp - state.batch_dim)))
    return x


def unpack_carry(world, carry, state):
    """Final carry rows -> state arrays (same layout as fused_physics_step's
    unpack; scratch/extra rows are the caller's to consume)."""
    E = len(world.spec.mass)
    B = state.batch_dim
    y = carry[:, :B]
    return state.replace(
        pos=jnp.stack([y[0:E].T, y[E : 2 * E].T], axis=-1),
        vel=jnp.stack([y[2 * E : 3 * E].T, y[3 * E : 4 * E].T], axis=-1),
        rot=y[4 * E : 5 * E].T,
        ang_vel=y[5 * E : 6 * E].T,
        force=jnp.stack([y[6 * E : 7 * E].T, y[7 * E : 8 * E].T], axis=-1),
        torque=y[8 * E : 9 * E].T,
    )


def make_rows_step(world, outputs, act_slots, bp, k_steps=1):
    """Build ``(carry [R_in, bp], act_rows [k_steps*2A, bp]) -> (carry',
    extra [k_steps*n_out, bp])`` — one pallas call, nothing else: the scan
    carries the first output verbatim and records the second. With
    ``k_steps > 1`` the kernel runs that many FULL env steps back to back
    without leaving VMEM (the per-step action rows arrive as k_steps
    stacked blocks; each step's emit rows land in their own extra block),
    dividing pallas launch + carry HBM round-trips by k_steps."""
    R_in = rows_layout(world, outputs)
    n_out = int(outputs.n_out) + int(getattr(outputs, "n_ctrl_out", 0))
    A = len(act_slots)
    K = int(k_steps)
    spec = world.spec
    blk = _blk_for(
        bp, 2 * R_in + K * n_out + K * 2 * A + _batched_rows_estimate(spec), 1
    )
    kernel = _make_kernel(world, outputs, 1, rows_mode=True,
                          act_slots=act_slots, k_steps=K)
    # Mosaic wants block sublane dims divisible by 8 or == the array dim;
    # blocks below span the full row dim of each operand, so any row count
    # is fine. The action rows are padded to 8 once by the caller.
    a_blk = -(-K * 2 * A // 8) * 8

    def step(carry, act):
        if a_blk != act.shape[0]:
            act = jnp.pad(act, ((0, a_blk - act.shape[0]), (0, 0)))
        return pl.pallas_call(
            kernel,
            out_shape=(
                jax.ShapeDtypeStruct((R_in, bp), jnp.float32),
                jax.ShapeDtypeStruct((K * n_out, bp), jnp.float32),
            ),
            grid=(bp // blk,),
            in_specs=[
                pl.BlockSpec((R_in, blk), lambda i: (0, i), memory_space=pltpu.VMEM),
                pl.BlockSpec((a_blk, blk), lambda i: (0, i), memory_space=pltpu.VMEM),
            ],
            out_specs=(
                pl.BlockSpec((R_in, blk), lambda i: (0, i), memory_space=pltpu.VMEM),
                pl.BlockSpec((K * n_out, blk), lambda i: (0, i), memory_space=pltpu.VMEM),
            ),
            interpret=jax.default_backend() == "cpu",
        )(carry, act)

    return step
