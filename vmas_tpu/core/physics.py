"""The compiled physics step.

Behavioral reference: /root/reference/vmas/simulator/core.py:1971-2918
(World.step, collision kernels, constraint force model, integrator).

Design (SURVEY.md section 7): all per-entity Python loops become masked
``[B, E]`` array ops; the per-step O(N^2) pair bucketing (reference
core.py:2111-2173) is hoisted to build time (:func:`build_spec`), so each of
the six shape-pair kernels is one dense ``[B, P]`` computation followed by a
scatter-add. The runtime broad phase (core.py:2796-2800) is dropped: the
penalty force is exactly zero beyond ``dist_min`` (core.py:2833-2835), so
masking is free and branch-free.
"""

from __future__ import annotations

from types import SimpleNamespace

import numpy as np
import jax.numpy as jnp

from vmas_tpu.core import geometry as G
from vmas_tpu.core.shapes import Box, Line, Sphere
from vmas_tpu.core.state import WorldState
from vmas_tpu.core.utils import JaxUtils, LINE_MIN_DIST, safe_norm


# ---------------------------------------------------------------------------
# build-time spec
# ---------------------------------------------------------------------------

def build_spec(world) -> SimpleNamespace:
    """Bake all static world structure into numpy arrays.

    Replaces: per-entity attribute lookups in the step loop, the per-step pair
    bucketing (core.py:2103-2173), and JointConstraint bookkeeping
    (joints.py:147-215).
    """
    entities = world.entities
    E = len(entities)
    agents = world.agents

    def arr(fn, dtype=np.float32):
        return np.asarray([fn(e) for e in entities], dtype=dtype)

    spec = SimpleNamespace()
    spec.movable = arr(lambda e: e.movable, bool)
    spec.rotatable = arr(lambda e: e.rotatable, bool)
    spec.is_agent = np.asarray([isinstance(e, _agent_cls()) for e in entities], bool)
    spec.mass = arr(lambda e: e.mass)
    spec.inv_mass = 1.0 / spec.mass
    spec.moi = arr(lambda e: e.moment_of_inertia)
    # Guard: static entities may have moi 0-ish shapes; they never rotate.
    spec.inv_moi = np.where(spec.moi > 0, 1.0 / np.where(spec.moi > 0, spec.moi, 1.0), 0.0)
    spec.drag = arr(lambda e: world.drag if e.drag is None else e.drag)
    spec.lin_fric = arr(lambda e: world.linear_friction if e.linear_friction is None else e.linear_friction)
    spec.ang_fric = arr(lambda e: world.angular_friction if e.angular_friction is None else e.angular_friction)
    spec.has_lin_fric = bool((spec.lin_fric != 0).any())
    spec.has_ang_fric = bool((spec.ang_fric != 0).any())
    spec.ent_gravity = np.stack(
        [np.zeros(2, np.float32) if e.gravity is None else np.asarray(e.gravity, np.float32) for e in entities]
    )
    spec.has_ent_gravity = bool((spec.ent_gravity != 0).any())
    spec.has_world_gravity = bool(any(g != 0 for g in world.gravity))
    spec.max_speed = arr(lambda e: np.inf if e.max_speed is None else e.max_speed)
    spec.v_range = arr(lambda e: np.inf if e.v_range is None else e.v_range)
    spec.has_max_speed = bool(np.isfinite(spec.max_speed).any())
    spec.has_v_range = bool(np.isfinite(spec.v_range).any())

    # Agent force/torque limits, padded over the entity axis.
    inf = np.full(E, np.inf, np.float32)
    spec.max_f, spec.f_range, spec.max_t, spec.t_range = inf.copy(), inf.copy(), inf.copy(), inf.copy()
    for a in agents:
        if a.max_f is not None:
            spec.max_f[a.index] = a.max_f
        if a.f_range is not None:
            spec.f_range[a.index] = a.f_range
        if a.max_t is not None:
            spec.max_t[a.index] = a.max_t
        if a.t_range is not None:
            spec.t_range[a.index] = a.t_range
    spec.has_max_f = bool(np.isfinite(spec.max_f).any())
    spec.has_f_range = bool(np.isfinite(spec.f_range).any())
    spec.has_max_t = bool(np.isfinite(spec.max_t).any())
    spec.has_t_range = bool(np.isfinite(spec.t_range).any())

    spec.silent = np.asarray([a.silent for a in agents], bool)

    # ---- collision pair buckets & joint table (core.py:2111-2173) -----
    ss, ls, ll, bs, bl, bb, joints = [], [], [], [], [], [], []
    for ai in range(E):
        for bi in range(ai + 1, E):
            ea, eb = entities[ai], entities[bi]
            constraint = world._constraints.get(frozenset({ea.name, eb.name}))
            if constraint is not None:
                joints.append(constraint)
                if constraint.dist == 0:
                    continue
            if not world.collides(ea, eb):
                continue
            sa, sb = ea.shape, eb.shape
            if isinstance(sa, Sphere) and isinstance(sb, Sphere):
                ss.append((ea, eb))
            elif {type(sa), type(sb)} == {Line, Sphere}:
                line, sphere = (ea, eb) if isinstance(sb, Sphere) else (eb, ea)
                ls.append((line, sphere))
            elif isinstance(sa, Line) and isinstance(sb, Line):
                ll.append((ea, eb))
            elif {type(sa), type(sb)} == {Box, Sphere}:
                box, sphere = (ea, eb) if isinstance(sb, Sphere) else (eb, ea)
                bs.append((box, sphere))
            elif {type(sa), type(sb)} == {Box, Line}:
                box, line = (ea, eb) if isinstance(sb, Line) else (eb, ea)
                bl.append((box, line))
            elif isinstance(sa, Box) and isinstance(sb, Box):
                bb.append((ea, eb))

    idx = lambda pairs, k: np.asarray([p[k].index for p in pairs], np.int32)
    prop = lambda pairs, k, f, dt=np.float32: np.asarray([f(p[k]) for p in pairs], dt)

    spec.ss_a, spec.ss_b = idx(ss, 0), idx(ss, 1)
    spec.ss_ra, spec.ss_rb = prop(ss, 0, lambda e: e.shape.radius), prop(ss, 1, lambda e: e.shape.radius)

    spec.ls_line, spec.ls_sphere = idx(ls, 0), idx(ls, 1)
    spec.ls_len = prop(ls, 0, lambda e: e.shape.length)
    spec.ls_rad = prop(ls, 1, lambda e: e.shape.radius)

    spec.ll_a, spec.ll_b = idx(ll, 0), idx(ll, 1)
    spec.ll_la, spec.ll_lb = prop(ll, 0, lambda e: e.shape.length), prop(ll, 1, lambda e: e.shape.length)

    spec.bs_box, spec.bs_sphere = idx(bs, 0), idx(bs, 1)
    spec.bs_len, spec.bs_wid = prop(bs, 0, lambda e: e.shape.length), prop(bs, 0, lambda e: e.shape.width)
    spec.bs_not_hollow = prop(bs, 0, lambda e: not e.shape.hollow, bool)
    spec.bs_rad = prop(bs, 1, lambda e: e.shape.radius)

    spec.bl_box, spec.bl_line = idx(bl, 0), idx(bl, 1)
    spec.bl_blen, spec.bl_bwid = prop(bl, 0, lambda e: e.shape.length), prop(bl, 0, lambda e: e.shape.width)
    spec.bl_not_hollow = prop(bl, 0, lambda e: not e.shape.hollow, bool)
    spec.bl_llen = prop(bl, 1, lambda e: e.shape.length)

    spec.bb_a, spec.bb_b = idx(bb, 0), idx(bb, 1)
    spec.bb_la, spec.bb_wa = prop(bb, 0, lambda e: e.shape.length), prop(bb, 0, lambda e: e.shape.width)
    spec.bb_nha = prop(bb, 0, lambda e: not e.shape.hollow, bool)
    spec.bb_lb, spec.bb_wb = prop(bb, 1, lambda e: e.shape.length), prop(bb, 1, lambda e: e.shape.width)
    spec.bb_nhb = prop(bb, 1, lambda e: not e.shape.hollow, bool)

    # Joint constraint table (reference core.py:2200-2291; joints.py:147-215).
    spec.joint_idx_a = np.asarray([c.entity_a.index for c in joints], np.int32)
    spec.joint_idx_b = np.asarray([c.entity_b.index for c in joints], np.int32)
    spec.joint_anchor_a = np.asarray(
        [c.entity_a.shape.get_delta_from_anchor(c.anchor_a) for c in joints], np.float32
    ).reshape(-1, 2)
    spec.joint_anchor_b = np.asarray(
        [c.entity_b.shape.get_delta_from_anchor(c.anchor_b) for c in joints], np.float32
    ).reshape(-1, 2)
    spec.joint_dist = np.asarray([c.dist for c in joints], np.float32)
    spec.joint_rotate = np.asarray([c.rotate for c in joints], bool)
    spec.joint_fixed_rot_init = np.asarray(
        [0.0 if c.fixed_rotation is None else c.fixed_rotation for c in joints], np.float32
    )
    for t, c in enumerate(joints):
        c.table_index = t

    return spec


def _agent_cls():
    from vmas_tpu.core.world import Agent

    return Agent


# ---------------------------------------------------------------------------
# force model (reference core.py:2804-2857)
# ---------------------------------------------------------------------------

def constraint_forces(contact_margin, pos_a, pos_b, dist_min, force_multiplier, attractive=False):
    """Soft logaddexp penalty force pair (reference _get_constraint_forces)."""
    min_dist = 1e-6
    delta = pos_a - pos_b
    dist = safe_norm(delta)
    sign = -1.0 if attractive else 1.0
    k = contact_margin
    penetration = jnp.logaddexp(0.0, (dist_min - dist) * sign / k) * k
    force = (
        sign
        * force_multiplier
        * delta
        / jnp.where(dist > 0, dist, 1e-8)[..., None]
        * penetration[..., None]
    )
    force = jnp.where((dist < min_dist)[..., None], 0.0, force)
    if not attractive:
        force = jnp.where((dist > dist_min)[..., None], 0.0, force)
    else:
        force = jnp.where((dist < dist_min)[..., None], 0.0, force)
    return force, -force


def constraint_torques(rot_a, rot_b, force_multiplier):
    """Exponential rotation-constraint torque (reference core.py:2840-2857)."""
    min_delta_rot = 1e-9
    delta_rot = rot_a - rot_b
    abs_delta = jnp.abs(delta_rot)
    penetration = jnp.exp(abs_delta) - 1.0
    torque = force_multiplier * jnp.sign(delta_rot) * penetration
    torque = jnp.where(abs_delta < min_delta_rot, 0.0, torque)
    return -torque, torque


# ---------------------------------------------------------------------------
# accumulation helpers
# ---------------------------------------------------------------------------

def _add_force(forces, spec, idx, f):
    mv = jnp.asarray(spec.movable[idx], bool)
    return forces.at[:, jnp.asarray(idx)].add(jnp.where(mv[None, :, None], f, 0.0))


def _add_torque(torques, spec, idx, t):
    ro = jnp.asarray(spec.rotatable[idx], bool)
    return torques.at[:, jnp.asarray(idx)].add(jnp.where(ro[None, :], t, 0.0))


# ---------------------------------------------------------------------------
# per-substep force computation
# ---------------------------------------------------------------------------

def _action_forces(world, state, forces, torques):
    """Clamped agent action forces/torques (core.py:2016-2040).

    The clamp writes back into the persistent state.force, as the reference
    does on agent.state.force.
    """
    spec = world.spec
    f = state.force
    act_mask = (spec.is_agent & spec.movable)[None, :, None]
    if spec.has_max_f:
        f = jnp.where(act_mask, JaxUtils.clamp_with_norm(f, spec.max_f[None, :, None]), f)
    if spec.has_f_range:
        r = spec.f_range[None, :, None]
        f = jnp.where(act_mask, jnp.clip(f, -r, r), f)
    t = state.torque
    rot_mask = (spec.is_agent & spec.rotatable)[None, :]
    if spec.has_max_t:
        t = jnp.where(rot_mask, jnp.clip(t, -spec.max_t[None, :], spec.max_t[None, :]), t)
    if spec.has_t_range:
        t = jnp.where(rot_mask, jnp.clip(t, -spec.t_range[None, :], spec.t_range[None, :]), t)
    state = state.replace(force=f, torque=t)
    forces = forces + jnp.where(spec.movable[None, :, None], f, 0.0)
    torques = torques + jnp.where(spec.rotatable[None, :], t, 0.0)
    return state, forces, torques


def _friction_force(vel, coeff, mass, sub_dt):
    """Coulomb friction (reference core.py:2053-2072). ``vel``: [B, E, D]."""
    speed = safe_norm(vel)  # [B, E]
    static = speed == 0.0
    fconst = (coeff * mass)[None, :, None]
    ff = -(vel / jnp.where(static, 1.0, speed)[..., None]) * jnp.minimum(
        fconst, (jnp.abs(vel) / sub_dt) * mass[None, :, None]
    )
    return jnp.where(static[..., None], 0.0, ff)


def _environment_forces(world, state, forces, torques):
    """Joint constraints + the 6 batched shape-pair collision kernels
    (reference core.py:2103-2785)."""
    spec = world.spec
    cm = world.contact_margin
    cf = world.collision_force

    # Joints (core.py:2200-2291)
    if len(spec.joint_idx_a):
        ia, ib = spec.joint_idx_a, spec.joint_idx_b
        pos_a, pos_b = state.pos[:, ia], state.pos[:, ib]
        rot_a, rot_b = state.rot[:, ia], state.rot[:, ib]
        pja = pos_a + JaxUtils.rotate_vector(
            jnp.broadcast_to(spec.joint_anchor_a[None], pos_a.shape), rot_a
        )
        pjb = pos_b + JaxUtils.rotate_vector(
            jnp.broadcast_to(spec.joint_anchor_b[None], pos_b.shape), rot_b
        )
        dist = spec.joint_dist[None, :]
        fa_att, fb_att = constraint_forces(cm, pja, pjb, dist, world.joint_force, attractive=True)
        fa_rep, fb_rep = constraint_forces(cm, pja, pjb, dist, world.joint_force, attractive=False)
        force_a = fa_att + fa_rep
        force_b = fb_att + fb_rep
        ta_rot = JaxUtils.compute_torque(force_a, pja - pos_a)
        tb_rot = JaxUtils.compute_torque(force_b, pjb - pos_b)
        ta_fix, tb_fix = constraint_torques(
            rot_a, rot_b + state.joint_fixed_rot, world.torque_constraint_force
        )
        rotate = jnp.asarray(spec.joint_rotate)[None, :]
        torque_a = jnp.where(rotate, ta_rot, ta_rot + ta_fix)
        torque_b = jnp.where(rotate, tb_rot, tb_rot + tb_fix)
        forces = _add_force(forces, spec, ia, force_a)
        torques = _add_torque(torques, spec, ia, torque_a)
        forces = _add_force(forces, spec, ib, force_b)
        torques = _add_torque(torques, spec, ib, torque_b)

    # Sphere-sphere (core.py:2293-2338)
    if len(spec.ss_a):
        pa, pb = state.pos[:, spec.ss_a], state.pos[:, spec.ss_b]
        fa, fb = constraint_forces(cm, pa, pb, (spec.ss_ra + spec.ss_rb)[None, :], cf)
        forces = _add_force(forces, spec, spec.ss_a, fa)
        forces = _add_force(forces, spec, spec.ss_b, fb)

    # Line-sphere (core.py:2340-2391)
    if len(spec.ls_line):
        pos_l, pos_s = state.pos[:, spec.ls_line], state.pos[:, spec.ls_sphere]
        rot_l = state.rot[:, spec.ls_line]
        length = jnp.broadcast_to(spec.ls_len[None, :], rot_l.shape)
        closest = G.closest_point_line(pos_l, rot_l, length, pos_s)
        f_sphere, f_line = constraint_forces(
            cm, pos_s, closest, (spec.ls_rad + LINE_MIN_DIST)[None, :], cf
        )
        t_line = JaxUtils.compute_torque(f_line, closest - pos_l)
        forces = _add_force(forces, spec, spec.ls_line, f_line)
        torques = _add_torque(torques, spec, spec.ls_line, t_line)
        forces = _add_force(forces, spec, spec.ls_sphere, f_sphere)

    # Line-line (core.py:2393-2456)
    if len(spec.ll_a):
        pos_a, pos_b = state.pos[:, spec.ll_a], state.pos[:, spec.ll_b]
        rot_a, rot_b = state.rot[:, spec.ll_a], state.rot[:, spec.ll_b]
        la = jnp.broadcast_to(spec.ll_la[None, :], rot_a.shape)
        lb = jnp.broadcast_to(spec.ll_lb[None, :], rot_b.shape)
        point_a, point_b = G.closest_points_line_line(pos_a, rot_a, la, pos_b, rot_b, lb)
        fa, fb = constraint_forces(cm, point_a, point_b, LINE_MIN_DIST, cf)
        forces = _add_force(forces, spec, spec.ll_a, fa)
        torques = _add_torque(torques, spec, spec.ll_a, JaxUtils.compute_torque(fa, point_a - pos_a))
        forces = _add_force(forces, spec, spec.ll_b, fb)
        torques = _add_torque(torques, spec, spec.ll_b, JaxUtils.compute_torque(fb, point_b - pos_b))

    # Box-sphere (core.py:2458-2551)
    if len(spec.bs_box):
        pos_box, pos_s = state.pos[:, spec.bs_box], state.pos[:, spec.bs_sphere]
        rot_box = state.rot[:, spec.bs_box]
        wid = jnp.broadcast_to(spec.bs_wid[None, :], rot_box.shape)
        leng = jnp.broadcast_to(spec.bs_len[None, :], rot_box.shape)
        closest = G.closest_point_box(pos_box, rot_box, wid, leng, pos_s)
        inner_point = closest
        d = jnp.zeros_like(rot_box)
        if spec.bs_not_hollow.any():
            inner_h, d_h = G.inner_point_box(pos_s, closest, pos_box)
            nh = jnp.asarray(spec.bs_not_hollow)[None, :]
            inner_point = jnp.where(nh[..., None], inner_h, inner_point)
            d = jnp.where(nh, d_h, d)
        f_sphere, f_box = constraint_forces(
            cm, pos_s, inner_point, spec.bs_rad[None, :] + LINE_MIN_DIST + d, cf
        )
        t_box = JaxUtils.compute_torque(f_box, closest - pos_box)
        forces = _add_force(forces, spec, spec.bs_box, f_box)
        torques = _add_torque(torques, spec, spec.bs_box, t_box)
        forces = _add_force(forces, spec, spec.bs_sphere, f_sphere)

    # Box-line (core.py:2553-2652)
    if len(spec.bl_box):
        pos_box, pos_line = state.pos[:, spec.bl_box], state.pos[:, spec.bl_line]
        rot_box, rot_line = state.rot[:, spec.bl_box], state.rot[:, spec.bl_line]
        bwid = jnp.broadcast_to(spec.bl_bwid[None, :], rot_box.shape)
        blen = jnp.broadcast_to(spec.bl_blen[None, :], rot_box.shape)
        llen = jnp.broadcast_to(spec.bl_llen[None, :], rot_line.shape)
        point_box, point_line = G.closest_line_box(pos_box, rot_box, bwid, blen, pos_line, rot_line, llen)
        inner_point = point_box
        d = jnp.zeros_like(rot_box)
        if spec.bl_not_hollow.any():
            inner_h, d_h = G.inner_point_box(point_line, point_box, pos_box)
            nh = jnp.asarray(spec.bl_not_hollow)[None, :]
            inner_point = jnp.where(nh[..., None], inner_h, inner_point)
            d = jnp.where(nh, d_h, d)
        f_box, f_line = constraint_forces(cm, inner_point, point_line, LINE_MIN_DIST + d, cf)
        forces = _add_force(forces, spec, spec.bl_box, f_box)
        torques = _add_torque(
            torques, spec, spec.bl_box, JaxUtils.compute_torque(f_box, point_box - pos_box)
        )
        forces = _add_force(forces, spec, spec.bl_line, f_line)
        torques = _add_torque(
            torques, spec, spec.bl_line, JaxUtils.compute_torque(f_line, point_line - pos_line)
        )

    # Box-box (core.py:2654-2785)
    if len(spec.bb_a):
        pos_a, pos_b = state.pos[:, spec.bb_a], state.pos[:, spec.bb_b]
        rot_a, rot_b = state.rot[:, spec.bb_a], state.rot[:, spec.bb_b]
        wa = jnp.broadcast_to(spec.bb_wa[None, :], rot_a.shape)
        la = jnp.broadcast_to(spec.bb_la[None, :], rot_a.shape)
        wb = jnp.broadcast_to(spec.bb_wb[None, :], rot_b.shape)
        lb = jnp.broadcast_to(spec.bb_lb[None, :], rot_b.shape)
        point_a, point_b = G.closest_box_box(pos_a, rot_a, wa, la, pos_b, rot_b, wb, lb)
        inner_a, d_a = point_a, jnp.zeros_like(rot_a)
        if spec.bb_nha.any():
            ih, dh = G.inner_point_box(point_b, point_a, pos_a)
            nh = jnp.asarray(spec.bb_nha)[None, :]
            inner_a = jnp.where(nh[..., None], ih, inner_a)
            d_a = jnp.where(nh, dh, d_a)
        inner_b, d_b = point_b, jnp.zeros_like(rot_b)
        if spec.bb_nhb.any():
            ih, dh = G.inner_point_box(point_a, point_b, pos_b)
            nh = jnp.asarray(spec.bb_nhb)[None, :]
            inner_b = jnp.where(nh[..., None], ih, inner_b)
            d_b = jnp.where(nh, dh, d_b)
        fa, fb = constraint_forces(cm, inner_a, inner_b, d_a + d_b + LINE_MIN_DIST, cf)
        forces = _add_force(forces, spec, spec.bb_a, fa)
        torques = _add_torque(torques, spec, spec.bb_a, JaxUtils.compute_torque(fa, point_a - pos_a))
        forces = _add_force(forces, spec, spec.bb_b, fb)
        torques = _add_torque(torques, spec, spec.bb_b, JaxUtils.compute_torque(fb, point_b - pos_b))

    return forces, torques


def _integrate(world, state: WorldState, forces, torques, substep: int) -> WorldState:
    """Semi-implicit Euler with sub-stepping (reference core.py:2859-2907)."""
    spec = world.spec
    mv = spec.movable[None, :]
    ro = spec.rotatable[None, :]
    vel, ang_vel, pos, rot = state.vel, state.ang_vel, state.pos, state.rot

    if substep == 0:
        vel = jnp.where(mv[..., None], vel * (1 - spec.drag)[None, :, None], vel)
        ang_vel = jnp.where(ro, ang_vel * (1 - spec.drag)[None, :], ang_vel)

    accel = forces * spec.inv_mass[None, :, None]
    vel = jnp.where(mv[..., None], vel + accel * world.sub_dt, vel)
    if spec.has_max_speed:
        vel = jnp.where(
            mv[..., None], JaxUtils.clamp_with_norm(vel, spec.max_speed[None, :, None]), vel
        )
    if spec.has_v_range:
        r = spec.v_range[None, :, None]
        vel = jnp.where(mv[..., None], jnp.clip(vel, -r, r), vel)
    new_pos = pos + vel * world.sub_dt
    if world.x_semidim is not None:
        new_pos = new_pos.at[..., 0].set(jnp.clip(new_pos[..., 0], -world.x_semidim, world.x_semidim))
    if world.y_semidim is not None:
        new_pos = new_pos.at[..., 1].set(jnp.clip(new_pos[..., 1], -world.y_semidim, world.y_semidim))
    pos = jnp.where(mv[..., None], new_pos, pos)

    ang_vel = jnp.where(ro, ang_vel + torques * spec.inv_moi[None, :] * world.sub_dt, ang_vel)
    rot = jnp.where(ro, rot + ang_vel * world.sub_dt, rot)

    return state.replace(pos=pos, vel=vel, rot=rot, ang_vel=ang_vel)


def physics_step(world, state: WorldState) -> WorldState:
    """Full world step (reference World.step, core.py:1971-2014).

    The substep loop is unrolled at trace time (substeps is small and static).
    """
    spec = world.spec
    B, E = state.pos.shape[:2]
    for substep in range(world.substeps):
        forces = jnp.zeros((B, E, 2), jnp.float32)
        torques = jnp.zeros((B, E), jnp.float32)
        state, forces, torques = _action_forces(world, state, forces, torques)
        if spec.has_lin_fric:
            forces = forces + _friction_force(state.vel, spec.lin_fric, spec.mass, world.sub_dt)
        if spec.has_ang_fric:
            torques = torques + _friction_force(
                state.ang_vel[..., None], spec.ang_fric, spec.moi, world.sub_dt
            )[..., 0]
        if spec.has_world_gravity or spec.has_ent_gravity or state.dyn_gravity is not None:
            g = jnp.asarray(world.gravity)[None, None, :] + spec.ent_gravity[None]
            if state.dyn_gravity is not None:
                g = g + state.dyn_gravity
            forces = forces + jnp.where(
                spec.movable[None, :, None], spec.mass[None, :, None] * g, 0.0
            )
        forces, torques = _environment_forces(world, state, forces, torques)
        state = _integrate(world, state, forces, torques, substep)

    if world.dim_c > 0 and len(world.agents):
        # comm state update (core.py:2909-2912)
        c = jnp.where(spec.silent[None, :, None], state.c, state.uc)
        state = state.replace(c=c)
    return state
