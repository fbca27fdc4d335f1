"""Batched closest-point geometry kernels.

Behavioral reference: /root/reference/vmas/simulator/physics.py (all
functions). Re-derived for JAX/XLA:

* every function operates over arbitrary leading batch dims (typically
  ``[B, P]`` = envs x collision pairs) in one fused elementwise pass — the
  reference's per-candidate Python loops become stacked ``argmin`` reductions;
* rotations are trailing-scalar ``[...]`` arrays;
* all divisions are guarded so reverse-mode AD never sees ``0 * inf`` — the
  guarded lanes are exactly the lanes the reference discards by masking, so
  forward results are bit-comparable.

Tie-breaking matches the reference: the first candidate of minimal distance
wins (torch's sequential ``d < best`` scan == ``jnp.argmin`` first-occurrence).
"""

from __future__ import annotations

import math

import jax.numpy as jnp

from vmas_tpu.core.utils import JaxUtils, safe_div, safe_norm


def _pick_closest(candidates_1, candidates_2):
    """Select, per batch lane, the (p1, p2) pair with minimal |p1 - p2|.

    ``candidates_*`` are ``[K, ..., 2]`` stacks. First minimum wins ties,
    matching the reference's sequential update loops (physics.py:120-127).
    """
    d = safe_norm(candidates_1 - candidates_2)  # [K, ...]
    idx = jnp.argmin(d, axis=0)  # [...]
    take = jnp.take_along_axis
    idx_e = idx[None, ..., None]
    p1 = jnp.squeeze(take(candidates_1, idx_e, axis=0), axis=0)
    p2 = jnp.squeeze(take(candidates_2, idx_e, axis=0), axis=0)
    return p1, p2


def closest_point_line(line_pos, line_rot, line_length, test_point_pos, limit_to_line_length: bool = True):
    """Closest point on a segment to a point (reference physics.py:399-428)."""
    d = jnp.stack([jnp.cos(line_rot), jnp.sin(line_rot)], axis=-1)
    delta_pos = line_pos - test_point_pos
    dot_p = jnp.sum(delta_pos * d, axis=-1)
    sign = jnp.sign(dot_p)
    dist_from_center = jnp.abs(dot_p)
    if limit_to_line_length:
        dist_from_center = jnp.minimum(dist_from_center, line_length / 2)
    return line_pos - (sign * dist_from_center)[..., None] * d


def line_extrema(line_pos, line_rot, line_length):
    """Both endpoints of a segment (reference physics.py:131-140)."""
    half = (line_length / 2)[..., None]
    xy = jnp.stack([jnp.cos(line_rot), jnp.sin(line_rot)], axis=-1) * half
    return line_pos + xy, line_pos - xy


def intersection_point_line_line(point_a1, point_a2, point_b1, point_b2):
    """Segment-segment intersection (reference physics.py:221-259).

    Returns (point, intersects): ``point`` is +inf where no intersection,
    ``intersects`` the boolean condition (the reference encodes it as a
    0-vs-inf distance; a bool is equivalent and cheaper).
    """
    r = point_a2 - point_a1
    s = point_b2 - point_b1
    p = point_a1
    q = point_b1
    cross_qp_r = JaxUtils.cross(q - p, r)
    cross_qp_s = JaxUtils.cross(q - p, s)
    cross_r_s = JaxUtils.cross(r, s)
    u = safe_div(cross_qp_r, cross_r_s)
    t = safe_div(cross_qp_s, cross_r_s)
    parallel = cross_r_s == 0.0
    cond = (~parallel) & (t >= 0) & (t <= 1) & (u >= 0) & (u <= 1)
    point = jnp.where(cond[..., None], p + t[..., None] * r, jnp.inf)
    return point, cond


def closest_points_line_line(line_pos, line_rot, line_length, line2_pos, line2_rot, line2_length):
    """Closest point pair between two segments (reference physics.py:143-218)."""
    a1, a2 = line_extrema(line_pos, line_rot, line_length)
    b1, b2 = line_extrema(line2_pos, line2_rot, line2_length)

    point_i, intersects = intersection_point_line_line(a1, a2, b1, b2)

    a1_on_b = closest_point_line(line2_pos, line2_rot, line2_length, a1)
    a2_on_b = closest_point_line(line2_pos, line2_rot, line2_length, a2)
    b1_on_a = closest_point_line(line_pos, line_rot, line_length, b1)
    b2_on_a = closest_point_line(line_pos, line_rot, line_length, b2)

    cand1 = jnp.stack([a1, a2, b1_on_a, b2_on_a], axis=0)
    cand2 = jnp.stack([a1_on_b, a2_on_b, b1, b2], axis=0)
    p1, p2 = _pick_closest(cand1, cand2)

    cond = intersects[..., None]
    return jnp.where(cond, point_i, p1), jnp.where(cond, point_i, p2)


def all_lines_box(box_pos, box_rot, box_width, box_length):
    """The 4 edge segments of a box (reference physics.py:297-324).

    Returns (pos, rot, length), each with a leading axis of size 4 in the
    reference's edge order: +length side, -length side, +width side, -width
    side.
    """
    v_len = jnp.stack([jnp.cos(box_rot), jnp.sin(box_rot)], axis=-1)
    rot2 = box_rot + math.pi / 2
    v_wid = jnp.stack([jnp.cos(rot2), jnp.sin(rot2)], axis=-1)

    half_l = (box_length / 2)[..., None]
    half_w = (box_width / 2)[..., None]

    p1 = box_pos + v_len * half_l
    p2 = box_pos - v_len * half_l
    p3 = box_pos + v_wid * half_w
    p4 = box_pos - v_wid * half_w

    pos = jnp.stack([p1, p2, p3, p4], axis=0)
    rot = jnp.stack([rot2, rot2, box_rot, box_rot], axis=0)
    length = jnp.stack([box_width, box_width, box_length, box_length], axis=0)
    return pos, rot, length


def closest_point_box(box_pos, box_rot, box_width, box_length, test_point_pos):
    """Closest point on a box's perimeter to a point (physics.py:262-294)."""
    lines_pos, lines_rot, lines_length = all_lines_box(box_pos, box_rot, box_width, box_length)
    pts = closest_point_line(
        lines_pos, lines_rot, lines_length, test_point_pos[None]
    )  # [4, ..., 2]
    tp = jnp.broadcast_to(test_point_pos[None], pts.shape)
    p, _ = _pick_closest(pts, tp)
    return p


def closest_line_box(box_pos, box_rot, box_width, box_length, line_pos, line_rot, line_length):
    """Closest pair between a box perimeter and a segment (physics.py:327-381).

    Returns (point_on_box, point_on_line).
    """
    lines_pos, lines_rot, lines_length = all_lines_box(box_pos, box_rot, box_width, box_length)
    ps_box, ps_line = closest_points_line_line(
        lines_pos,
        lines_rot,
        lines_length,
        jnp.broadcast_to(line_pos[None], lines_pos.shape),
        jnp.broadcast_to(line_rot[None], lines_rot.shape),
        jnp.broadcast_to(line_length[None], lines_length.shape),
    )
    return _pick_closest(ps_box, ps_line)


def closest_box_box(box_pos, box_rot, box_width, box_length, box2_pos, box2_rot, box2_width, box2_length):
    """Closest pair between two box perimeters (physics.py:25-128).

    Candidate set and ordering follow the reference: 4 candidates from box1's
    edges vs box2, then 4 from box2's edges vs box1; first minimum wins.
    """
    # box1 edges against box2
    p_box2_a, p_box1_a = _box_vs_lines(box2_pos, box2_rot, box2_width, box2_length, box_pos, box_rot, box_width, box_length)
    # box2 edges against box1
    p_box1_b, p_box2_b = _box_vs_lines(box_pos, box_rot, box_width, box_length, box2_pos, box2_rot, box2_width, box2_length)

    cand1 = jnp.concatenate([p_box1_a, p_box1_b], axis=0)
    cand2 = jnp.concatenate([p_box2_a, p_box2_b], axis=0)
    return _pick_closest(cand1, cand2)


def _box_vs_lines(box_pos, box_rot, box_width, box_length, other_pos, other_rot, other_width, other_length):
    """Closest pairs between ``box``'s perimeter and each of ``other``'s 4 edges.

    Returns ([4, ..., 2] points on box, [4, ..., 2] points on other's edges).
    """
    lines_pos, lines_rot, lines_length = all_lines_box(other_pos, other_rot, other_width, other_length)
    return closest_line_box(
        jnp.broadcast_to(box_pos[None], lines_pos.shape),
        jnp.broadcast_to(box_rot[None], lines_rot.shape),
        jnp.broadcast_to(box_width[None], lines_length.shape),
        jnp.broadcast_to(box_length[None], lines_length.shape),
        lines_pos,
        lines_rot,
        lines_length,
    )


def inner_point_box(outside_point, surface_point, box_pos):
    """Mirror point inside the box for non-hollow push-out (physics.py:12-22).

    Returns (inner_point, distance from surface point to inner point).
    """
    v = surface_point - outside_point
    u = box_pos - surface_point
    v_norm = safe_norm(v)[..., None]
    x_magnitude = safe_div(jnp.sum(v * u, axis=-1)[..., None], v_norm)
    x = safe_div(v, v_norm) * x_magnitude
    degenerate = v_norm == 0.0
    x = jnp.where(degenerate, surface_point, x)
    x_magnitude = jnp.where(degenerate, 0.0, x_magnitude)
    return surface_point + x, jnp.abs(x_magnitude[..., 0])
