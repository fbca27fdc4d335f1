"""Vectorized ray casting for Lidar sensors.

Behavioral reference: /root/reference/vmas/simulator/core.py:1233-1785
(_cast_ray(s)_to_{box,sphere,line}, cast_ray, cast_rays). Entity bucketing by
shape happens at trace time; each bucket is a single ``[B, N, R]`` kernel and
results min-reduce over entities. Divisions that the reference leaves to IEEE
inf semantics are guarded so gradients through lidar observations stay finite.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from vmas_tpu.core import geometry as G
from vmas_tpu.core.shapes import Box, Line, Sphere
from vmas_tpu.core.utils import JaxUtils, safe_div, safe_norm


def cast_rays_to_box(box_pos, box_rot, box_length, box_width, ray_origin, ray_direction, max_range):
    """Slab-method ray-box (reference core.py:1280-1371).

    box_*: [B, N, ...]; ray_origin: [B, 2]; ray_direction: [B, R].
    Returns [B, N, R] distances (max_range where no hit).
    """
    ro = ray_origin[:, None, None, :]  # [B,1,1,2]
    rd = ray_direction[:, None, :]  # [B,1,R]
    b_pos = box_pos[:, :, None, :]
    b_rot = box_rot[:, :, None]
    b_len = box_length[:, :, None]
    b_wid = box_width[:, :, None]

    pos_aabb = JaxUtils.rotate_vector(ro - b_pos, -b_rot)
    ray_dir_world = jnp.stack([jnp.cos(rd), jnp.sin(rd)], axis=-1)
    ray_dir_aabb = JaxUtils.rotate_vector(ray_dir_world, -b_rot)

    def slab(p, d, half):
        zero = d == 0.0
        inv = 1.0 / jnp.where(zero, 1.0, d)
        t1 = (-half - p) * inv
        t2 = (half - p) * inv
        tmin = jnp.minimum(t1, t2)
        tmax = jnp.maximum(t1, t2)
        inside = (p >= -half) & (p <= half)
        tmin = jnp.where(zero, jnp.where(inside, -jnp.inf, jnp.inf), tmin)
        tmax = jnp.where(zero, jnp.where(inside, jnp.inf, -jnp.inf), tmax)
        return tmin, tmax

    txmin, txmax = slab(pos_aabb[..., 0], ray_dir_aabb[..., 0], b_len / 2)
    tymin, tymax = slab(pos_aabb[..., 1], ray_dir_aabb[..., 1], b_wid / 2)
    tmin = jnp.maximum(txmin, tymin)
    tmax = jnp.minimum(txmax, tymax)

    collision = (tmax >= tmin) & (tmin > 0.0)
    t_hit = jnp.where(collision, tmin, 0.0)
    intersect_aabb = t_hit[..., None] * ray_dir_aabb + pos_aabb
    intersect_world = JaxUtils.rotate_vector(intersect_aabb, b_rot) + b_pos
    dist = safe_norm(ro - intersect_world)
    return jnp.where(collision, dist, max_range)


def cast_rays_to_sphere(sphere_pos, sphere_radius, ray_origin, ray_direction, max_range):
    """Reference core.py:1413-1489. Returns [B, N, R]."""
    ro = ray_origin[:, None, None, :]
    rd = ray_direction[:, None, :]
    s_pos = sphere_pos[:, :, None, :]
    s_rad = sphere_radius[:, :, None]

    ray_dir_world = jnp.stack([jnp.cos(rd), jnp.sin(rd)], axis=-1)
    line_pos = ro + ray_dir_world * (max_range / 2)
    line_rot = jnp.broadcast_to(rd, line_pos.shape[:-1])
    closest = G.closest_point_line(
        line_pos, line_rot, jnp.full_like(line_rot, max_range), s_pos, limit_to_line_length=False
    )

    d = s_pos - closest
    d_norm = safe_norm(d)
    ray_intersects = d_norm < s_rad
    a = s_rad**2 - d_norm**2
    m = jnp.sqrt(jnp.where(a > 0, a, 1e-8))

    u = s_pos - ro
    u1 = closest - ro
    sphere_is_in_front = jnp.sum(u * ray_dir_world, axis=-1) > 0.0
    dist = safe_norm(u1) - m
    return jnp.where(ray_intersects & sphere_is_in_front, dist, max_range)


def cast_rays_to_line(line_pos, line_rot, line_length, ray_origin, ray_direction, max_range):
    """Reference core.py:1543-1625. Returns [B, N, R]."""
    ro = ray_origin[:, None, None, :]
    rd = ray_direction[:, None, :]
    l_pos = line_pos[:, :, None, :]
    l_rot = line_rot[:, :, None]
    l_len = line_length[:, :, None]

    r = jnp.stack([jnp.cos(l_rot), jnp.sin(l_rot)], axis=-1) * l_len[..., None]
    s = jnp.stack([jnp.cos(rd), jnp.sin(rd)], axis=-1)
    s = jnp.broadcast_to(s, r.shape[:1] + (r.shape[1],) + s.shape[2:])

    rxs = JaxUtils.cross(r, s)
    qp = ro - l_pos
    t = safe_div(JaxUtils.cross(qp, s), rxs)
    u = safe_div(JaxUtils.cross(qp, r), rxs)
    d = jnp.abs(u)  # == |u * s| since |s| == 1 (reference core.py:1614)

    no_hit = (rxs == 0.0) | (t > 0.5) | (t < -0.5) | (u < 0.0)
    return jnp.where(no_hit, max_range, d)


def cast_rays(world, state, entity, angles, max_range, entity_filter=lambda _: False):
    """Fully vectorized multi-ray cast (reference cast_rays, core.py:1661-1785).

    ``angles``: [B, R] world-frame ray directions. Entity bucketing by shape is
    resolved at trace time from the static entity list + filter.
    """
    pos = entity.pos(state)
    B = pos.shape[0]
    dists = [jnp.full_like(angles, max_range)[..., None]]  # [B, R, 1]

    boxes, spheres, lines = [], [], []
    for e in world.entities:
        if e is entity or not entity_filter(e):
            continue
        assert e.collides(entity) and entity.collides(e), "Rays are only casted among collidables"
        if isinstance(e.shape, Box):
            boxes.append(e)
        elif isinstance(e.shape, Sphere):
            spheres.append(e)
        elif isinstance(e.shape, Line):
            lines.append(e)
        else:
            raise RuntimeError(f"Shape {e.shape} currently not handled by cast_ray")

    if boxes:
        idx = np.asarray([e.index for e in boxes], np.int32)
        length = jnp.broadcast_to(
            jnp.asarray([e.shape.length for e in boxes], jnp.float32)[None], (B, len(boxes))
        )
        width = jnp.broadcast_to(
            jnp.asarray([e.shape.width for e in boxes], jnp.float32)[None], (B, len(boxes))
        )
        d = cast_rays_to_box(state.pos[:, idx], state.rot[:, idx], length, width, pos, angles, max_range)
        dists.append(jnp.moveaxis(d, 1, -1))  # [B, R, N]
    if spheres:
        idx = np.asarray([e.index for e in spheres], np.int32)
        radius = jnp.broadcast_to(
            jnp.asarray([e.shape.radius for e in spheres], jnp.float32)[None], (B, len(spheres))
        )
        d = cast_rays_to_sphere(state.pos[:, idx], radius, pos, angles, max_range)
        dists.append(jnp.moveaxis(d, 1, -1))
    if lines:
        idx = np.asarray([e.index for e in lines], np.int32)
        length = jnp.broadcast_to(
            jnp.asarray([e.shape.length for e in lines], jnp.float32)[None], (B, len(lines))
        )
        d = cast_rays_to_line(state.pos[:, idx], state.rot[:, idx], length, pos, angles, max_range)
        dists.append(jnp.moveaxis(d, 1, -1))

    return jnp.min(jnp.concatenate(dists, axis=-1), axis=-1)  # [B, R]


def cast_ray(world, state, entity, angles, max_range, entity_filter=lambda _: False):
    """Single-ray API (reference cast_ray, core.py:1627-1659). ``angles``: [B].

    Numerically identical to :func:`cast_rays` with one ray — kept for API
    parity and as the oracle in the vectorized-lidar equivalence test
    (reference tests/test_lidar.py:10-28).
    """
    return cast_rays(world, state, entity, angles[:, None], max_range, entity_filter)[:, 0]
