"""Analytic sphere intersection: dense quadratic tests, TPU-style.

TPU-native analog of the reference's procedural sphere hits — ``ray_sphere``
(src/Shaders/common.h:163-173) committed inside the RayQuery loop
(src/Shaders/common/intersection.hlsli:105-117). Scenes carry few analytic
spheres (they are primitives, not tessellations), so every ray tests every
sphere as one dense [N, S] computation — no hierarchy, no gathers, pure
VPU math, exact silhouettes at any zoom.

Sphere hits are reported through the SAME HitRecord as triangles: the
``tri`` id is offset by the triangle count (tri >= T means sphere tri-T)
and ``bary`` carries the spherical (u, v) = (phi/2pi, theta/pi) of the hit,
from which shading reconstructs position/normal/uv (shading_data.hlsli's
sphere branch, 93-105).
"""

from __future__ import annotations

import jax.numpy as jnp

from stratum_tpu.core import math as smath
from stratum_tpu.ops.intersect import T_MAX


def sphere_uv(unit_dir):
    """Spherical uv of a unit direction from the sphere center
    (equirect convention shared with the environment mapping)."""
    uv = smath.cartesian_to_spherical_uv(unit_dir)
    return uv


def intersect_spheres(center, radius, origin, direction, t_min=1e-4,
                      t_max=None):
    """Closest analytic sphere hit per ray. center [S,3], radius [S]
    (radius <= 0 rows never hit). Returns (t [N], sid [N] (-1 miss),
    uv [N,2])."""
    n = origin.shape[0]
    if t_max is None:
        t_max = jnp.full((n,), T_MAX, jnp.float32)
    oc = origin[:, None, :] - center[None, :, :]  # [N,S,3]
    b = jnp.einsum("nsk,nk->ns", oc, direction)
    c = jnp.sum(oc * oc, axis=-1) - (radius * radius)[None, :]
    disc = b * b - c
    ok = (disc >= 0.0) & (radius > 0.0)[None, :]
    sq = jnp.sqrt(jnp.maximum(disc, 0.0))
    t0 = -b - sq
    t1 = -b + sq
    t = jnp.where(t0 > t_min, t0, t1)
    valid = ok & (t > t_min) & (t < t_max[:, None])
    t = jnp.where(valid, t, T_MAX)
    sid = jnp.argmin(t, axis=1)
    t_best = jnp.take_along_axis(t, sid[:, None], axis=1)[:, 0]
    hit = t_best < T_MAX
    sid = jnp.where(hit, sid, -1)
    p = origin + direction * t_best[:, None]
    ctr = center[jnp.maximum(sid, 0)]
    r = jnp.maximum(radius[jnp.maximum(sid, 0)], 1e-12)
    nrm = (p - ctr) / r[:, None]
    uv = sphere_uv(nrm)
    return jnp.where(hit, t_best, T_MAX), sid, jnp.where(
        hit[:, None], uv, 0.0
    )


def occluded_spheres(center, radius, origin, direction, t_max, t_min=1e-4):
    """Any analytic sphere within the segment?"""
    oc = origin[:, None, :] - center[None, :, :]
    b = jnp.einsum("nsk,nk->ns", oc, direction)
    c = jnp.sum(oc * oc, axis=-1) - (radius * radius)[None, :]
    disc = b * b - c
    ok = (disc >= 0.0) & (radius > 0.0)[None, :]
    sq = jnp.sqrt(jnp.maximum(disc, 0.0))
    t0 = -b - sq
    t1 = -b + sq
    t = jnp.where(t0 > t_min, t0, t1)
    limit = (t_max * (1.0 - 1e-3))[:, None]
    return jnp.any(ok & (t > t_min) & (t < limit), axis=1)
