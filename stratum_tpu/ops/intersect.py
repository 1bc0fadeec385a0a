"""Ray/triangle intersection over ray wavefronts.

TPU-native analog of the reference's traversal entry points
(src/Shaders/common/intersection.hlsli:65-239 ``trace_ray`` /
``trace_visibility_ray``), with the hardware RayQuery replaced by batched
Moller-Trumbore evaluated as dense [rays x triangle-chunk] blocks — pure VPU
work with static shapes that XLA tiles well. The BVH (ops/bvh.py) narrows the
candidate set; this module owns the exact tests and the brute-force reference
path used for correctness oracles.

Also provides the self-intersection-robust ``ray_offset`` (integer-lattice
normal offset, intersection.hlsli:23-63).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.lax as lax
import jax.numpy as jnp
import numpy as np

from stratum_tpu.core import math as smath

T_MIN = 0.0
T_MAX = np.float32(3.4e38)
_SHADOW_EPS = np.float32(1.0 - 1e-3)


class HitRecord(NamedTuple):
    """Closest-hit result per ray (reference: committed RayQuery hit +
    barycentrics, intersection.hlsli:140-190)."""

    t: jnp.ndarray  # f32 [N]; T_MAX on miss
    tri: jnp.ndarray  # i32 [N]; -1 on miss
    bary: jnp.ndarray  # f32 [N, 2] (u toward v1, v toward v2)
    # optional fused hit payload [N, 88] (SceneData.slot_payload row of the
    # winning slot: shading row | MT coeffs | tri | material row) — carried
    # by the Pallas tracer when the caller passes a payload table, so the
    # integrator's shading/material gathers collapse into the tracer's one
    payload: jnp.ndarray | None = None
    # slot-mode intermediate (Pallas tracer + slot_payload): the winning
    # slot id [N] i32 (-1 miss) with tri/bary/payload NOT yet resolved —
    # pallas_trace.finalize_hit turns this into a full record with ONE
    # caller-order row gather. Sorted wrappers ride only (t, slot) through
    # their inverse gather (riding the full 88-col payload measured 48
    # ms/spp SLOWER e2e than re-gathering after the unsort)
    slot: jnp.ndarray | None = None

    @property
    def hit(self):
        return self.tri >= 0


def _tri_corners(positions, indices):
    p0 = positions[indices[:, 0]]
    e1 = positions[indices[:, 1]] - p0
    e2 = positions[indices[:, 2]] - p0
    return p0, e1, e2


def moller_trumbore(origin, direction, p0, e1, e2, t_min=T_MIN, t_max=None):
    """Batched Moller-Trumbore: rays [..., 3] against triangles [K, 3]
    broadcast to [..., K]. Returns (t, u, v, valid)."""
    if t_max is None:
        t_max = T_MAX
    o = origin[..., None, :]
    d = direction[..., None, :]
    h = jnp.cross(d, e2)
    a = smath.dot(e1, h)
    inv_a = jnp.where(jnp.abs(a) > 1e-12, 1.0 / jnp.where(a != 0, a, 1.0), 0.0)
    s = o - p0
    u = smath.dot(s, h) * inv_a
    q = jnp.cross(s, e1)
    v = smath.dot(d, q) * inv_a
    t = smath.dot(e2, q) * inv_a
    valid = (
        (jnp.abs(a) > 1e-12)
        & (u >= 0.0)
        & (v >= 0.0)
        & (u + v <= 1.0)
        & (t > t_min)
        & (t < t_max)
    )
    return t, u, v, valid


def intersect_brute_force(
    origin, direction, positions, indices, t_min=1e-4, t_max=None, chunk=512
) -> HitRecord:
    """Closest hit by testing every triangle, chunked to bound memory.

    The correctness oracle for the BVH path (SURVEY.md M2: "validate vs brute
    force bit-for-hit"). origin/direction: [N, 3].
    """
    if t_max is None:
        t_max = jnp.full(origin.shape[:-1], T_MAX, jnp.float32)
    num_tris = indices.shape[0]
    chunk = min(chunk, num_tris)
    num_chunks = (num_tris + chunk - 1) // chunk
    padded = num_chunks * chunk
    idx_p = jnp.pad(indices, ((0, padded - num_tris), (0, 0)))
    p0, e1, e2 = _tri_corners(positions, idx_p)
    p0 = p0.reshape(num_chunks, chunk, 3)
    e1 = e1.reshape(num_chunks, chunk, 3)
    e2 = e2.reshape(num_chunks, chunk, 3)
    # padded rows reuse triangle 0's corners but get masked by index >= num
    tri_ids = jnp.arange(padded, dtype=jnp.int32).reshape(num_chunks, chunk)

    def body(carry, tri_chunk):
        best_t, best_tri, best_uv = carry
        cp0, ce1, ce2, cids = tri_chunk
        t, u, v, valid = moller_trumbore(
            origin, direction, cp0, ce1, ce2, t_min, t_max[..., None]
        )
        valid &= cids < num_tris
        t = jnp.where(valid, t, T_MAX)
        k = jnp.argmin(t, axis=-1)
        tk = jnp.take_along_axis(t, k[..., None], axis=-1)[..., 0]
        closer = tk < best_t
        best_t = jnp.where(closer, tk, best_t)
        best_tri = jnp.where(closer, cids[k], best_tri)
        uk = jnp.take_along_axis(u, k[..., None], axis=-1)[..., 0]
        vk = jnp.take_along_axis(v, k[..., None], axis=-1)[..., 0]
        best_uv = jnp.where(
            closer[..., None], jnp.stack([uk, vk], axis=-1), best_uv
        )
        return (best_t, best_tri, best_uv), None

    init = (
        jnp.full(origin.shape[:-1], T_MAX, jnp.float32),
        jnp.full(origin.shape[:-1], -1, jnp.int32),
        jnp.zeros(origin.shape[:-1] + (2,), jnp.float32),
    )
    (best_t, best_tri, best_uv), _ = lax.scan(body, init, (p0, e1, e2, tri_ids))
    return HitRecord(t=best_t, tri=best_tri, bary=best_uv)


def occluded_brute_force(
    origin, direction, t_max, positions, indices, t_min=1e-4, chunk=512
):
    """Any-hit/shadow query: True where the segment [t_min, t_max*(1-eps)] is
    blocked (reference: trace_visibility_ray, intersection.hlsli:192-239)."""
    num_tris = indices.shape[0]
    chunk = min(chunk, num_tris)
    num_chunks = (num_tris + chunk - 1) // chunk
    padded = num_chunks * chunk
    idx_p = jnp.pad(indices, ((0, padded - num_tris), (0, 0)))
    p0, e1, e2 = _tri_corners(positions, idx_p)
    p0 = p0.reshape(num_chunks, chunk, 3)
    e1 = e1.reshape(num_chunks, chunk, 3)
    e2 = e2.reshape(num_chunks, chunk, 3)
    tri_ids = jnp.arange(padded, dtype=jnp.int32).reshape(num_chunks, chunk)
    limit = t_max * _SHADOW_EPS

    def body(blocked, tri_chunk):
        cp0, ce1, ce2, cids = tri_chunk
        _, _, _, valid = moller_trumbore(
            origin, direction, cp0, ce1, ce2, t_min, limit[..., None]
        )
        valid &= cids < num_tris
        return blocked | jnp.any(valid, axis=-1), None

    blocked0 = jnp.zeros(origin.shape[:-1], bool)
    blocked, _ = lax.scan(body, blocked0, (p0, e1, e2, tri_ids))
    return blocked


def ray_offset(position, geometric_normal):
    """Offset a point robustly off a surface along +-normal before re-tracing
    (reference: intersection.hlsli:23-63, the NVIDIA integer-lattice method).
    """
    int_scale = np.float32(256.0)
    float_scale = np.float32(1.0 / 65536.0)
    origin_thresh = np.float32(1.0 / 32.0)
    of_i = (geometric_normal * int_scale).astype(jnp.int32)
    p_i_bits = lax.bitcast_convert_type(position, jnp.int32)
    shifted = jnp.where(position < 0.0, p_i_bits - of_i, p_i_bits + of_i)
    p_i = lax.bitcast_convert_type(shifted, jnp.float32)
    return jnp.where(
        jnp.abs(position) < origin_thresh,
        position + geometric_normal * float_scale,
        p_i,
    )
