"""LBVH: Morton-ordered bounding volume hierarchy, built and traversed on
device.

TPU-native replacement for the reference's hardware acceleration structures
(src/Core/AccelerationStructure.{hpp,cpp} builds BLAS/TLAS via
``vkCmdBuildAccelerationStructuresKHR`` and traversal happens inside the
driver's RayQuery, src/Shaders/common/intersection.hlsli:65-191). On TPU both
halves must be explicit, and both are designed around XLA's strengths:

Build (all jnp, jit-safe, runs on device per scene change):
  1. triangle centroids -> 30-bit Morton codes in the scene AABB;
  2. ``argsort`` (XLA radix sort) orders triangles along the Z-curve;
  3. an **implicit complete binary tree** over fixed-size leaves of
     consecutive Morton-ordered triangles: level-by-level AABB reduction is
     just a reshape+min/max — no pointer chasing, no atomics (contrast:
     Karras-style radix trees need bottom-up atomics).

Layout: nodes are stored in **DFS (pre)order**, which makes stackless
traversal possible with a single skip link per node: for the complete tree,
``dfs(l, p) = l + p * (2^(D-l+1) - 1)`` and ``skip = dfs + subtree_size``.

Traversal: every ray holds one DFS index; each ``while_loop`` step tests the
current node's AABB and either descends (``i+1``) or follows the skip link.
Leaves test ``LEAF_SIZE`` triangles with Moller-Trumbore. All rays advance in
lockstep (dense vector ops + gathers), the wavefront analog of the
reference's per-thread RayQuery loop.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from stratum_tpu.core import math as smath
from stratum_tpu.ops.intersect import HitRecord, T_MAX, moller_trumbore

LEAF_SIZE = 4


class BVHData(NamedTuple):
    """Flattened DFS-ordered BVH (pytree; all shapes static)."""

    aabb_lo: jnp.ndarray  # f32 [num_nodes, 3]
    aabb_hi: jnp.ndarray  # f32 [num_nodes, 3]
    skip: jnp.ndarray  # i32 [num_nodes] DFS index after this subtree
    leaf_first: jnp.ndarray  # i32 [num_nodes] first slot in sorted_tris, -1 internal
    sorted_tris: jnp.ndarray  # i32 [num_leaves*LEAF_SIZE] tri ids, -1 padding
    # packed triangle corners in sorted order for contiguous leaf tests
    tri_p0: jnp.ndarray  # f32 [num_leaves*LEAF_SIZE, 3]
    tri_e1: jnp.ndarray  # f32 [num_leaves*LEAF_SIZE, 3]
    tri_e2: jnp.ndarray  # f32 [num_leaves*LEAF_SIZE, 3]

    @property
    def num_nodes(self) -> int:
        return self.skip.shape[0]


def _expand_bits(v):
    """Spread the low 10 bits of v over 30 bits (Morton interleave)."""
    v = v.astype(jnp.uint32)
    v = (v * np.uint32(0x00010001)) & np.uint32(0xFF0000FF)
    v = (v * np.uint32(0x00000101)) & np.uint32(0x0F00F00F)
    v = (v * np.uint32(0x00000011)) & np.uint32(0xC30C30C3)
    v = (v * np.uint32(0x00000005)) & np.uint32(0x49249249)
    return v


def morton3(xyz01):
    """[..., 3] coords in [0,1] -> 30-bit Morton codes."""
    q = jnp.clip(xyz01 * 1024.0, 0.0, 1023.0).astype(jnp.uint32)
    return (
        (_expand_bits(q[..., 0]) << np.uint32(2))
        | (_expand_bits(q[..., 1]) << np.uint32(1))
        | _expand_bits(q[..., 2])
    )


def _dfs_layout(depth: int):
    """Static DFS indices + skip links for the complete binary tree with
    2^depth leaves. The preorder index of node (level l, position p) is the
    number of nodes visited before it: one per ancestor level plus, for every
    right turn on the root path, the size of the skipped left subtree:
    ``dfs(l, p) = l + sum_k bit_k(p) * (2^(depth-k+1) - 1)``.
    Returns (per-level (dfs, skip) arrays, total_nodes), all numpy."""
    levels = []
    total = 2 ** (depth + 1) - 1
    for l in range(depth + 1):
        p = np.arange(2 ** l, dtype=np.int64)
        dfs = np.full(2 ** l, l, np.int64)
        for k in range(1, l + 1):
            s_k = 2 ** (depth - k + 1) - 1
            dfs += ((p >> (l - k)) & 1) * s_k
        subtree = 2 ** (depth - l + 1) - 1
        levels.append((dfs.astype(np.int32), (dfs + subtree).astype(np.int32)))
    return levels, total


def build_bvh(positions, indices, valid_mask=None) -> BVHData:
    """Build the LBVH over triangles (jnp; jit-safe for fixed shapes).

    ``valid_mask`` excludes padding triangles (tri_material < 0) from the
    hierarchy; excluded/padded slots get empty AABBs and -1 tri ids.
    """
    num_tris = indices.shape[0]
    p0 = positions[indices[:, 0]]
    p1 = positions[indices[:, 1]]
    p2 = positions[indices[:, 2]]
    if valid_mask is None:
        valid_mask = jnp.ones((num_tris,), bool)
    # degenerate padding triangles collapse to a point; exclude them
    centroid = (p0 + p1 + p2) / 3.0
    big = jnp.float32(3.0e37)
    lo_pts = jnp.where(valid_mask[:, None], jnp.minimum(jnp.minimum(p0, p1), p2), big)
    hi_pts = jnp.where(valid_mask[:, None], jnp.maximum(jnp.maximum(p0, p1), p2), -big)
    scene_lo = jnp.min(lo_pts, axis=0)
    scene_hi = jnp.max(hi_pts, axis=0)
    extent = jnp.maximum(scene_hi - scene_lo, 1e-9)
    codes = morton3((centroid - scene_lo) / extent)
    # push invalid triangles to the end of the sort
    codes = jnp.where(valid_mask, codes, np.uint32(0xFFFFFFFF))
    order = jnp.argsort(codes).astype(jnp.int32)
    sorted_valid = valid_mask[order]

    num_leaves = max(1, 1 << int(np.ceil(np.log2(max(1, (num_tris + LEAF_SIZE - 1) // LEAF_SIZE)))))
    depth = int(np.log2(num_leaves))
    slots = num_leaves * LEAF_SIZE
    pad = slots - num_tris
    sorted_tris = jnp.where(sorted_valid, order, -1)
    sorted_tris = jnp.pad(sorted_tris, (0, pad), constant_values=-1)

    # packed corners in sorted order (leaf tests read contiguous rows)
    gather = jnp.maximum(sorted_tris, 0)
    sp0 = jnp.where((sorted_tris >= 0)[:, None], p0[gather], big)
    sp1 = jnp.where((sorted_tris >= 0)[:, None], p1[gather], big)
    sp2 = jnp.where((sorted_tris >= 0)[:, None], p2[gather], big)
    tri_p0 = jnp.where((sorted_tris >= 0)[:, None], sp0, 0.0)
    tri_e1 = jnp.where((sorted_tris >= 0)[:, None], sp1 - sp0, 0.0)
    tri_e2 = jnp.where((sorted_tris >= 0)[:, None], sp2 - sp0, 0.0)

    # leaf AABBs over LEAF_SIZE consecutive sorted triangles
    slo = jnp.minimum(jnp.minimum(sp0, sp1), sp2).reshape(num_leaves, LEAF_SIZE, 3)
    shi = jnp.where(
        (sorted_tris >= 0)[:, None],
        jnp.maximum(jnp.maximum(sp0, sp1), sp2),
        -big,
    ).reshape(num_leaves, LEAF_SIZE, 3)
    leaf_lo = jnp.min(slo, axis=1)
    leaf_hi = jnp.max(shi, axis=1)

    # bottom-up level reduction (reshape + min/max — pure XLA)
    levels, total_nodes = _dfs_layout(depth)
    level_lo = [leaf_lo]
    level_hi = [leaf_hi]
    for _ in range(depth):
        cur_lo, cur_hi = level_lo[-1], level_hi[-1]
        level_lo.append(jnp.minimum(cur_lo[0::2], cur_lo[1::2]))
        level_hi.append(jnp.maximum(cur_hi[0::2], cur_hi[1::2]))
    level_lo.reverse()  # now level_lo[l] is level l (root first)
    level_hi.reverse()

    aabb_lo = jnp.full((total_nodes, 3), big, jnp.float32)
    aabb_hi = jnp.full((total_nodes, 3), -big, jnp.float32)
    skip = jnp.zeros((total_nodes,), jnp.int32)
    leaf_first = jnp.full((total_nodes,), -1, jnp.int32)
    for l, (dfs_idx, skip_idx) in enumerate(levels):
        aabb_lo = aabb_lo.at[dfs_idx].set(level_lo[l])
        aabb_hi = aabb_hi.at[dfs_idx].set(level_hi[l])
        skip = skip.at[dfs_idx].set(skip_idx)
        if l == depth:
            leaf_first = leaf_first.at[dfs_idx].set(
                (np.arange(num_leaves, dtype=np.int32) * LEAF_SIZE)
            )
    return BVHData(
        aabb_lo=aabb_lo,
        aabb_hi=aabb_hi,
        skip=skip,
        leaf_first=leaf_first,
        sorted_tris=sorted_tris,
        tri_p0=tri_p0,
        tri_e1=tri_e1,
        tri_e2=tri_e2,
    )


def _safe_inv(d):
    tiny = 1e-20
    s = jnp.where(d >= 0.0, 1.0, -1.0)
    return s / jnp.maximum(jnp.abs(d), tiny)


def _leaf_hit(bvh: BVHData, first, origin, direction, t_min, t_best):
    """Test LEAF_SIZE packed triangles starting at slot ``first`` per ray."""
    offs = jnp.arange(LEAF_SIZE, dtype=jnp.int32)
    slots = first[..., None] + offs  # [N, L]
    p0 = bvh.tri_p0[slots]  # [N, L, 3]
    e1 = bvh.tri_e1[slots]
    e2 = bvh.tri_e2[slots]
    tids = bvh.sorted_tris[slots]
    t, u, v, valid = moller_trumbore(
        origin, direction, p0, e1, e2, t_min, t_best[..., None]
    )
    valid &= tids >= 0
    t = jnp.where(valid, t, T_MAX)
    k = jnp.argmin(t, axis=-1)
    tk = jnp.take_along_axis(t, k[..., None], axis=-1)[..., 0]
    ids = jnp.take_along_axis(tids, k[..., None], axis=-1)[..., 0]
    uk = jnp.take_along_axis(u, k[..., None], axis=-1)[..., 0]
    vk = jnp.take_along_axis(v, k[..., None], axis=-1)[..., 0]
    return tk, ids, jnp.stack([uk, vk], axis=-1)


def traverse_closest(
    bvh: BVHData, origin, direction, t_min=1e-4, t_max=None
) -> HitRecord:
    """Stackless closest-hit traversal over a ray wavefront [N, 3]."""
    n = origin.shape[0]
    num_nodes = bvh.num_nodes
    if t_max is None:
        t_max = jnp.full((n,), T_MAX, jnp.float32)
    inv_d = _safe_inv(direction)

    def cond(state):
        i, _, _, _ = state
        return jnp.any(i < num_nodes)

    def body(state):
        i, best_t, best_tri, best_uv = state
        ic = jnp.minimum(i, num_nodes - 1)
        lo = bvh.aabb_lo[ic]
        hi = bvh.aabb_hi[ic]
        t0 = (lo - origin) * inv_d
        t1 = (hi - origin) * inv_d
        tn = jnp.max(jnp.minimum(t0, t1), axis=-1)
        tf = jnp.min(jnp.maximum(t0, t1), axis=-1)
        active = i < num_nodes
        box_hit = active & (tn <= tf) & (tf >= t_min) & (tn <= best_t)
        first = bvh.leaf_first[ic]
        is_leaf = first >= 0
        do_leaf = box_hit & is_leaf
        # leaf test (masked lanes still compute; dense wavefront)
        tk, ids, uvk = _leaf_hit(
            bvh, jnp.maximum(first, 0), origin, direction, t_min, best_t
        )
        closer = do_leaf & (tk < best_t)
        best_t = jnp.where(closer, tk, best_t)
        best_tri = jnp.where(closer, ids, best_tri)
        best_uv = jnp.where(closer[..., None], uvk, best_uv)
        descend = box_hit & ~is_leaf
        i_next = jnp.where(descend, ic + 1, bvh.skip[ic])
        i = jnp.where(active, i_next, i)
        return i, best_t, best_tri, best_uv

    state = (
        jnp.zeros((n,), jnp.int32),
        jnp.minimum(t_max, T_MAX),
        jnp.full((n,), -1, jnp.int32),
        jnp.zeros((n, 2), jnp.float32),
    )
    _, best_t, best_tri, best_uv = lax.while_loop(cond, body, state)
    best_t = jnp.where(best_tri >= 0, best_t, T_MAX)
    return HitRecord(t=best_t, tri=best_tri, bary=best_uv)


def traverse_occluded(bvh: BVHData, origin, direction, t_max, t_min=1e-4):
    """Any-hit traversal: stops a lane as soon as something blocks the
    segment (reference: trace_visibility_ray, intersection.hlsli:192-239)."""
    n = origin.shape[0]
    num_nodes = bvh.num_nodes
    inv_d = _safe_inv(direction)
    limit = t_max * np.float32(1.0 - 1e-3)

    def cond(state):
        i, blocked = state
        return jnp.any((i < num_nodes) & ~blocked)

    def body(state):
        i, blocked = state
        ic = jnp.minimum(i, num_nodes - 1)
        lo = bvh.aabb_lo[ic]
        hi = bvh.aabb_hi[ic]
        t0 = (lo - origin) * inv_d
        t1 = (hi - origin) * inv_d
        tn = jnp.max(jnp.minimum(t0, t1), axis=-1)
        tf = jnp.min(jnp.maximum(t0, t1), axis=-1)
        active = (i < num_nodes) & ~blocked
        box_hit = active & (tn <= tf) & (tf >= t_min) & (tn <= limit)
        first = bvh.leaf_first[ic]
        is_leaf = first >= 0
        do_leaf = box_hit & is_leaf
        tk, ids, _ = _leaf_hit(
            bvh, jnp.maximum(first, 0), origin, direction, t_min, limit
        )
        blocked = blocked | (do_leaf & (ids >= 0) & (tk < limit))
        descend = box_hit & ~is_leaf
        i_next = jnp.where(descend, ic + 1, bvh.skip[ic])
        i = jnp.where(active, i_next, i)
        return i, blocked

    state = (jnp.zeros((n,), jnp.int32), jnp.zeros((n,), bool))
    _, blocked = lax.while_loop(cond, body, state)
    return blocked
