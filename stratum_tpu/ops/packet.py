"""Packet traversal: ray blocks x fat leaves, with MXU leaf tests.

The scaling answer for large scenes. Per-ray pointer-chasing traversal is
hostile to TPUs (gathers cost ~5 ns/row, ops/bvh.py measures 0.15 Mrays/s),
and dense all-triangle tests (ops/mxu.py) scale linearly with scene size.
This module is the middle ground, built entirely from TPU-fast primitives:

1. triangles are Morton-sorted and grouped into **fat leaves** of
   ``leaf_size`` consecutive triangles with precomputed AABBs and Plucker
   feature blocks (contiguous per leaf -> dynamic_slice, never gather);
2. rays are processed in **blocks** (spatially coherent for primary rays;
   the wavefront sorter orders secondary rays); a chunked dense pass
   reduces every block's min entry distance to every leaf — pure
   [B, chunk] slab tests + reductions, no pointers, nothing per-ray kept;
3. each block visits its candidate leaves front-to-back (argsort of the
   [L] block entries) with an early exit when the next entry exceeds the
   block's worst committed hit; each visit is one [B, K] MXU Plucker test.

Blocks are vmapped in groups (lockstep leaf visits inside a group, groups
sequential) to bound transient memory.

The reference gets the same effect from the driver's RayQuery BVH walk
(src/Shaders/common/intersection.hlsli:65-191); this is its re-derivation
for a machine that prefers 10^4-wide dense math over 10^0-wide pointer
chasing.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from stratum_tpu.ops.intersect import HitRecord, T_MAX
from stratum_tpu.ops import mxu as smxu
from stratum_tpu.ops.bvh import morton3

DEFAULT_LEAF_SIZE = 64
DEFAULT_BLOCK = 2048
DEFAULT_GROUP = 32  # blocks vmapped together
NUM_CHUNKS = 8  # slot-ranges per leaf with their own AABBs (kernel gating)


def _chunk_aabbs_np(lo: np.ndarray, hi: np.ndarray) -> np.ndarray:
    """Per-slot AABBs [L, K, 3]x2 -> [L, 8, 6] AABBs of the 8 equal
    (ceil) slot-ranges of each leaf. Empty ranges come out big/-big, same
    as empty leaves, so the kernel's slab pretest naturally rejects them."""
    num_leaves, leaf_size, _ = lo.shape
    kc = -(-leaf_size // NUM_CHUNKS)
    pad = NUM_CHUNKS * kc - leaf_size
    big = np.float32(3.0e37)
    lo = np.pad(lo, ((0, 0), (0, pad), (0, 0)), constant_values=big)
    hi = np.pad(hi, ((0, 0), (0, pad), (0, 0)), constant_values=-big)
    clo = lo.reshape(num_leaves, NUM_CHUNKS, kc, 3).min(axis=2)
    chi = hi.reshape(num_leaves, NUM_CHUNKS, kc, 3).max(axis=2)
    return np.concatenate([clo, chi], axis=-1).astype(np.float32)


def _chunk_aabbs_jnp(lo, hi):
    """jnp twin of _chunk_aabbs_np (morton builder runs traced)."""
    num_leaves, leaf_size, _ = lo.shape
    kc = -(-leaf_size // NUM_CHUNKS)
    pad = NUM_CHUNKS * kc - leaf_size
    big = jnp.float32(3.0e37)
    lo = jnp.pad(lo, ((0, 0), (0, pad), (0, 0)), constant_values=big)
    hi = jnp.pad(hi, ((0, 0), (0, pad), (0, 0)), constant_values=-big)
    clo = lo.reshape(num_leaves, NUM_CHUNKS, kc, 3).min(axis=2)
    chi = hi.reshape(num_leaves, NUM_CHUNKS, kc, 3).max(axis=2)
    return jnp.concatenate([clo, chi], axis=-1)


class FatBVH(NamedTuple):
    """Single-level fat-leaf hierarchy over Morton-sorted triangles."""

    leaf_lo: jnp.ndarray  # f32 [L, 3]
    leaf_hi: jnp.ndarray  # f32 [L, 3]
    leaf_feat: jnp.ndarray  # f32 [L, K, 10, 4] Plucker blocks (0 = padding)
    leaf_tri: jnp.ndarray  # i32 [L, K] original tri ids (-1 = padding)
    # AABBs of 8 equal slot-ranges of each leaf (lo3 | hi3, big/-big when
    # empty): the Pallas kernel's intra-leaf chunk pretests gate the
    # matmul+epilogue to the slices of a leaf a sub-block can actually
    # reach (pallas_trace CHUNKS)
    leaf_chunk_aabb: jnp.ndarray  # f32 [L, 8, 6]

    @property
    def num_leaves(self) -> int:
        return self.leaf_lo.shape[0]

    @property
    def leaf_size(self) -> int:
        return self.leaf_tri.shape[1]


def pack_leaf_segments(
    offsets, leaf_size, seg_lo=None, seg_hi=None, alpha: float = 0.0
):
    """Greedily merge adjacent SAH leaf segments into fuller fat leaves.

    The Pallas tracer charges a visited leaf the FULL K-slab DMA + matmul
    regardless of how many real triangles it holds, so a 55%-full leaf
    (the SAH builder's typical fill at K=1024 — it splits until
    count <= K) wastes ~45% of every visit. SAH emits leaves in
    depth-first spatial order, so merging ADJACENT segments keeps boxes
    reasonably tight while pushing fill toward 100%.

    ``alpha > 0`` adds a geometric guard: a segment only joins the current
    pack if the union box's surface area is <= alpha * (sum of the two
    areas) — alpha=1 merges only when the union is no worse than the
    parts, larger alpha is greedier. alpha=0 disables the guard (pure
    fill greedy). Returns the merged offsets array."""
    offsets = np.asarray(offsets)

    def area(lo, hi):
        d = np.maximum(hi - lo, 0.0)
        return 2.0 * (d[0] * d[1] + d[1] * d[2] + d[2] * d[0])

    out = [0]
    cur_lo = cur_hi = None
    if alpha > 0 and seg_lo is not None:
        cur_lo, cur_hi = seg_lo[0].copy(), seg_hi[0].copy()
    for i in range(1, len(offsets) - 1):
        seg_end = offsets[i + 1]
        merge = (seg_end - out[-1]) <= leaf_size
        if merge and alpha > 0 and seg_lo is not None:
            u_lo = np.minimum(cur_lo, seg_lo[i])
            u_hi = np.maximum(cur_hi, seg_hi[i])
            merge = area(u_lo, u_hi) <= alpha * (
                area(cur_lo, cur_hi) + area(seg_lo[i], seg_hi[i])
            )
        if merge:
            if alpha > 0 and seg_lo is not None:
                cur_lo = np.minimum(cur_lo, seg_lo[i])
                cur_hi = np.maximum(cur_hi, seg_hi[i])
        else:
            out.append(int(offsets[i]))
            if alpha > 0 and seg_lo is not None:
                cur_lo, cur_hi = seg_lo[i].copy(), seg_hi[i].copy()
    out.append(int(offsets[-1]))
    return np.asarray(out, offsets.dtype)


# fill-aware leaf packing default for the SAH builder (see
# pack_leaf_segments): 0 = off, >0 = the union-area guard alpha.
# Sweepable on TPU via tools/sweep_leafpack.py before flipping the default.
SAH_PACK_ALPHA = 0.0


def build_fat_bvh_sah(
    positions, indices, valid_mask=None, leaf_size: int = DEFAULT_LEAF_SIZE,
    pack_alpha: float | None = None,
) -> FatBVH | None:
    """Fat leaves from the native binned-SAH builder (utils/native.py —
    the counterpart of the reference's driver-side acceleration-structure
    build, Core/AccelerationStructure.cpp). SAH leaves are spatially much
    tighter than Morton-median groups, cutting candidate visits per ray
    block. Returns None if the native library is unavailable."""
    from stratum_tpu.utils.native import sah_order
    from stratum_tpu.ops import mxu as smxu

    pos_np = np.asarray(positions, np.float32)
    idx_np = np.asarray(indices, np.int32)
    num_tris = idx_np.shape[0]
    valid_np = (
        np.ones(num_tris, bool)
        if valid_mask is None
        else np.asarray(valid_mask)
    )
    vids = np.nonzero(valid_np)[0].astype(np.int32)
    if len(vids) == 0:
        return None
    pa = SAH_PACK_ALPHA if pack_alpha is None else pack_alpha
    # with packing on, split to a FINER granule (K/8) and re-pack the
    # granules into K-sized fat leaves below: SAH segments at granule K
    # are K/2..K tris, too coarse to ever merge
    granule = leaf_size if pa == 0 else max(leaf_size // 8, 16)
    res = sah_order(pos_np, idx_np[vids], granule)
    if res is None:
        return None
    order, offsets = res
    order = vids[order]
    if pa != 0 and len(offsets) > 2:
        # per-segment AABBs for the merge guard
        c0 = pos_np[idx_np[order, 0]]
        c1 = pos_np[idx_np[order, 1]]
        c2 = pos_np[idx_np[order, 2]]
        t_lo = np.minimum(np.minimum(c0, c1), c2)
        t_hi = np.maximum(np.maximum(c0, c1), c2)
        ns = len(offsets) - 1
        seg_lo = np.empty((ns, 3), np.float32)
        seg_hi = np.empty((ns, 3), np.float32)
        for s in range(ns):
            seg_lo[s] = t_lo[offsets[s]:offsets[s + 1]].min(axis=0)
            seg_hi[s] = t_hi[offsets[s]:offsets[s + 1]].max(axis=0)
        offsets = pack_leaf_segments(
            offsets, leaf_size, seg_lo, seg_hi,
            alpha=(pa if pa > 0 else 0.0),
        )
    num_leaves = len(offsets) - 1
    slots = np.full((num_leaves, leaf_size), -1, np.int32)
    for l in range(num_leaves):
        seg = order[offsets[l] : offsets[l + 1]]
        slots[l, : len(seg)] = seg
    flat = slots.reshape(-1)
    gather = np.maximum(flat, 0)
    p0 = pos_np[idx_np[gather, 0]]
    p1 = pos_np[idx_np[gather, 1]]
    p2 = pos_np[idx_np[gather, 2]]
    ok = (flat >= 0)[:, None]
    big = np.float32(3e37)
    lo = np.where(ok, np.minimum(np.minimum(p0, p1), p2), big)
    hi = np.where(ok, np.maximum(np.maximum(p0, p1), p2), -big)
    lo = lo.reshape(num_leaves, leaf_size, 3)
    hi = hi.reshape(num_leaves, leaf_size, 3)
    leaf_lo = lo.min(axis=1)
    leaf_hi = hi.max(axis=1)
    chunk_aabb = _chunk_aabbs_np(lo, hi)
    feats = smxu.build_tri_features(
        jnp.asarray(pos_np), jnp.asarray(idx_np),
        jnp.asarray(valid_np),
    )
    leaf_feat = jnp.where(
        (flat >= 0)[:, None, None], feats[jnp.asarray(gather)], 0.0
    ).reshape(num_leaves, leaf_size, 10, 4)
    return FatBVH(
        leaf_lo=jnp.asarray(leaf_lo),
        leaf_hi=jnp.asarray(leaf_hi),
        leaf_feat=leaf_feat,
        leaf_tri=jnp.asarray(slots),
        leaf_chunk_aabb=jnp.asarray(chunk_aabb),
    )


def build_fat_bvh(
    positions, indices, valid_mask=None, leaf_size: int = DEFAULT_LEAF_SIZE
) -> FatBVH:
    """Morton-sort triangles, group ``leaf_size`` consecutive ones."""
    num_tris = indices.shape[0]
    if valid_mask is None:
        valid_mask = jnp.ones((num_tris,), bool)
    p0 = positions[indices[:, 0]]
    p1 = positions[indices[:, 1]]
    p2 = positions[indices[:, 2]]
    centroid = (p0 + p1 + p2) / 3.0
    big = jnp.float32(3.0e37)
    lo_pts = jnp.where(valid_mask[:, None], jnp.minimum(jnp.minimum(p0, p1), p2), big)
    hi_pts = jnp.where(valid_mask[:, None], jnp.maximum(jnp.maximum(p0, p1), p2), -big)
    scene_lo = jnp.min(lo_pts, axis=0)
    scene_hi = jnp.max(hi_pts, axis=0)
    extent = jnp.maximum(scene_hi - scene_lo, 1e-9)
    codes = morton3((centroid - scene_lo) / extent)
    codes = jnp.where(valid_mask, codes, np.uint32(0xFFFFFFFF))
    order = jnp.argsort(codes).astype(jnp.int32)
    sorted_valid = valid_mask[order]
    sorted_tris = jnp.where(sorted_valid, order, -1)

    num_leaves = max(1, -(-num_tris // leaf_size))
    slots = num_leaves * leaf_size
    sorted_tris = jnp.pad(
        sorted_tris, (0, slots - num_tris), constant_values=-1
    )
    feats = smxu.build_tri_features(positions, indices, valid_mask)
    gather = jnp.maximum(sorted_tris, 0)
    leaf_feat = jnp.where(
        (sorted_tris >= 0)[:, None, None], feats[gather], 0.0
    ).reshape(num_leaves, leaf_size, 10, 4)
    slo = jnp.where((sorted_tris >= 0)[:, None], lo_pts[gather], big)
    shi = jnp.where((sorted_tris >= 0)[:, None], hi_pts[gather], -big)
    slo = slo.reshape(num_leaves, leaf_size, 3)
    shi = shi.reshape(num_leaves, leaf_size, 3)
    leaf_lo = jnp.min(slo, axis=1)
    leaf_hi = jnp.max(shi, axis=1)
    return FatBVH(
        leaf_lo=leaf_lo,
        leaf_hi=leaf_hi,
        leaf_feat=leaf_feat,
        leaf_tri=sorted_tris.reshape(num_leaves, leaf_size),
        leaf_chunk_aabb=_chunk_aabbs_jnp(slo, shi),
    )


def _block_entries(fat: FatBVH, origin, direction, t_min, t_clip, chunk=256):
    """Min-over-block entry distance to every leaf AABB: [L] (inf = the
    whole block misses or enters beyond its t_clip). Chunked over leaves;
    per-ray values are reduced immediately — nothing [B, L] materializes.

    The xyz axes are scalarized so every intermediate is [B, chunk] with
    the leaf chunk on the LANE dim — a [B, chunk, 3] layout tile-pads the
    3-lane minor dim to 128 (measured 4x slower for this pass)."""
    inv_d = jnp.where(
        jnp.abs(direction) > 1e-20,
        1.0 / direction,
        jnp.sign(direction) * 1e20 + 1e20,
    )
    ox, oy, oz = origin[:, 0:1], origin[:, 1:2], origin[:, 2:3]  # [B, 1]
    ix, iy, iz = inv_d[:, 0:1], inv_d[:, 1:2], inv_d[:, 2:3]
    L = fat.num_leaves
    chunk = min(chunk, L)
    nc = -(-L // chunk)
    lo = jnp.pad(fat.leaf_lo, ((0, nc * chunk - L), (0, 0)), constant_values=3e37)
    hi = jnp.pad(fat.leaf_hi, ((0, nc * chunk - L), (0, 0)), constant_values=-3e37)
    lo = lo.reshape(nc, chunk, 3)
    hi = hi.reshape(nc, chunk, 3)
    axes = (
        lo[..., 0], lo[..., 1], lo[..., 2],
        hi[..., 0], hi[..., 1], hi[..., 2],
    )  # each [nc, chunk]

    def body(_, cb):
        lox, loy, loz, hix, hiy, hiz = (c[None, :] for c in cb)  # [1, chunk]
        t0x = (lox - ox) * ix  # [B, chunk]
        t1x = (hix - ox) * ix
        t0y = (loy - oy) * iy
        t1y = (hiy - oy) * iy
        t0z = (loz - oz) * iz
        t1z = (hiz - oz) * iz
        tn = jnp.maximum(
            jnp.maximum(jnp.minimum(t0x, t1x), jnp.minimum(t0y, t1y)),
            jnp.minimum(t0z, t1z),
        )
        tf = jnp.minimum(
            jnp.minimum(jnp.maximum(t0x, t1x), jnp.maximum(t0y, t1y)),
            jnp.maximum(t0z, t1z),
        )
        hit = (tn <= tf) & (tf >= t_min) & (tn < t_clip[:, None])
        entry = jnp.where(hit, jnp.maximum(tn, 0.0), jnp.inf)
        return None, jnp.min(entry, axis=0)  # reduce over rays NOW

    _, entries = lax.scan(body, None, axes)  # [nc, chunk]
    return entries.reshape(nc * chunk)[:L]


def _leaf_test(fat, rays, leaf, best_t, t_min):
    """One [B, K] Plucker test against leaf ``leaf``."""
    feat = lax.dynamic_index_in_dim(fat.leaf_feat, leaf, 0, keepdims=False)
    tids = lax.dynamic_index_in_dim(fat.leaf_tri, leaf, 0, keepdims=False)
    a, u, v, t = smxu._chunk_quants(rays, feat)
    valid = (
        (jnp.abs(a) > 1e-12)
        & (u >= 0.0)
        & (v >= 0.0)
        & (u + v <= 1.0)
        & (t > t_min)
        & (t < best_t[:, None])
        & (tids >= 0)[None, :]
    )
    return jnp.where(valid, t, T_MAX), u, v, tids


def _packet_closest_block(fat: FatBVH, origin, direction, t_min, t_max):
    """Closest hit for one ray block [B, 3]."""
    b = origin.shape[0]
    L = fat.num_leaves
    block_entry = _block_entries(fat, origin, direction, t_min, t_max)
    order = jnp.argsort(block_entry)  # front-to-back for the block
    sorted_entry = block_entry[order]
    num_cand = jnp.sum(jnp.isfinite(sorted_entry)).astype(jnp.int32)
    rays = smxu.ray_features(origin, direction)

    def cond(state):
        c, best_t, _, _ = state
        return (c < num_cand) & (
            sorted_entry[jnp.minimum(c, L - 1)] < jnp.max(best_t)
        )

    def body(state):
        c, best_t, best_tri, best_uv = state
        leaf = order[jnp.minimum(c, L - 1)]
        t, u, v, tids = _leaf_test(fat, rays, leaf, best_t, t_min)
        k = jnp.argmin(t, axis=-1)
        tk = jnp.take_along_axis(t, k[:, None], axis=-1)[:, 0]
        closer = tk < best_t
        best_t = jnp.where(closer, tk, best_t)
        best_tri = jnp.where(closer, tids[k], best_tri)
        uk = jnp.take_along_axis(u, k[:, None], axis=-1)[:, 0]
        vk = jnp.take_along_axis(v, k[:, None], axis=-1)[:, 0]
        best_uv = jnp.where(
            closer[:, None], jnp.stack([uk, vk], axis=-1), best_uv
        )
        return c + 1, best_t, best_tri, best_uv

    state = (
        jnp.asarray(0, jnp.int32),
        jnp.minimum(t_max, T_MAX),
        jnp.full((b,), -1, jnp.int32),
        jnp.zeros((b, 2), jnp.float32),
    )
    _, best_t, best_tri, best_uv = lax.while_loop(cond, body, state)
    best_t = jnp.where(best_tri >= 0, best_t, T_MAX)
    return HitRecord(t=best_t, tri=best_tri, bary=best_uv)


def _packet_occluded_block(fat: FatBVH, origin, direction, t_min, t_max):
    b = origin.shape[0]
    L = fat.num_leaves
    limit = t_max * np.float32(1.0 - 1e-3)
    block_entry = _block_entries(fat, origin, direction, t_min, limit)
    order = jnp.argsort(block_entry)
    sorted_entry = block_entry[order]
    num_cand = jnp.sum(jnp.isfinite(sorted_entry)).astype(jnp.int32)
    rays = smxu.ray_features(origin, direction)

    def cond(state):
        c, blocked = state
        return (c < num_cand) & ~jnp.all(blocked)

    def body(state):
        c, blocked = state
        leaf = order[jnp.minimum(c, L - 1)]
        t, _, _, _ = _leaf_test(
            fat, rays, leaf, jnp.where(blocked, 0.0, limit), t_min
        )
        return c + 1, blocked | jnp.any(t < T_MAX, axis=-1)

    state = (jnp.asarray(0, jnp.int32), jnp.zeros((b,), bool))
    _, blocked = lax.while_loop(cond, body, state)
    return blocked


def _grouped(fn_block, fat, origin, direction, extras, block, group):
    """Pad rays, vmap blocks within a group, lax.map groups sequentially."""
    n = origin.shape[0]
    per_group = block * group
    ng = -(-n // per_group)
    pad = ng * per_group - n
    o = jnp.pad(origin, ((0, pad), (0, 0))).reshape(ng, group, block, 3)
    d = jnp.pad(
        direction, ((0, pad), (0, 0)), constant_values=1.0
    ).reshape(ng, group, block, 3)
    ex = [jnp.pad(e, (0, pad)).reshape(ng, group, block) for e in extras]

    def run_group(args):
        og, dg, *exg = args
        return jax.vmap(lambda o, d, *e: fn_block(fat, o, d, *e))(og, dg, *exg)

    out = lax.map(run_group, (o, d, *ex))
    return jax.tree.map(
        lambda x: x.reshape((ng * per_group,) + x.shape[3:])[:n], out
    )


def packet_closest(
    fat: FatBVH,
    origin,
    direction,
    t_min=1e-4,
    t_max=None,
    block: int = DEFAULT_BLOCK,
    group: int = DEFAULT_GROUP,
) -> HitRecord:
    """Closest hit over the wavefront."""
    n = origin.shape[0]
    if t_max is None:
        t_max = jnp.full((n,), T_MAX, jnp.float32)
    return _grouped(
        lambda fat, o, d, tm: _packet_closest_block(fat, o, d, t_min, tm),
        fat, origin, direction, [t_max], block, group,
    )


def packet_occluded(
    fat: FatBVH,
    origin,
    direction,
    t_max,
    t_min=1e-4,
    block: int = DEFAULT_BLOCK,
    group: int = DEFAULT_GROUP,
):
    return _grouped(
        lambda fat, o, d, tm: _packet_occluded_block(fat, o, d, t_min, tm),
        fat, origin, direction, [t_max], block, group,
    )
