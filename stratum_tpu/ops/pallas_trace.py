"""Pallas packet-traversal kernel: the hot inner loop on-chip.

The XLA packet tracer (ops/packet.py) pays two costs the hardware doesn't
require: a kernel launch per leaf visit (while_loop iteration) and leaf
feature gathers at XLA's ~5 ns/row. This kernel runs each ray block's whole
candidate loop inside ONE Pallas program:

- grid over ray blocks; each block's rays (16 x [B] feature rows + t_max)
  live in VMEM, LANE-MAJOR ([nb, 16, B] — a [nb, B, 16] layout would be
  tile-padded 16 -> 128 lanes, an 8x HBM blowup);
- the block's candidate leaf ids + entry distances (computed and sorted
  front-to-back by XLA once per wave) are DMA'd into SMEM at block start;
- each visit first runs a per-ray slab pre-test of the leaf's AABB against
  each ray's CURRENT best-t: leaves no ray can improve on skip the matmul +
  epilogue entirely. The whole per-leaf AABB table ([L, R, 8] f32, tens of
  KB) rides the scalar-prefetch path and stays SMEM-resident — the per-visit
  AABB DMA ring this replaces was pure fixed cost (start+wait+semaphore
  per visit);
- surviving visits DMA the leaf's packed feature slab [16, 4K] from HBM
  into a double-buffered VMEM scratch (the next leaf's DMA overlaps the
  current leaf's math) and run one [16,4K]^T x [16,B] MXU matmul at HIGHEST
  precision — all four Moller-Trumbore quantities for K triangles at once,
  [4K, B] so the epilogue reduces over sublanes and rays stay on lanes;
- a while loop stops as soon as the next candidate's entry exceeds the
  block's worst committed hit (front-to-back early exit).

This is the TPU-native replacement for the reference's hardware RayQuery
loop (src/Shaders/common/intersection.hlsli:65-191): DMA + MXU instead of
a triangle unit, ray blocks instead of warps.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from stratum_tpu.ops.intersect import HitRecord, T_MAX

BLOCK = 512  # rays per block (8x64 screen tile)
FEAT_ROWS = 16  # 10 Plucker rows zero-padded to the f32 sublane tile

# Moller-Trumbore matmul mode. Mosaic lowers ANY explicit lax.Precision
# enum on an f32 matmul to the slow full-f32 multi-pass path (HIGHEST, HIGH
# and DEFAULT all measured ~identical), while precision=None lowers to a
# single bf16 pass with f32 accumulation — ~4x faster per secondary wave.
#   "c48"  : x3's three bf16 split products STACKED INTO THE CONTRACTION
#            dim — slab bands [s_hi; s_lo; s_hi] x ray bands
#            [r_hi; r_hi; r_lo], C=48, ONE pass. The MXU charges a full
#            128-deep systolic pass for ANY contraction <= 128 (measured:
#            per-sub-visit time == the padded-C theoretical matmul time),
#            so the extra 32 rows are free and the emulation passes
#            collapse 3 -> 1. Same three products as "x3", summed in the
#            MXU's f32 accumulator instead of VPU adds (~2^-21 relative).
#            Slab slabs are stored pre-split as bf16 [L, 32, 4K] — HALF
#            the f32 DMA bytes; the third band is one in-kernel copy.
#   "fast" : 1-pass bf16 inputs; t AND hit/miss classification stay bf16
#            (5-8.5% wrong hits measured) — kept only for ablation
#   "x3"   : manual bf16 hi/lo split, 3 passes — ~2^-21 relative, the
#            classic f32-emulation middle ground
#   "f32"  : explicit HIGHEST (6-pass) — the exact reference path
MT_MODE = "c48"
# Select the per-ray argmin by packing the candidate index into the low bits
# of the t float's bit pattern and taking ONE int min-reduction (positive
# floats order as ints), instead of argmin + one-hot + sum. Perturbs t by
# <= 2^-13 relative (low bits cleared) — below the tracer's 1e-4 epsilon.
PACKED_ARGMIN = True
_IDX_BITS = 10  # supports leaf_size up to 1024
# candidate DMA slots (ring): prefetch depth is NBUF-1. Depth 2 measured
# NEUTRAL end-to-end (3.358 vs 3.354 Mrays/s) — the depth-1 double buffer
# already hides the leaf slab + AABB transfers — so stay at 2.
NBUF = 2
# Sub-blocks per ray block: per-sub pretests let a leaf pay matmul/epilogue
# work only for the 128-lane groups whose rays can still improve. None =
# one sub per 128-lane group (measured best: secondary atrium wave
# 518 -> 334 ms at block=2048/subs=16; primary flat).
SUBS = None
# Intra-leaf chunks: the slab is packed chunk-major (CHUNKS contiguous
# slot-ranges per leaf, each with its own AABB from FatBVH.leaf_chunk_aabb)
# and every (sub, chunk) pair is pretested separately, so a sub-block pays
# the matmul + epilogue only for the slices of a leaf its rays can reach.
# MEASURED NEGATIVE on the atrium at K=1024 (tools/sweep_chunks.py):
# chunks=8 loses 1.5-3x on every wave (primary 28.3 -> 17.0 Mr/s,
# sorted secondary 233 -> 717 ms at block=2048/subs=16) — the 8x extra
# pretests + 8 small [kc, sw] matmuls per visit cost more than the
# skipped slab slices save. Default 1 = gating off; the knob stays for
# ablation (tests cover chunks in {4, 8} in interpret mode).
CHUNKS = 1
# Hierarchical candidate prep: entry distances are computed against GROUPS
# of this many DFS-adjacent leaves instead of individual leaves, then each
# hit group expands to its member leaves (same order, shared entry). The
# host-side entry pass + argsort shrink by the group factor — that pass is
# what made small leaves lose end-to-end (K=1024 was chosen for its 3.5x
# cheaper prep, not its kernel time) — while the kernel's per-(sub, leaf)
# AABB pretest gates the expanded members that the block cannot reach.
# Group entries are lower bounds of member entries (group box contains the
# leaf box), so the front-to-back early exit stays conservative/correct.
ENTRY_GROUP = 1
# Closest-kernel front-to-back early exit (the occluded kernel always
# keeps its own). On FULLY-ALIVE sorted waves the exit never fires and its
# jnp.max(best) carry costs a vector->scalar drain per visit; on
# partially-dead waves (after RR) it can cut visits. Measured e2e on the
# atrium bench config: True 1332 vs False 1361 ms/spp — the post-RR sparse
# waves win more than the per-visit sync costs on full waves (fully-alive
# sorted secondary in isolation: False wins 137.1 vs ~142). Module-level so
# the e2e A/B can flip it per process (a cached jit ignores runtime flips).
EARLY_EXIT = True
# Epilogue-only chunk gating: keep ONE full-slab matmul per surviving
# sub-block (the [48,4K]x[48,128] pass is ~130 ns — negligible) and gate
# the ~25-op VPU validity/argmin epilogue per intra-leaf chunk on the
# per-chunk AABB pretests. This isolates the half of intra-leaf gating
# that CHUNKS>1 could not: that mode also split the matmul into per-chunk
# passes, which is where it measured its 1.5-3x loss (sweep_chunks.py).
# Requires the flat (chunks=1) slab layout. Default set by tools/sweep_epi.
EPI = 1
# Deferred-merge commit path (r4 restructure): per-sub commits write their
# per-visit (t, slot) minima into disjoint lane slices of a scratch slot
# (NO best_ref read-modify-write on the commit path); the top of iteration
# c merges visit c-1's slot into best_ref (min is associative, so the
# deferred merge is exact and tie-breaking matches the serialized path),
# and the pretest gate word for visit c+1 is computed against the merged
# best (one visit stale = a larger bound = conservative) and CARRIED as a
# loop value — so no vector->scalar drain sits between a visit's gate and
# its matmuls. Motivation (STATUS r3): per-commit marginal cost measured
# 0.65-0.72 us regardless of branches — the matmul -> classify -> select
# -> best_ref chain serializes MXU and VPU — while the same commit deeply
# pipelined costs ~74 ns. Requires chunks == 1, epi == 1, packed argmin.
# Decision microbench: tools/perf_commit_pipeline.py variant "ring".
RING = False
# Group streaming (r4, "leaf-run streaming" from the roofline memo): the
# candidate unit becomes an id-aligned group of GS consecutive leaves.
# ONE DMA fetches the whole group slab ([GS*rows, 4K] is contiguous in
# the [G, GS*rows, 4K] feature layout), the per-member AABB pretests run
# as one [GS, B] vector pass (member AABB scalars broadcast onto
# sublanes), and the GS member commits unroll statically — so the
# per-visit fixed costs (DMA start/wait, gate-word drains, loop
# machinery) amortize over GS leaves. This is ENTRY_GROUP done right:
# the expansion that made groups lose (one DMA + drain per expanded
# member) is gone, which is what makes SMALL leaves (K=64..128, whose
# 4K-row slab streams are 4-8x cheaper per commit) affordable. Prep runs
# at G = L/GS width like ENTRY_GROUP. 1 = off. Uses the ring commit path
# (carried gate words, deferred merge).
# Default 4 (r4 battery 18_gs_split_e2e, atrium bench cfg at K=256):
# gs=4 everywhere 1158.7 ms/spp vs gs=1 1213.9 and the old K=512/gs=1
# default 1187.4; per-wave splits (prim-only / prim+shadow) measured
# worse than uniform. Wave-level (16_gs_waves): primary 65->55 ms at
# K=256, 89->52 at K=128/gs=8; sorted secondary prefers gs=1 in
# isolation but loses less than the shared prep savings e2e.
GS = 4
# Member-gated group DMAs: fetch each group member with its OWN DMA,
# gated by the same one-visit-ahead pretest word that gates its commits
# (a fresh word is a subset of the stale word it was fetched under, so a
# gated-out member is never read). This removes the HBM traffic for
# members no sub-block can reach — the hypothesis for why gs > 1 lost on
# incoherent (sorted-secondary) waves. MEASURED NEGATIVE on-chip
# (r4 session 4, tools/perf_gs.py): gate=1 loses on EVERY wave class
# (K=256/gs=4 primary 50.6 -> 64.0 ms in one run, occluded 157 -> 176,
# secondary 242.6 -> 246.5) and e2e (1196.1 vs 1188.7 ms/spp interleaved)
# — gs DMA starts + per-member predicated waits cost more than the
# skipped member traffic saves (the double-buffered group DMA was never
# the bound; incoherent waves lose in the matmul charge, not the DMA).
# Kept as an ablation knob (gs_gate=).
GS_GATE = False


def _effective_chunks(leaf_size: int, requested: int | None = None) -> int:
    """Largest chunk count <= requested that divides the leaf and keeps
    each chunk's 4*Kc slab columns a multiple of the 128-lane tile."""
    c = CHUNKS if requested is None else requested
    while c > 1 and (
        leaf_size % c != 0 or (4 * (leaf_size // c)) % 128 != 0
    ):
        c //= 2
    return max(c, 1)


def pack_leaf_features(
    fat, mode: str | None = None, chunks: int | None = None
) -> jnp.ndarray:
    """FatBVH -> Pallas DMA slabs, layout per MT_MODE.

    f32 modes: [L, 16, 4K] f32 — rows 0-9 = the Plucker feature matrix,
    rows 10-15 zero so a ray block can matmul the slab directly. Columns
    are CHUNK-MAJOR: for each of the ``chunks`` contiguous slot-ranges of
    Kc = K/chunks triangles, that chunk's quantity-major block
    [a(Kc) | u(Kc) | v(Kc) | t(Kc)] occupies columns
    [j*4Kc, (j+1)*4Kc) — so the kernel's per-chunk commits are plain
    static slab slices (chunks=1 reproduces the flat [a(K)|u(K)|v(K)|t(K)]
    layout). Slot numbering is unchanged: chunk j covers original slots
    [j*Kc, (j+1)*Kc), so slot ids still index leaf_tri/leaf_feat directly.

    "c48": [L, 32, 4K] bf16 — rows 0-15 = s_hi (bf16 round of the f32
    features), rows 16-31 = s_lo (bf16 of the rounding residual). The
    kernel appends a copy of s_hi as rows 32-47 so one C=48 matmul against
    ray bands [r_hi; r_hi; r_lo] yields s_hi*r_hi + s_lo*r_hi + s_hi*r_lo.
    """
    mode = MT_MODE if mode is None else mode
    L, K = fat.leaf_tri.shape
    nc = _effective_chunks(K, chunks)
    kc = K // nc
    feat = jnp.transpose(fat.leaf_feat, (0, 2, 3, 1))  # [L, 10, 4, K]
    feat = feat.reshape(L, 10, 4, nc, kc)
    feat = jnp.transpose(feat, (0, 1, 3, 2, 4))  # [L, 10, nc, 4, kc]
    feat = feat.reshape(L, 10, 4 * K)
    feat = jnp.pad(feat, ((0, 0), (0, FEAT_ROWS - 10), (0, 0)))
    # leaf-count pad to a multiple of 8 so any group-stream factor GS | 8
    # can reshape [L8, rows, 4K] -> [G, GS*rows, 4K] for free; padded
    # leaves carry zero features (a == 0 -> invalid) and inverted AABBs
    # (pack_leaf_aabbs), so they can neither pretest-pass nor commit
    L8 = -(-L // 8) * 8
    feat = jnp.pad(feat, ((0, L8 - L), (0, 0), (0, 0)))
    if mode not in ("c48", "c48w"):
        return feat
    s_hi = feat.astype(jnp.bfloat16)
    s_lo = (feat - s_hi.astype(jnp.float32)).astype(jnp.bfloat16)
    if mode == "c48w":
        # pre-banded [L, 48, 4K]: the kernel's per-visit concatenate of the
        # third band is a [16, 4K] VMEM copy PER VISIT — measured to
        # dominate the per-visit cost (see sweep_c48_config). 1.5x the DMA
        # bytes of the [32, 4K] layout, but the double-buffered transfer
        # was never the bound
        return jnp.concatenate([s_hi, s_lo, s_hi], axis=1)
    return jnp.concatenate([s_hi, s_lo], axis=1)  # [L8, 32, 4K]


def pack_leaf_aabbs(fat, chunks: int | None = None) -> jnp.ndarray:
    """FatBVH -> the kernel pretests' AABB table, SMEM-RESIDENT via the
    scalar-prefetch path (the whole table is ~8 f32 per leaf — a few tens
    of KB — so the per-visit [8,128] AABB DMA ring the kernel used to run
    was pure fixed cost: one DMA start + wait + semaphore per visit).

    chunks == 1: [L, 1, 8] f32 — leaf l's row is (lo.xyz, hi.xyz, 0, 0).

    chunks > 1: [L, nc, 8] f32 — row j of leaf l is chunk j's
    (lo.xyz, hi.xyz, 0, 0) from FatBVH.leaf_chunk_aabb."""
    nc = _effective_chunks(fat.leaf_tri.shape[1], chunks)
    if nc == 1:
        rows = jnp.concatenate(
            [fat.leaf_lo, fat.leaf_hi,
             jnp.zeros((fat.leaf_lo.shape[0], 2), jnp.float32)], axis=1
        )  # [L, 8]
        # pad to the feature table's 8-aligned leaf count with INVERTED
        # boxes (lo=+big, hi=-big): padded leaves never pretest-pass
        L = rows.shape[0]
        L8 = -(-L // 8) * 8
        if L8 != L:
            inv = jnp.concatenate(
                [jnp.full((L8 - L, 3), 3.0e38, jnp.float32),
                 jnp.full((L8 - L, 3), -3.0e38, jnp.float32),
                 jnp.zeros((L8 - L, 2), jnp.float32)], axis=1
            )
            rows = jnp.concatenate([rows, inv], axis=0)
        # LANE-MAJOR 2D layout [L16*8/128, 128]: the scalar-prefetch SMEM
        # allocation pads the MINOR dim to 128 lanes, so the natural
        # [L, 1, 8] table costs 16x its logical bytes (measured: a 3136-
        # leaf K=64 build blew the 1 MiB SMEM budget at 1.6 MB). Kernels
        # read element i = leaf*8 + q as [i // 128, i % 128].
        if rows.shape[0] % 16:
            pad = 16 - rows.shape[0] % 16
            inv = jnp.concatenate(
                [jnp.full((pad, 3), 3.0e38, jnp.float32),
                 jnp.full((pad, 3), -3.0e38, jnp.float32),
                 jnp.zeros((pad, 2), jnp.float32)], axis=1
            )
            rows = jnp.concatenate([rows, inv], axis=0)
        return rows.reshape(-1, 128)
    ca = fat.leaf_chunk_aabb  # [L, 8, 6] (lo3 | hi3)
    if nc != ca.shape[1]:
        # coarsen build-time NUM_CHUNKS ranges into nc equal unions
        L = ca.shape[0]
        g = ca.shape[1] // nc
        lo = ca[:, :, 0:3].reshape(L, nc, g, 3).min(axis=2)
        hi = ca[:, :, 3:6].reshape(L, nc, g, 3).max(axis=2)
        ca = jnp.concatenate([lo, hi], axis=-1)
    return jnp.pad(ca, ((0, 0), (0, 0), (0, 2)))  # [L, nc, 8]


def _stage_block_meta(b, cand_hbm, centry_hbm, cand_s, centry_s, csem):
    """Stage this block's candidate metadata into SMEM. The arrays are
    packed [nb, 8, C8] (element c at row c%8, col c//8) so the per-block
    slice is tile-aligned (Mosaic: sublane slices must be multiples of 8)."""
    pltpu.make_async_copy(cand_hbm.at[b], cand_s, csem.at[0]).start()
    pltpu.make_async_copy(centry_hbm.at[b], centry_s, csem.at[1]).start()
    pltpu.make_async_copy(cand_hbm.at[b], cand_s, csem.at[0]).wait()
    pltpu.make_async_copy(centry_hbm.at[b], centry_s, csem.at[1]).wait()


def _pretest(geom, aabb_sp, leaf, row, best_row):
    """Per-ray slab test of a leaf's AABB against each ray's CURRENT best-t
    — far tighter than the block-level entry test the host-side prep used.
    geom is [8, B] (origin xyz / inv_dir xyz rows); the AABB comes from the
    SMEM-resident scalar-prefetch table [L, R, 8] (no per-visit DMA).
    Returns a scalar: does ANY ray still want this leaf?
    (~20 VPU ops on [1,B] vs ~20 on [K,B].)"""
    ox, oy, oz = geom[0:1, :], geom[1:2, :], geom[2:3, :]
    ix, iy, iz = geom[3:4, :], geom[4:5, :], geom[5:6, :]
    t0x = (aabb_sp[leaf, row, 0] - ox) * ix
    t1x = (aabb_sp[leaf, row, 3] - ox) * ix
    t0y = (aabb_sp[leaf, row, 1] - oy) * iy
    t1y = (aabb_sp[leaf, row, 4] - oy) * iy
    t0z = (aabb_sp[leaf, row, 2] - oz) * iz
    t1z = (aabb_sp[leaf, row, 5] - oz) * iz
    tn = jnp.maximum(
        jnp.maximum(jnp.minimum(t0x, t1x), jnp.minimum(t0y, t1y)),
        jnp.maximum(jnp.minimum(t0z, t1z), 0.0),
    )
    tf = jnp.minimum(
        jnp.minimum(jnp.maximum(t0x, t1x), jnp.maximum(t0y, t1y)),
        jnp.maximum(t0z, t1z),
    )
    return jnp.any((tn <= tf) & (tn < best_row))


def _aabb_q(aabb_sp, leaf, q):
    """One AABB scalar: 2D tables are the lane-major R==1 layout
    ([.., 128], element i = leaf*8 + q at [i // 128, i % 128] — see
    pack_leaf_aabbs); 3D tables are the chunked [L, R, 8] layout."""
    if aabb_sp.ndim == 2:
        i = leaf * 8 + q
        return aabb_sp[i // 128, lax.rem(i, jnp.int32(128))]
    return aabb_sp[leaf, 0, q]


def _pretest_word(geom, aabb_sp, leaf, best_ref, subs):
    """All sub-blocks' pretests in ONE full-width [1, B] pass + ONE
    vector->scalar sync: bit s of the returned word = does any ray of
    sub-block s still want this leaf (same verdicts as ``subs`` calls to
    _pretest, row 0). The per-sub loop of [1,128] pretests cost ~20 vector
    ops x subs INSTRUCTION ISSUES plus subs jnp.any drains — the
    vector->scalar pipeline drain per predicate was the dominant per-visit
    cost (measured ~3.2 us/visit at subs=16 against ~0.1 us of actual
    commit math). Also returns the want popcount for the exec counter."""
    ox, oy, oz = geom[0:1, :], geom[1:2, :], geom[2:3, :]
    ix, iy, iz = geom[3:4, :], geom[4:5, :], geom[5:6, :]
    t0x = (_aabb_q(aabb_sp, leaf, 0) - ox) * ix
    t1x = (_aabb_q(aabb_sp, leaf, 3) - ox) * ix
    t0y = (_aabb_q(aabb_sp, leaf, 1) - oy) * iy
    t1y = (_aabb_q(aabb_sp, leaf, 4) - oy) * iy
    t0z = (_aabb_q(aabb_sp, leaf, 2) - oz) * iz
    t1z = (_aabb_q(aabb_sp, leaf, 5) - oz) * iz
    tn = jnp.maximum(
        jnp.maximum(jnp.minimum(t0x, t1x), jnp.minimum(t0y, t1y)),
        jnp.maximum(jnp.minimum(t0z, t1z), 0.0),
    )
    tf = jnp.minimum(
        jnp.minimum(jnp.maximum(t0x, t1x), jnp.maximum(t0y, t1y)),
        jnp.maximum(t0z, t1z),
    )
    hit = (tn <= tf) & (tn < best_ref[0:1, :])  # [1, B]
    b = hit.shape[1]
    h2 = hit.astype(jnp.int32).reshape(subs, b // subs)
    anyb = jnp.minimum(jnp.sum(h2, axis=1, keepdims=True), 1)  # [subs, 1]
    weights = jnp.left_shift(
        jnp.int32(1), lax.broadcasted_iota(jnp.int32, (subs, 1), 0)
    )
    return jnp.sum(anyb * weights), jnp.sum(anyb)


def _pretest_words_multi(geom, aabb_sp, base, gs, best_ref, subs):
    """Gate words for ``gs`` id-consecutive leaves (base .. base+gs-1) in
    ONE [gs, B] vector pass. The per-member serial version costs gs
    separate ~20-op passes on [1, B] shapes that use ONE sublane of 8 —
    the [gs, B] slab test runs the same ops at full sublane occupancy and
    amortizes instruction issue, leaving only the cheap per-member word
    extraction (a [subs, sw] reshape + sum each). Member AABB scalars are
    read from the SMEM table and assembled into [gs, 1] bound vectors with
    iota selects. Returns (tuple of gs scalar words, total want count)."""
    b = geom.shape[1]
    m_iota = lax.broadcasted_iota(jnp.int32, (gs, 1), 0)
    bounds = []
    for q in range(6):
        v = jnp.full((gs, 1), 0.0, jnp.float32)
        for m in range(gs):
            v = jnp.where(m_iota == m, _aabb_q(aabb_sp, base + m, q), v)
        bounds.append(v)
    lox, loy, loz, hix, hiy, hiz = bounds
    ox, oy, oz = geom[0:1, :], geom[1:2, :], geom[2:3, :]
    ix, iy, iz = geom[3:4, :], geom[4:5, :], geom[5:6, :]
    t0x = (lox - ox) * ix  # [gs, B]
    t1x = (hix - ox) * ix
    t0y = (loy - oy) * iy
    t1y = (hiy - oy) * iy
    t0z = (loz - oz) * iz
    t1z = (hiz - oz) * iz
    tn = jnp.maximum(
        jnp.maximum(jnp.minimum(t0x, t1x), jnp.minimum(t0y, t1y)),
        jnp.maximum(jnp.minimum(t0z, t1z), 0.0),
    )
    tf = jnp.minimum(
        jnp.minimum(jnp.maximum(t0x, t1x), jnp.maximum(t0y, t1y)),
        jnp.maximum(t0z, t1z),
    )
    hit = ((tn <= tf) & (tn < best_ref[0:1, :])).astype(jnp.int32)
    weights = jnp.left_shift(
        jnp.int32(1), lax.broadcasted_iota(jnp.int32, (subs, 1), 0)
    )
    words = []
    total = jnp.int32(0)
    for m in range(gs):
        h2 = hit[m : m + 1, :].reshape(subs, b // subs)
        anyb = jnp.minimum(jnp.sum(h2, axis=1, keepdims=True), 1)
        words.append(jnp.sum(anyb * weights))
        total = total + jnp.sum(anyb)
    return tuple(words), total


def _mt_matmul(rays, slab, mode="x3"):
    """The MXU contraction alone: [C, 4K] slab x [C, B] rays -> [4K, B]
    products. See MT_MODE. For "c48" both operands arrive pre-banded in
    bf16 ([48, *]) and a single C=48 pass computes all three split
    products in the f32 accumulator."""
    dims = (((0,), (0,)), ((), ()))

    def dot(a, b):
        return jax.lax.dot_general(
            a, b, dims, preferred_element_type=jnp.float32
        )

    if mode in ("c48", "c48w"):
        return dot(slab, rays)  # [48,4K] x [48,B] bf16, f32 acc, one pass
    if mode == "auto":
        return dot(slab, rays)  # f32 inputs, Mosaic picks the fast path
    if mode == "fast":
        return dot(slab.astype(jnp.bfloat16), rays.astype(jnp.bfloat16))
    if mode == "x3":
        s_hi = slab.astype(jnp.bfloat16)
        s_lo = (slab - s_hi.astype(jnp.float32)).astype(jnp.bfloat16)
        r_hi = rays.astype(jnp.bfloat16)
        r_lo = (rays - r_hi.astype(jnp.float32)).astype(jnp.bfloat16)
        return dot(s_hi, r_hi) + (dot(s_hi, r_lo) + dot(s_lo, r_hi))
    return jax.lax.dot_general(
        slab, rays, dims, precision=lax.Precision.HIGHEST
    )  # "f32": [4K, B]


def _mt_classify(a, u_num, v_num, t_num):
    """Sign-normalized MT validity from the four product rows [K, B] (no
    predicated reciprocal for the validity mask; the division survives only
    for the ordering value)."""
    s = jnp.sign(a)
    abs_a = a * s
    su = u_num * s
    sv = v_num * s
    stn = t_num * s
    base_valid = (
        (abs_a > 1e-12)
        # upper determinant bound: the commit's Newton reciprocal seed
        # (exponent negation) flushes to a denormal-zero for |a| beyond
        # ~1e38, which would commit a bogus t=0; MT determinants are
        # cross-product magnitudes of scene-scale edges, far below this
        & (abs_a < 1e37)
        & (su >= 0.0)
        & (sv >= 0.0)
        & (su + sv <= abs_a)
        & (stn > 1e-4 * abs_a)
    )
    return abs_a, stn, base_valid


def _mt_quants(rays, slab, k, mode="x3"):
    """Matmul + classify for one slab slice (the chunks>1 / epi=1 path)."""
    out = _mt_matmul(rays, slab, mode)
    return _mt_classify(
        out[0 * k : 1 * k, :], out[1 * k : 2 * k, :],
        out[2 * k : 3 * k, :], out[3 * k : 4 * k, :],
    )


def _select_update(valid, stn, abs_a, best_ref, slot_ref, lo_c, sw,
                   slot_base, packed_argmin):
    """Commit the per-ray winner of one classified slice [ke, sw] into
    best_ref/slot_ref (shared by the epi=1 commit and the per-chunk gated
    epilogue). slot_base = global slot id of the slice's first row."""
    best_row = best_ref[0:1, lo_c : lo_c + sw]  # [1, sw]
    valid = valid & (stn < best_row * abs_a)
    # Mosaic has no general gather: select the per-ray winner without one.
    # Barycentrics of the winner are recomputed OUTSIDE the kernel from its
    # feature row (one XLA gather) — keeping u/v here costs two more [K,B]
    # reductions per visit.
    if packed_argmin:
        # positive floats order as ints: clear the low bits of t's bit
        # pattern, pack the candidate index there, ONE min. Use +inf for
        # misses: clearing T_MAX's low bits would make a no-hit visit
        # compare strictly below best == T_MAX and commit a bogus hit
        # (inf's low mantissa bits are already 0).
        # t = stn/abs_a via exponent-negation seed + 2 Newton steps
        # (mul-only): the Mosaic f32 divide measured ~470 ns per [512,128]
        # commit — 78% of the WHOLE epilogue — while this sequence is ~9
        # VPU passes (~150 ns). Rel err <= 2^-17, below the packed-argmin
        # low-bit clearing (2^-13) this mode already documents; invalid
        # lanes (abs_a outside [1e-12, 1e37]) are masked to +inf.
        r = lax.bitcast_convert_type(
            jnp.int32(0x7EF311C3)
            - lax.bitcast_convert_type(abs_a, jnp.int32),
            jnp.float32,
        )
        r = r * (2.0 - abs_a * r)
        r = r * (2.0 - abs_a * r)
        tt = jnp.where(valid, stn * r, jnp.inf)
        mask = jnp.int32(~((1 << _IDX_BITS) - 1))
        bits = jax.lax.bitcast_convert_type(tt, jnp.int32)
        iota_k = lax.broadcasted_iota(jnp.int32, tt.shape, 0)
        packed = jnp.min(
            (bits & mask) | iota_k, axis=0, keepdims=True
        )  # [1, sw]
        tk = jax.lax.bitcast_convert_type(packed & mask, jnp.float32)
        kbest = (packed & ~mask).astype(jnp.float32)
        closer = tk < best_row
        slot_id = jnp.float32(slot_base) + kbest
    else:
        tt = jnp.where(
            valid, stn / jnp.where(abs_a > 0.0, abs_a, 1.0), T_MAX
        )
        kbest = jnp.argmin(tt, axis=0)  # [sw]
        onehot = (
            lax.broadcasted_iota(jnp.int32, tt.shape, 0) == kbest[None, :]
        ).astype(tt.dtype)
        tk = jnp.sum(tt * onehot, axis=0, keepdims=True)  # [1, sw]
        closer = tk < best_row
        slot_id = (slot_base + kbest).astype(jnp.float32)[None, :]
    best_ref[0:1, lo_c : lo_c + sw] = jnp.where(closer, tk, best_row)
    slot_ref[0:1, lo_c : lo_c + sw] = jnp.where(
        closer, slot_id, slot_ref[0:1, lo_c : lo_c + sw]
    )


def _kernel(ncand_sp, aabb_sp, rays_ref, geom_ref, cand_hbm, centry_hbm,
            feat_hbm, out_ref, buf, dsem, cand_s, centry_s, csem,
            best_ref, slot_ref, mode="x3",
            packed_argmin=PACKED_ARGMIN, subs=1, chunks=1, epi=1,
            early_exit=False, gate_mode="normal"):
    b = pl.program_id(0)
    _stage_block_meta(b, cand_hbm, centry_hbm, cand_s, centry_s, csem)
    n_cand = ncand_sp[b]
    rays = rays_ref[0]  # [16, B]
    t_max = rays[10:11, :]  # [1, B]
    # matmul operand: zero the non-feature rows — row 10 carries t_max
    # (3.4e38), which overflows to inf under the bf16 matmul modes and
    # poisons the products with 0 * inf = NaN
    rays_mm = jnp.where(
        lax.broadcasted_iota(jnp.int32, rays.shape, 0) < 10, rays, 0.0
    )
    if mode in ("c48", "c48w"):
        # band the ray operand once per block: [r_hi; r_hi; r_lo] so one
        # C=48 pass against the pre-split slab bands [s_hi; s_lo; s_hi]
        # yields all three x3 split products in the MXU's f32 accumulator
        r_hi = rays_mm.astype(jnp.bfloat16)
        r_lo = (rays_mm - r_hi.astype(jnp.float32)).astype(jnp.bfloat16)
        rays_mm = jnp.concatenate([r_hi, r_hi, r_lo], axis=0)  # [48, B]
    geom = geom_ref[0]  # [8, B]
    B = rays.shape[1]
    k4 = buf.shape[2]
    k = k4 // 4

    def cand_at(c):
        return cand_s[lax.rem(c, 8), c // 8]

    def centry_at(c):
        return centry_s[lax.rem(c, 8), c // 8]

    kc = k // chunks  # triangles per chunk (slab slice = 4*kc columns)

    def dma(slot, c):
        return pltpu.make_async_copy(
            feat_hbm.at[cand_at(c)], buf.at[slot], dsem.at[slot]
        )

    def banded_slab(slot):
        """Leaf slab as the matmul LHS; c48 appends the third band
        ([s_hi; s_lo] -> [s_hi; s_lo; s_hi]) with one in-kernel copy —
        a per-visit [16, 4K] VMEM copy c48w avoids by pre-banding."""
        slab = buf[slot]
        if mode == "c48":
            slab = jnp.concatenate([slab, slab[0:FEAT_ROWS]], axis=0)
        return slab

    best_ref[...] = t_max
    slot_ref[...] = jnp.full((1, B), -1.0, jnp.float32)

    for p in range(NBUF - 1):
        @pl.when(n_cand > p)
        def _(p=p):
            dma(p, p).start()

    def cond(state):
        c, max_best, _nex = state
        ok = c < n_cand
        if early_exit:
            # front-to-back exit once no candidate can beat the worst
            # committed hit. Off by default for the closest kernel: on
            # measured waves (primary AND sorted secondary) iters == cand
            # — the exit never fires — while the jnp.max(best_ref) each
            # body needs for it is a vector->scalar pipeline drain per
            # visit (the occluded kernel keeps it: blocked rays zero
            # their bound, so coherent shadow waves DO exit early).
            ok = ok & (centry_at(c) < max_best)
        return ok

    def body(state):
        c, max_best, nex = state
        slot = lax.rem(c, NBUF)
        nxt = c + 1
        pf = c + NBUF - 1  # prefetch NBUF-1 candidates ahead

        @pl.when(pf < n_cand)
        def _():
            dma(lax.rem(pf, NBUF), pf).start()

        leaf = cand_at(c)
        # per-(SUB, CHUNK) pretests: a leaf only pays [kc, B/subs] matmul +
        # epilogue work for the (128-lane sub-block, intra-leaf chunk)
        # pairs whose rays can still reach that slice of the leaf —
        # incoherent waves typically want 1-2 of 4 sub-blocks, and a
        # wanting sub typically reaches 1-2 of the 8 chunk boxes.
        # epi > 1 gates at the same (sub, chunk) granularity but only the
        # VPU epilogue — the matmul stays one full-slab pass per sub.
        # The default (gch == 1) path packs ALL sub verdicts into one
        # scalar word — one vector->scalar sync per visit instead of subs.
        sw = B // subs
        gch = chunks if chunks > 1 else epi
        if gch == 1:
            if gate_mode == "nogate":
                word = jnp.int32((1 << subs) - 1)
                nexec = jnp.int32(subs)
            else:
                word, nexec = _pretest_word(
                    geom, aabb_sp, leaf, best_ref, subs
                )
                if gate_mode == "forceall":
                    word = word | jnp.int32((1 << subs) - 1)
        else:
            wants = [
                [
                    _pretest(
                        geom[:, s * sw : (s + 1) * sw], aabb_sp, leaf,
                        j if gch > 1 else 0,
                        best_ref[0:1, s * sw : (s + 1) * sw],
                    )
                    for j in range(gch)
                ]
                for s in range(subs)
            ]
            nexec = wants[0][0].astype(jnp.int32)
            for s in range(subs):
                for j in range(gch):
                    if s == 0 and j == 0:
                        continue
                    nexec = nexec + wants[s][j].astype(jnp.int32)
        dma(slot, c).wait()  # started unconditionally: always consume
        slab = banded_slab(slot)

        def commit(lo_c, col0):
            abs_a, stn, base_valid = _mt_quants(
                rays_mm[:, lo_c : lo_c + sw],
                slab[:, col0 : col0 + 4 * kc], kc, mode,
            )
            _select_update(base_valid, stn, abs_a, best_ref, slot_ref,
                           lo_c, sw, leaf * k + col0 // 4, packed_argmin)

        def commit_epi(lo_c, want_row):
            # one full-slab MXU pass; per-chunk gated epilogue on its four
            # quantity row slices (flat layout: a(K) | u(K) | v(K) | t(K))
            out = _mt_matmul(rays_mm[:, lo_c : lo_c + sw], slab, mode)
            ke = k // epi
            for j in range(epi):
                @pl.when(want_row[j])
                def _(j=j):
                    abs_a, stn, base_valid = _mt_classify(
                        out[0 * k + j * ke : 0 * k + (j + 1) * ke, :],
                        out[1 * k + j * ke : 1 * k + (j + 1) * ke, :],
                        out[2 * k + j * ke : 2 * k + (j + 1) * ke, :],
                        out[3 * k + j * ke : 3 * k + (j + 1) * ke, :],
                    )
                    _select_update(base_valid, stn, abs_a, best_ref,
                                   slot_ref, lo_c, sw, leaf * k + j * ke,
                                   packed_argmin)

        if epi > 1:
            for s in range(subs):
                want_any = wants[s][0]
                for j in range(1, epi):
                    want_any = want_any | wants[s][j]
                pl.when(want_any)(
                    functools.partial(commit_epi, s * sw, wants[s])
                )
        elif chunks > 1:
            for s in range(subs):
                for j in range(chunks):
                    pl.when(wants[s][j])(
                        functools.partial(commit, s * sw, j * 4 * kc)
                    )
        elif gate_mode == "nogate":
            for s in range(subs):
                commit(s * sw, 0)
        else:
            for s in range(subs):
                pl.when((word & (1 << s)) != 0)(
                    functools.partial(commit, s * sw, 0)
                )

        new_max = jnp.max(best_ref[...]) if early_exit else max_best
        return nxt, new_max, nex + nexec

    state = (jnp.asarray(0, jnp.int32), jnp.max(t_max),
             jnp.asarray(0, jnp.int32))
    c_final, _, n_exec = lax.while_loop(cond, body, state)

    # drain: an early exit leaves the prefetched DMAs in flight; their
    # semaphores must be consumed or they corrupt later grid steps
    for p in range(NBUF - 1):
        @pl.when(c_final + p < n_cand)
        def _(p=p):
            dma(lax.rem(c_final + p, NBUF), c_final + p).wait()

    # rows 2/3: diagnostics — candidate iterations executed and matmul
    # visits actually run (tools/profile_visits.py)
    out_ref[0] = jnp.concatenate(
        [
            best_ref[...],
            slot_ref[...],
            jnp.full((1, B), c_final.astype(jnp.float32)),
            jnp.full((1, B), n_exec.astype(jnp.float32)),
        ],
        axis=0,
    )


def _popcount_word(word, subs):
    """Scalar popcount of the low ``subs`` bits (diagnostics; runs on the
    scalar core, off the vector critical path)."""
    n = jnp.int32(0)
    for s in range(subs):
        n = n + ((word >> s) & 1)
    return n


def _kernel_ring(ncand_sp, aabb_sp, rays_ref, geom_ref, cand_hbm,
                 centry_hbm, feat_hbm, out_ref, buf, dsem, cand_s, centry_s,
                 csem, best_ref, slot_ref, ring_t, ring_s, mm_buf=None,
                 mode="x3", subs=1, early_exit=False, interleave=False):
    """Deferred-merge closest kernel (see RING). Differences vs _kernel:

    - per-sub commits write their per-visit (t, slot) minima into disjoint
      lane slices of ring_t/ring_s — NO best_ref read-modify-write on the
      commit path, so the ~4 wanting subs of a visit are fully independent
      (matmul -> classify -> pack -> min-reduce -> store) chains Mosaic can
      software-pipeline across the MXU and VPU;
    - the top of iteration c merges visit c-1's slot into best_ref/slot_ref
      (min is associative and the packed (t | idx) tie-break is the same
      strict '<' the serialized path used, so results are bit-identical);
    - the pretest gate word for visit c+1 is computed AFTER this visit's
      commits are issued, against best merged through c-1 (a one-visit
      stale bound is larger, hence conservative/correct), and carried as a
      loop value — the vector->scalar drain overlaps the commit work
      instead of blocking it;
    - the early-exit bound (jnp.max of merged best) is likewise one visit
      stale: still an upper bound of the true worst committed hit, so the
      front-to-back exit stays conservative.

    Requires the flat slab layout (chunks == 1, epi == 1) and packed
    argmin. Gate diagnostics (n_exec) count popcounts of consumed words.
    """
    b = pl.program_id(0)
    _stage_block_meta(b, cand_hbm, centry_hbm, cand_s, centry_s, csem)
    n_cand = ncand_sp[b]
    rays = rays_ref[0]  # [16, B]
    t_max = rays[10:11, :]  # [1, B]
    rays_mm = jnp.where(
        lax.broadcasted_iota(jnp.int32, rays.shape, 0) < 10, rays, 0.0
    )
    if mode in ("c48", "c48w"):
        r_hi = rays_mm.astype(jnp.bfloat16)
        r_lo = (rays_mm - r_hi.astype(jnp.float32)).astype(jnp.bfloat16)
        rays_mm = jnp.concatenate([r_hi, r_hi, r_lo], axis=0)  # [48, B]
    geom = geom_ref[0]  # [8, B]
    B = rays.shape[1]
    k4 = buf.shape[2]
    k = k4 // 4
    sw = B // subs
    c_lim = jnp.int32(8 * cand_s.shape[1] - 1)

    def cand_at(c):
        return cand_s[lax.rem(c, 8), c // 8]

    def centry_at(c):
        return centry_s[lax.rem(c, 8), c // 8]

    def dma(slot, c):
        return pltpu.make_async_copy(
            feat_hbm.at[cand_at(c)], buf.at[slot], dsem.at[slot]
        )

    def banded_slab(slot):
        slab = buf[slot]
        if mode == "c48":
            slab = jnp.concatenate([slab, slab[0:FEAT_ROWS]], axis=0)
        return slab

    best_ref[...] = t_max
    slot_ref[...] = jnp.full((1, B), -1.0, jnp.float32)
    ring_t[...] = jnp.full((1, B), jnp.inf, jnp.float32)
    ring_s[...] = jnp.zeros((1, B), jnp.float32)

    for p in range(NBUF - 1):
        @pl.when(n_cand > p)
        def _(p=p):
            dma(p, p).start()

    def epilogue(abs_a, stn, valid, leaf, lo_c):
        """Classify output -> per-visit per-sub minimum into the ring slot
        (no best read)."""
        r = lax.bitcast_convert_type(
            jnp.int32(0x7EF311C3)
            - lax.bitcast_convert_type(abs_a, jnp.int32),
            jnp.float32,
        )
        r = r * (2.0 - abs_a * r)
        r = r * (2.0 - abs_a * r)
        tt = jnp.where(valid, stn * r, jnp.inf)
        mask = jnp.int32(~((1 << _IDX_BITS) - 1))
        bits = jax.lax.bitcast_convert_type(tt, jnp.int32)
        iota_k = lax.broadcasted_iota(jnp.int32, tt.shape, 0)
        packed = jnp.min((bits & mask) | iota_k, axis=0, keepdims=True)
        ring_t[0:1, lo_c : lo_c + sw] = jax.lax.bitcast_convert_type(
            packed & mask, jnp.float32
        )
        ring_s[0:1, lo_c : lo_c + sw] = (
            (packed & ~mask).astype(jnp.float32)
            + leaf.astype(jnp.float32) * jnp.float32(k)
        )

    def commit(slab, leaf, lo_c):
        abs_a, stn, valid = _mt_quants(
            rays_mm[:, lo_c : lo_c + sw], slab, k, mode
        )
        epilogue(abs_a, stn, valid, leaf, lo_c)

    def commit_mm(slab, lo_c, half):
        """Interleave phase 1: stream the slab through the MXU into a
        scratch half; the VPU epilogue runs in phase 2 so the OTHER half's
        matmul overlaps it (the [4K,sw] result materializes in VMEM either
        way — dot outputs far exceed the vector register file)."""
        mm_buf[half] = _mt_matmul(
            rays_mm[:, lo_c : lo_c + sw], slab, mode
        )

    def commit_epi(leaf, lo_c, half):
        out = mm_buf[half]
        abs_a, stn, valid = _mt_classify(
            out[0 * k : 1 * k], out[1 * k : 2 * k],
            out[2 * k : 3 * k], out[3 * k : 4 * k],
        )
        epilogue(abs_a, stn, valid, leaf, lo_c)

    def merge():
        tk = ring_t[...]
        closer = tk < best_ref[...]
        best_ref[...] = jnp.where(closer, tk, best_ref[...])
        slot_ref[...] = jnp.where(closer, ring_s[...], slot_ref[...])

    word0, _ = _pretest_word(geom, aabb_sp, cand_at(jnp.int32(0)),
                             best_ref, subs)

    def cond(state):
        c, max_best, _nex, _word = state
        ok = c < n_cand
        if early_exit:
            ok = ok & (centry_at(c) < max_best)
        return ok

    def body(state):
        c, max_best, nex, word = state
        slot = lax.rem(c, NBUF)
        nxt = c + 1
        pf = c + NBUF - 1

        @pl.when(pf < n_cand)
        def _():
            dma(lax.rem(pf, NBUF), pf).start()

        # 1. fold visit c-1's ring slot into best/slot, then re-arm the
        #    slot. Short [1, B] chains — the only loop-carried vector work.
        @pl.when(c > 0)
        def _():
            merge()
            ring_t[...] = jnp.full((1, B), jnp.inf, jnp.float32)

        leaf = cand_at(c)
        dma(slot, c).wait()
        slab = banded_slab(slot)

        # 2. this visit's commits, gated by the CARRIED word (no drain
        #    in front of the matmuls)
        if interleave:
            # sub-pair phase split: issue BOTH predicated matmuls before
            # either epilogue, so the VPU classify/pack/reduce of sub s
            # overlaps the MXU slab stream of sub s+1
            for s0 in range(0, subs, 2):
                s1 = s0 + 1
                pl.when((word & (1 << s0)) != 0)(
                    functools.partial(commit_mm, slab, s0 * sw, 0)
                )
                if s1 < subs:
                    pl.when((word & (1 << s1)) != 0)(
                        functools.partial(commit_mm, slab, s1 * sw, 1)
                    )
                pl.when((word & (1 << s0)) != 0)(
                    functools.partial(commit_epi, leaf, s0 * sw, 0)
                )
                if s1 < subs:
                    pl.when((word & (1 << s1)) != 0)(
                        functools.partial(commit_epi, leaf, s1 * sw, 1)
                    )
        else:
            for s in range(subs):
                pl.when((word & (1 << s)) != 0)(
                    functools.partial(commit, slab, leaf, s * sw)
                )

        # 3. next visit's gate word + early-exit bound: both read best
        #    merged through c-1 and are independent of step 2 — their
        #    vector->scalar drains overlap the commit work
        word_n, _ = _pretest_word(
            geom, aabb_sp, cand_at(jnp.minimum(nxt, c_lim)), best_ref, subs
        )
        new_max = jnp.max(best_ref[...]) if early_exit else max_best
        return nxt, new_max, nex + _popcount_word(word, subs), word_n

    state = (jnp.asarray(0, jnp.int32), jnp.max(t_max),
             jnp.asarray(0, jnp.int32), word0)
    c_final, _, n_exec, _ = lax.while_loop(cond, body, state)

    @pl.when(c_final > 0)
    def _():
        merge()

    for p in range(NBUF - 1):
        @pl.when(c_final + p < n_cand)
        def _(p=p):
            dma(lax.rem(c_final + p, NBUF), c_final + p).wait()

    out_ref[0] = jnp.concatenate(
        [
            best_ref[...],
            slot_ref[...],
            jnp.full((1, B), c_final.astype(jnp.float32)),
            jnp.full((1, B), n_exec.astype(jnp.float32)),
        ],
        axis=0,
    )


def _kernel_occ(ncand_sp, aabb_sp, rays_ref, geom_ref, cand_hbm,
                centry_hbm, feat_hbm, out_ref, buf, dsem, cand_s, centry_s,
                csem, best_ref, slot_ref, mode="x3",
                subs=1, chunks=1, epi=1):
    """Any-hit variant: a committed hit zeroes the ray's t bound, so the
    front-to-back loop exits as soon as every ray is blocked (or no
    candidate leaf starts inside a surviving segment) — the reference's
    shadow-ray RayQuery commits the first hit the same way
    (intersection.hlsli:192-239). Shares the per-ray AABB pre-test with the
    closest kernel."""
    b = pl.program_id(0)
    _stage_block_meta(b, cand_hbm, centry_hbm, cand_s, centry_s, csem)
    n_cand = ncand_sp[b]
    rays = rays_ref[0]  # [16, B]
    t_max = rays[10:11, :]  # [1, B] (0 for dead lanes)
    rays_mm = jnp.where(
        lax.broadcasted_iota(jnp.int32, rays.shape, 0) < 10, rays, 0.0
    )
    if mode in ("c48", "c48w"):
        r_hi = rays_mm.astype(jnp.bfloat16)
        r_lo = (rays_mm - r_hi.astype(jnp.float32)).astype(jnp.bfloat16)
        rays_mm = jnp.concatenate([r_hi, r_hi, r_lo], axis=0)  # [48, B]
    geom = geom_ref[0]  # [8, B]
    B = rays.shape[1]
    k4 = buf.shape[2]
    k = k4 // 4

    def cand_at(c):
        return cand_s[lax.rem(c, 8), c // 8]

    def centry_at(c):
        return centry_s[lax.rem(c, 8), c // 8]

    kc = k // chunks

    def dma(slot, c):
        return pltpu.make_async_copy(
            feat_hbm.at[cand_at(c)], buf.at[slot], dsem.at[slot]
        )

    def banded_slab(slot):
        slab = buf[slot]
        if mode == "c48":
            slab = jnp.concatenate([slab, slab[0:FEAT_ROWS]], axis=0)
        return slab

    best_ref[...] = t_max  # the surviving t bound; 0 = blocked/dead

    for p in range(NBUF - 1):
        @pl.when(n_cand > p)
        def _(p=p):
            dma(p, p).start()

    def cond(state):
        c, max_bound = state
        return (c < n_cand) & (centry_at(c) < max_bound)

    def body(state):
        c, _ = state
        slot = lax.rem(c, NBUF)
        nxt = c + 1
        pf = c + NBUF - 1  # prefetch NBUF-1 candidates ahead

        @pl.when(pf < n_cand)
        def _():
            dma(lax.rem(pf, NBUF), pf).start()

        leaf = cand_at(c)
        sw = B // subs
        gch = chunks if chunks > 1 else epi
        if gch == 1:
            word, _nw = _pretest_word(geom, aabb_sp, leaf, best_ref, subs)
        else:
            wants = [
                [
                    _pretest(
                        geom[:, s * sw : (s + 1) * sw], aabb_sp, leaf,
                        j if gch > 1 else 0,
                        best_ref[0:1, s * sw : (s + 1) * sw],
                    )
                    for j in range(gch)
                ]
                for s in range(subs)
            ]
        dma(slot, c).wait()
        slab = banded_slab(slot)

        def commit(lo_c, col0):
            bound = best_ref[0:1, lo_c : lo_c + sw]  # [1, sw]
            abs_a, stn, base_valid = _mt_quants(
                rays_mm[:, lo_c : lo_c + sw],
                slab[:, col0 : col0 + 4 * kc], kc, mode,
            )
            valid = base_valid & (stn < bound * abs_a)
            blocked = jnp.any(valid, axis=0, keepdims=True)  # [1, sw]
            best_ref[0:1, lo_c : lo_c + sw] = jnp.where(blocked, 0.0, bound)

        def commit_epi(lo_c, want_row):
            out = _mt_matmul(rays_mm[:, lo_c : lo_c + sw], slab, mode)
            ke = k // epi
            for j in range(epi):
                @pl.when(want_row[j])
                def _(j=j):
                    bound = best_ref[0:1, lo_c : lo_c + sw]
                    abs_a, stn, base_valid = _mt_classify(
                        out[0 * k + j * ke : 0 * k + (j + 1) * ke, :],
                        out[1 * k + j * ke : 1 * k + (j + 1) * ke, :],
                        out[2 * k + j * ke : 2 * k + (j + 1) * ke, :],
                        out[3 * k + j * ke : 3 * k + (j + 1) * ke, :],
                    )
                    valid = base_valid & (stn < bound * abs_a)
                    blocked = jnp.any(valid, axis=0, keepdims=True)
                    best_ref[0:1, lo_c : lo_c + sw] = jnp.where(
                        blocked, 0.0, bound
                    )

        if epi > 1:
            for s in range(subs):
                want_any = wants[s][0]
                for j in range(1, epi):
                    want_any = want_any | wants[s][j]
                pl.when(want_any)(
                    functools.partial(commit_epi, s * sw, wants[s])
                )
        elif chunks > 1:
            for s in range(subs):
                for j in range(chunks):
                    pl.when(wants[s][j])(
                        functools.partial(commit, s * sw, j * 4 * kc)
                    )
        else:
            for s in range(subs):
                pl.when((word & (1 << s)) != 0)(
                    functools.partial(commit, s * sw, 0)
                )

        return nxt, jnp.max(best_ref[...])

    state = (jnp.asarray(0, jnp.int32), jnp.max(t_max))
    c_final, _ = lax.while_loop(cond, body, state)

    for p in range(NBUF - 1):
        @pl.when(c_final + p < n_cand)
        def _(p=p):
            dma(lax.rem(c_final + p, NBUF), c_final + p).wait()

    blocked = (best_ref[...] <= 0.0) & (t_max > 0.0)
    # row 2: candidate iterations executed (diagnostics, profile tools)
    out_ref[0] = jnp.concatenate(
        [
            blocked.astype(jnp.float32),
            jnp.zeros((1, B), jnp.float32),
            jnp.full((1, B), c_final.astype(jnp.float32)),
            jnp.zeros((1, B), jnp.float32),
        ],
        axis=0,
    )


def _kernel_occ_ring(ncand_sp, aabb_sp, rays_ref, geom_ref, cand_hbm,
                     centry_hbm, feat_hbm, out_ref, buf, dsem, cand_s,
                     centry_s, csem, best_ref, slot_ref, ring_t, ring_s,
                     mode="x3", subs=1):
    """Deferred-merge any-hit kernel (see _kernel_ring). ring_t carries the
    per-visit blocked mask; the merge zeroes the bound one visit late. The
    t-range cull reads the one-visit-stale bound, which is EXACT here: a
    bound only ever moves t_max -> 0, so a stale t_max re-tests an
    already-blocked ray (idempotent) and never admits an out-of-range hit.
    ring_s is unused (shared scratch signature with the closest kernel)."""
    b = pl.program_id(0)
    _stage_block_meta(b, cand_hbm, centry_hbm, cand_s, centry_s, csem)
    n_cand = ncand_sp[b]
    rays = rays_ref[0]
    t_max = rays[10:11, :]
    rays_mm = jnp.where(
        lax.broadcasted_iota(jnp.int32, rays.shape, 0) < 10, rays, 0.0
    )
    if mode in ("c48", "c48w"):
        r_hi = rays_mm.astype(jnp.bfloat16)
        r_lo = (rays_mm - r_hi.astype(jnp.float32)).astype(jnp.bfloat16)
        rays_mm = jnp.concatenate([r_hi, r_hi, r_lo], axis=0)
    geom = geom_ref[0]
    B = rays.shape[1]
    k4 = buf.shape[2]
    k = k4 // 4
    sw = B // subs
    c_lim = jnp.int32(8 * cand_s.shape[1] - 1)

    def cand_at(c):
        return cand_s[lax.rem(c, 8), c // 8]

    def centry_at(c):
        return centry_s[lax.rem(c, 8), c // 8]

    def dma(slot, c):
        return pltpu.make_async_copy(
            feat_hbm.at[cand_at(c)], buf.at[slot], dsem.at[slot]
        )

    def banded_slab(slot):
        slab = buf[slot]
        if mode == "c48":
            slab = jnp.concatenate([slab, slab[0:FEAT_ROWS]], axis=0)
        return slab

    best_ref[...] = t_max  # the surviving t bound; 0 = blocked/dead
    ring_t[...] = jnp.zeros((1, B), jnp.float32)

    for p in range(NBUF - 1):
        @pl.when(n_cand > p)
        def _(p=p):
            dma(p, p).start()

    def commit(slab, lo_c):
        bound = best_ref[0:1, lo_c : lo_c + sw]  # one visit stale: exact
        abs_a, stn, base_valid = _mt_quants(
            rays_mm[:, lo_c : lo_c + sw], slab, k, mode
        )
        valid = base_valid & (stn < bound * abs_a)
        blocked = jnp.any(valid, axis=0, keepdims=True)
        ring_t[0:1, lo_c : lo_c + sw] = blocked.astype(jnp.float32)

    def merge():
        best_ref[...] = jnp.where(ring_t[...] > 0.0, 0.0, best_ref[...])

    word0, _ = _pretest_word(geom, aabb_sp, cand_at(jnp.int32(0)),
                             best_ref, subs)

    def cond(state):
        c, max_bound, _word = state
        return (c < n_cand) & (centry_at(c) < max_bound)

    def body(state):
        c, _, word = state
        slot = lax.rem(c, NBUF)
        nxt = c + 1
        pf = c + NBUF - 1

        @pl.when(pf < n_cand)
        def _():
            dma(lax.rem(pf, NBUF), pf).start()

        @pl.when(c > 0)
        def _():
            merge()
            ring_t[...] = jnp.zeros((1, B), jnp.float32)

        dma(slot, c).wait()
        slab = banded_slab(slot)

        for s in range(subs):
            pl.when((word & (1 << s)) != 0)(
                functools.partial(commit, slab, s * sw)
            )

        word_n, _ = _pretest_word(
            geom, aabb_sp, cand_at(jnp.minimum(nxt, c_lim)), best_ref, subs
        )
        return nxt, jnp.max(best_ref[...]), word_n

    state = (jnp.asarray(0, jnp.int32), jnp.max(t_max), word0)
    c_final, _, _ = lax.while_loop(cond, body, state)

    @pl.when(c_final > 0)
    def _():
        merge()

    for p in range(NBUF - 1):
        @pl.when(c_final + p < n_cand)
        def _(p=p):
            dma(lax.rem(c_final + p, NBUF), c_final + p).wait()

    blocked = (best_ref[...] <= 0.0) & (t_max > 0.0)
    out_ref[0] = jnp.concatenate(
        [
            blocked.astype(jnp.float32),
            jnp.zeros((1, B), jnp.float32),
            jnp.full((1, B), c_final.astype(jnp.float32)),
            jnp.zeros((1, B), jnp.float32),
        ],
        axis=0,
    )


def _kernel_gs(ncand_sp, aabb_sp, rays_ref, geom_ref, cand_hbm,
               centry_hbm, feat_hbm, out_ref, buf, dsem, cand_s, centry_s,
               csem, best_ref, slot_ref, ring_t, ring_s, mode="x3",
               subs=1, gs=2, early_exit=False, occluded=False,
               gated=False):
    """Group-stream kernel (see GS): the candidate unit is a group of
    ``gs`` id-consecutive leaves. ONE DMA brings the whole group slab
    ([gs*rows, 4K] contiguous), the gs member commits unroll statically,
    and the per-member gate words ride the ring kernel's carried-word
    scheme (computed one visit ahead against the deferred-merged best).
    Per-visit fixed costs amortize over gs leaves, which is what makes
    small-K slabs (with their proportionally cheaper MXU streams)
    affordable. Results are exactly the serialized kernel's: commits
    min-merge into the visit slot (packed (t | idx) ints), the slot merges
    one visit late, stale gates/bounds are conservative.

    ``occluded=True``: any-hit semantics — a member commit zeroes the
    ray's bound via the ring mask; the t-range cull against the one-visit
    stale bound is exact (bounds only move t_max -> 0).

    ``gated=True`` (see GS_GATE): each member gets its OWN DMA, started
    only when its pretest word is nonzero. The word used at start time is
    the same carried word that gates the member's commits — best_ref only
    shrinks, so a commit-gating word is always a subset of the word its
    DMA was started under, and a skipped member's stale buffer is never
    read. Requires NBUF == 2 (enforced in _run_blocks)."""
    b = pl.program_id(0)
    _stage_block_meta(b, cand_hbm, centry_hbm, cand_s, centry_s, csem)
    n_cand = ncand_sp[b]
    rays = rays_ref[0]
    t_max = rays[10:11, :]
    rays_mm = jnp.where(
        lax.broadcasted_iota(jnp.int32, rays.shape, 0) < 10, rays, 0.0
    )
    if mode in ("c48", "c48w"):
        r_hi = rays_mm.astype(jnp.bfloat16)
        r_lo = (rays_mm - r_hi.astype(jnp.float32)).astype(jnp.bfloat16)
        rays_mm = jnp.concatenate([r_hi, r_hi, r_lo], axis=0)
    geom = geom_ref[0]
    B = rays.shape[1]
    rows = buf.shape[1] // gs  # feature rows per member slab
    k4 = buf.shape[2]
    k = k4 // 4
    sw = B // subs
    c_lim = jnp.int32(8 * cand_s.shape[1] - 1)

    def cand_at(c):
        return cand_s[lax.rem(c, 8), c // 8]

    def centry_at(c):
        return centry_s[lax.rem(c, 8), c // 8]

    def dma(slot, c):
        return pltpu.make_async_copy(
            feat_hbm.at[cand_at(c)], buf.at[slot], dsem.at[slot, 0]
        )

    def dma_m(slot, c, m):
        # one member's [rows, 4K] slice of the group slab (contiguous in
        # feat_hbm's [G, gs*rows, 4K] layout); its own semaphore so gated
        # waits match gated starts member-for-member
        return pltpu.make_async_copy(
            feat_hbm.at[cand_at(c), pl.ds(m * rows, rows)],
            buf.at[slot, pl.ds(m * rows, rows)],
            dsem.at[slot, m],
        )

    def member_slab(slot, m):
        slab = buf[slot, m * rows : (m + 1) * rows]
        if mode == "c48":
            slab = jnp.concatenate([slab, slab[0:FEAT_ROWS]], axis=0)
        return slab

    best_ref[...] = t_max
    slot_ref[...] = jnp.full((1, B), -1.0, jnp.float32)
    ring_t[...] = (
        jnp.zeros((1, B), jnp.float32) if occluded
        else jnp.full((1, B), jnp.inf, jnp.float32)
    )
    ring_s[...] = jnp.zeros((1, B), jnp.float32)

    # gate words for candidate 0 (cand_at(0) may be garbage when
    # n_cand == 0 — harmless: prefetch and loop are both guarded)
    words0, _ = _pretest_words_multi(
        geom, aabb_sp, cand_at(jnp.int32(0)) * gs, gs, best_ref, subs
    )

    if gated:
        @pl.when(n_cand > 0)
        def _():
            for m in range(gs):
                pl.when(words0[m] != 0)(
                    lambda m=m: dma_m(0, jnp.int32(0), m).start()
                )
    else:
        for p in range(NBUF - 1):
            @pl.when(n_cand > p)
            def _(p=p):
                dma(p, p).start()

    def commit(slab, leaf, lo_c):
        """Member commit: min-merge this member's packed minima into the
        visit slot (members of one visit share the slot, so the write is
        a packed-int min against the slot's current content)."""
        if occluded:
            bound = best_ref[0:1, lo_c : lo_c + sw]  # stale-exact
            abs_a, stn, base_valid = _mt_quants(
                rays_mm[:, lo_c : lo_c + sw], slab, k, mode
            )
            valid = base_valid & (stn < bound * abs_a)
            blocked = jnp.any(valid, axis=0, keepdims=True)
            ring_t[0:1, lo_c : lo_c + sw] = jnp.maximum(
                ring_t[0:1, lo_c : lo_c + sw], blocked.astype(jnp.float32)
            )
            return
        abs_a, stn, valid = _mt_quants(
            rays_mm[:, lo_c : lo_c + sw], slab, k, mode
        )
        r = lax.bitcast_convert_type(
            jnp.int32(0x7EF311C3)
            - lax.bitcast_convert_type(abs_a, jnp.int32),
            jnp.float32,
        )
        r = r * (2.0 - abs_a * r)
        r = r * (2.0 - abs_a * r)
        tt = jnp.where(valid, stn * r, jnp.inf)
        mask = jnp.int32(~((1 << _IDX_BITS) - 1))
        bits = jax.lax.bitcast_convert_type(tt, jnp.int32)
        iota_k = lax.broadcasted_iota(jnp.int32, tt.shape, 0)
        packed = jnp.min((bits & mask) | iota_k, axis=0, keepdims=True)
        tk = jax.lax.bitcast_convert_type(packed & mask, jnp.float32)
        sk = (
            (packed & ~mask).astype(jnp.float32)
            + leaf.astype(jnp.float32) * jnp.float32(k)
        )
        cur = ring_t[0:1, lo_c : lo_c + sw]
        closer = tk < cur
        ring_t[0:1, lo_c : lo_c + sw] = jnp.where(closer, tk, cur)
        ring_s[0:1, lo_c : lo_c + sw] = jnp.where(
            closer, sk, ring_s[0:1, lo_c : lo_c + sw]
        )

    def merge():
        if occluded:
            best_ref[...] = jnp.where(ring_t[...] > 0.0, 0.0, best_ref[...])
        else:
            tk = ring_t[...]
            closer = tk < best_ref[...]
            best_ref[...] = jnp.where(closer, tk, best_ref[...])
            slot_ref[...] = jnp.where(closer, ring_s[...], slot_ref[...])

    def cond(state):
        c = state[0]
        ok = c < n_cand
        if early_exit or occluded:
            ok = ok & (centry_at(c) < state[1])
        return ok

    def body(state):
        c, max_best, nex = state[0], state[1], state[2]
        words = state[3:]
        slot = lax.rem(c, NBUF)
        nxt = c + 1
        pf = c + NBUF - 1

        if not gated:
            @pl.when(pf < n_cand)
            def _():
                dma(lax.rem(pf, NBUF), pf).start()

        @pl.when(c > 0)
        def _():
            merge()
            ring_t[...] = (
                jnp.zeros((1, B), jnp.float32) if occluded
                else jnp.full((1, B), jnp.inf, jnp.float32)
            )

        # next candidate's gate words (ONE [gs, B] pass for all members —
        # see _pretest_words_multi; the serial per-member version was the
        # dominant small-K machinery cost). best_ref is written ONLY by
        # merge(), so computing these before this visit's commits is
        # bit-identical to the end-of-body placement — and early enough
        # to gate the member prefetch DMAs (gated path: pf == nxt).
        g_next = cand_at(jnp.minimum(nxt, c_lim))
        words_n, _ = _pretest_words_multi(
            geom, aabb_sp, g_next * gs, gs, best_ref, subs
        )
        if gated:
            for m in range(gs):
                @pl.when((pf < n_cand) & (words_n[m] != 0))
                def _(m=m):
                    dma_m(lax.rem(pf, NBUF), pf, m).start()

        g = cand_at(c)
        if gated:
            for m in range(gs):
                pl.when(words[m] != 0)(
                    lambda m=m: dma_m(slot, c, m).wait()
                )
        else:
            dma(slot, c).wait()

        nex_add = jnp.int32(0)
        for m in range(gs):
            word = words[m]
            leaf = g * gs + m
            slab = member_slab(slot, m)
            for s in range(subs):
                pl.when((word & (1 << s)) != 0)(
                    functools.partial(commit, slab, leaf, s * sw)
                )
            nex_add = nex_add + _popcount_word(word, subs)

        new_max = (
            jnp.max(best_ref[...])
            if (early_exit or occluded)
            else max_best
        )
        return (nxt, new_max, nex + nex_add) + words_n

    state = (jnp.asarray(0, jnp.int32), jnp.max(t_max),
             jnp.asarray(0, jnp.int32)) + words0
    fin = lax.while_loop(cond, body, state)
    c_final, n_exec = fin[0], fin[2]
    words_fin = fin[3:]

    @pl.when(c_final > 0)
    def _():
        merge()

    for p in range(NBUF - 1):
        @pl.when(c_final + p < n_cand)
        def _(p=p):
            if gated:
                # NBUF == 2: the only possibly-pending DMA is candidate
                # c_final's members, started under exactly words_fin
                for m in range(gs):
                    pl.when(words_fin[m] != 0)(
                        lambda m=m: dma_m(
                            lax.rem(c_final + p, NBUF), c_final + p, m
                        ).wait()
                    )
            else:
                dma(lax.rem(c_final + p, NBUF), c_final + p).wait()

    if occluded:
        blocked = (best_ref[...] <= 0.0) & (t_max > 0.0)
        row0, row1 = blocked.astype(jnp.float32), jnp.zeros((1, B),
                                                            jnp.float32)
    else:
        row0, row1 = best_ref[...], slot_ref[...]
    out_ref[0] = jnp.concatenate(
        [
            row0,
            row1,
            jnp.full((1, B), c_final.astype(jnp.float32)),
            jnp.full((1, B), n_exec.astype(jnp.float32)),
        ],
        axis=0,
    )


def _resolve_subs(subs, block):
    if subs is not None:
        return subs
    if SUBS is not None:
        return SUBS
    return max(1, block // 128)


def _pack8(arr, fill):
    """[nb, C] -> [nb, 8, C8] with element c at (c%8, c//8); C8 is padded to
    a multiple of 128 so HBM slices stay lane-tile aligned."""
    nb, c = arr.shape
    c8 = -(-c // 8)
    c8 = -(-c8 // 128) * 128
    arr = jnp.pad(arr, ((0, 0), (0, c8 * 8 - c)), constant_values=fill)
    return jnp.transpose(arr.reshape(nb, c8, 8), (0, 2, 1))


@functools.partial(
    jax.jit,
    static_argnames=(
        "interpret", "block", "kernel_name", "mode", "packed_argmin",
        "subs", "chunks", "epi", "early_exit", "gate_mode", "ring", "gs",
        "gs_gate",
    ),
)
def _run_blocks(rays, geom, cand, centry, ncand, aabb, leaf_feat,
                interpret=False, block=BLOCK, kernel_name="closest",
                mode="x3", packed_argmin=PACKED_ARGMIN, subs=1, chunks=1,
                epi=1, early_exit=False, gate_mode="normal", ring=False,
                gs=1, gs_gate=False):
    nb, c_max = cand.shape
    if block % subs != 0:
        raise ValueError(
            f"block ({block}) must be a multiple of subs ({subs}); a "
            "truncated sub-block would leave its tail lanes untested"
        )
    k_leaf = leaf_feat.shape[-1] // 4
    if k_leaf % chunks != 0:
        raise ValueError(
            f"leaf_size {k_leaf} must be a multiple of chunks ({chunks}); "
            "use _effective_chunks to pick a valid count"
        )
    if epi > 1 and chunks > 1:
        raise ValueError(
            "epi (epilogue-only chunk gating) requires the flat chunks=1 "
            f"slab layout; got chunks={chunks}"
        )
    if epi > 1 and (k_leaf % epi != 0 or (k_leaf // epi) % 8 != 0):
        raise ValueError(
            f"leaf_size {k_leaf} must split into epi={epi} row slices of "
            "a sublane-tile multiple (8); use _effective_chunks"
        )
    if (
        kernel_name == "closest"
        and packed_argmin
        and k_leaf // chunks > (1 << _IDX_BITS)
    ):
        raise ValueError(
            f"per-chunk leaf size {k_leaf // chunks} exceeds the "
            f"packed-argmin index budget ({1 << _IDX_BITS}); rebuild the "
            "BVH with smaller leaves or raise _IDX_BITS"
        )
    ring = int(ring)
    if gs > 1:
        if chunks > 1 or epi > 1 or gate_mode != "normal" or not packed_argmin:
            raise ValueError(
                "gs (group streaming) requires the flat slab layout, "
                "normal gating and packed argmin"
            )
        L8 = leaf_feat.shape[0]
        if L8 % gs:
            raise ValueError(
                f"padded leaf count {L8} not divisible by gs={gs} "
                "(pack_leaf_features pads to a multiple of 8)"
            )
        leaf_feat = leaf_feat.reshape(
            L8 // gs, gs * leaf_feat.shape[1], leaf_feat.shape[2]
        )
    if ring and (chunks > 1 or epi > 1 or gate_mode != "normal"):
        raise ValueError(
            "ring (deferred-merge commits) requires the flat slab layout "
            f"and normal gating; got chunks={chunks} epi={epi} "
            f"gate_mode={gate_mode}"
        )
    if ring and kernel_name == "closest" and not packed_argmin:
        raise ValueError("ring requires packed_argmin (the per-visit "
                         "minimum is a packed (t | idx) int min)")
    cand8 = _pack8(cand, 0)
    centry8 = _pack8(centry, jnp.float32(3.0e38))
    c8 = cand8.shape[2]
    if gs > 1:
        kernel = functools.partial(
            _kernel_gs, mode=mode, subs=subs, gs=gs,
            early_exit=early_exit, occluded=kernel_name != "closest",
            gated=bool(gs_gate) and NBUF == 2,
        )
    elif ring:
        kernel = (
            functools.partial(
                _kernel_ring, mode=mode, subs=subs, early_exit=early_exit,
                interleave=ring >= 2,
            )
            if kernel_name == "closest"
            else functools.partial(_kernel_occ_ring, mode=mode, subs=subs)
        )
    else:
        kernel = (
            functools.partial(
                _kernel, mode=mode, packed_argmin=packed_argmin, subs=subs,
                chunks=chunks, epi=epi, early_exit=early_exit,
                gate_mode=gate_mode,
            )
            if kernel_name == "closest"
            else functools.partial(
                _kernel_occ, mode=mode, subs=subs, chunks=chunks, epi=epi
            )
        )
    return pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            # scalar-prefetch carries ncand AND the whole per-leaf AABB
            # table ([L, R, 8] f32, a few tens of KB) — SMEM-resident, so
            # pretests read it directly instead of a per-visit DMA ring
            num_scalar_prefetch=2,
            grid=(nb,),
            in_specs=[
                pl.BlockSpec((1, 16, block), lambda b, *_: (b, 0, 0),
                             memory_space=pltpu.VMEM),  # rays [nb,16,B]
                pl.BlockSpec((1, 8, block), lambda b, *_: (b, 0, 0),
                             memory_space=pltpu.VMEM),  # geom [nb,8,B]
                pl.BlockSpec(memory_space=pltpu.HBM),  # cand8 [nb, 8, C8]
                pl.BlockSpec(memory_space=pltpu.HBM),  # centry8 [nb, 8, C8]
                pl.BlockSpec(memory_space=pltpu.HBM),  # leaf features
            ],
            out_specs=pl.BlockSpec((1, 4, block), lambda b, *_: (b, 0, 0),
                                   memory_space=pltpu.VMEM),
            scratch_shapes=[
                pltpu.VMEM((NBUF,) + leaf_feat.shape[1:], leaf_feat.dtype),
                # gs > 1: one DMA semaphore per (slot, member) so gated
                # member copies wait on their own starts
                pltpu.SemaphoreType.DMA((NBUF, gs) if gs > 1 else (NBUF,)),
                pltpu.SMEM((8, c8), jnp.int32),
                pltpu.SMEM((8, c8), jnp.float32),
                pltpu.SemaphoreType.DMA((2,)),
                pltpu.VMEM((1, block), jnp.float32),  # best_ref
                pltpu.VMEM((1, block), jnp.float32),  # slot_ref
            ]
            + (
                [
                    pltpu.VMEM((1, block), jnp.float32),  # ring_t
                    pltpu.VMEM((1, block), jnp.float32),  # ring_s
                ]
                if (ring or gs > 1)
                else []
            )
            + (
                # interleave (ring=2, closest only): two [4K, sw] matmul
                # output halves so sub s+1's MXU stream overlaps sub s's
                # VPU epilogue
                [
                    pltpu.VMEM(
                        (2, leaf_feat.shape[-1], block // subs), jnp.float32
                    )
                ]
                if ring >= 2 and gs == 1 and kernel_name == "closest"
                else []
            ),
        ),
        out_shape=jax.ShapeDtypeStruct((nb, 4, block), jnp.float32),
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            has_side_effects=True,
            # v5e has 128M VMEM; the default 16M scoped budget rejects
            # larger (block, K) combinations that comfortably fit
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
    )(ncand.reshape(-1), aabb, rays, geom, cand8, centry8, leaf_feat)


def _prepare(fat, origin, direction, t_min, t_max, block, entry_group=None,
             expand=True):
    """Candidate prep. ``expand=False`` (group streaming): the candidate
    unit stays the GROUP — the kernel DMAs whole groups and unrolls member
    pretests/commits — so the returned order/entries/ncand are at G width
    and leaves are NOT expanded."""
    from stratum_tpu.ops import mxu as smxu
    from stratum_tpu.ops import packet as spacket

    n = origin.shape[0]
    L = fat.leaf_tri.shape[0]
    eg = ENTRY_GROUP if entry_group is None else entry_group
    eg = max(1, min(eg, L))
    nb = -(-n // block)
    nb = -(-nb // 8) * 8  # group-of-8 alignment for the entry pass
    pad = nb * block - n
    o = jnp.pad(origin, ((0, pad), (0, 0))).reshape(nb, block, 3)
    d = jnp.pad(direction, ((0, pad), (0, 0)), constant_values=1.0).reshape(
        nb, block, 3
    )
    tm = jnp.pad(t_max, (0, pad)).reshape(nb, block)

    if eg > 1:
        # hierarchical entries (see ENTRY_GROUP): one AABB per group of eg
        # DFS-adjacent leaves; the pass and argsort run at L/eg width
        G = -(-L // eg)
        big = jnp.float32(3.0e37)
        glo = jnp.pad(
            fat.leaf_lo, ((0, G * eg - L), (0, 0)), constant_values=big
        ).reshape(G, eg, 3).min(axis=1)
        ghi = jnp.pad(
            fat.leaf_hi, ((0, G * eg - L), (0, 0)), constant_values=-big
        ).reshape(G, eg, 3).max(axis=1)
        efat = fat._replace(leaf_lo=glo, leaf_hi=ghi)
    else:
        G = L
        efat = fat

    entries = lax.map(
        lambda args: jax.vmap(
            lambda ob, db, tb: spacket._block_entries(efat, ob, db, t_min, tb)
        )(*args),
        (
            o.reshape(-1, 8, block, 3),
            d.reshape(-1, 8, block, 3),
            tm.reshape(-1, 8, block),
        ),
    ).reshape(nb, G)
    order = jnp.argsort(entries, axis=1).astype(jnp.int32)
    sorted_entry = jnp.take_along_axis(entries, order, axis=1)
    ncand = jnp.sum(jnp.isfinite(sorted_entry), axis=1, keepdims=True).astype(
        jnp.int32
    )
    sorted_entry = jnp.where(
        jnp.isfinite(sorted_entry), sorted_entry, jnp.float32(3.0e38)
    )
    if eg > 1 and expand:
        # expand each sorted group to its member leaves (shared entry).
        # Tail members past L duplicate leaf L-1 — the kernel pretest
        # gates them and duplicate commits are idempotent.
        order = jnp.minimum(
            order[:, :, None] * eg
            + jnp.arange(eg, dtype=jnp.int32)[None, None, :],
            L - 1,
        ).reshape(nb, G * eg)
        sorted_entry = jnp.repeat(sorted_entry, eg, axis=1)
        ncand = ncand * eg
    rf = smxu.ray_features(o.reshape(-1, 3), d.reshape(-1, 3)).reshape(
        nb, block, 10
    )
    # LANE-MAJOR device layouts ([nb, rows, block]): a [nb, block, 16]
    # array would tile-pad its 16-lane minor dim to 128 (8x HBM + DMA
    # traffic blowup — measured as a 4.6G padding allocation at 10M rays)
    rays = jnp.concatenate(
        [rf, tm[..., None], jnp.zeros((nb, block, 5), jnp.float32)], axis=-1
    ).swapaxes(1, 2)  # [nb, 16, block]
    inv_d = jnp.where(
        jnp.abs(d) > 1e-20, 1.0 / d, jnp.sign(d) * 1e20 + 1e20
    )
    geom = jnp.concatenate(
        [o, inv_d, jnp.zeros((nb, block, 2), jnp.float32)], axis=-1
    ).swapaxes(1, 2)  # [nb, 8, block]
    return rays, geom, order, sorted_entry, ncand, n


def _resolve_epi(leaf_size: int, nc: int, epi_chunks: int | None) -> int:
    """Epilogue-gating chunk count: defaults to the module EPI, constrained
    like slab chunks (divides the leaf, lane-tile-aligned slices) and capped
    at the 8 chunk-AABB rows FatBVH stores. Forced to 1 when the slab is
    chunk-major (chunks>1 owns the gating then)."""
    if nc > 1:
        return 1
    e = EPI if epi_chunks is None else epi_chunks
    return _effective_chunks(leaf_size, min(max(e, 1), 8))


def pallas_closest(
    fat, leaf_feat_packed, origin, direction, t_min=1e-4, t_max=None,
    block: int = BLOCK, interpret: bool = False, subs: int | None = None,
    chunks: int | None = None, epi_chunks: int | None = None,
    entry_group: int | None = None, early_exit: bool | None = None,
    slot_payload=None, ring: int | bool | None = None,
    gs: int | None = None, gs_gate: bool | None = None,
) -> HitRecord:
    """Closest hit via the Pallas kernel. ``leaf_feat_packed`` =
    pack_leaf_features(fat) (precomputed once per scene; its chunk layout
    must match ``chunks`` — both default to _effective_chunks(K)).
    ``epi_chunks`` gates only the VPU epilogue per intra-leaf chunk (one
    full-slab matmul per sub-block; see EPI). ``entry_group`` > 1 computes
    block entries hierarchically (see ENTRY_GROUP). ``slot_payload``
    (SceneData.slot_payload): the fused [L*K, 88] hit-payload table — when
    given, ONE row gather by the winning slot replaces this function's
    feature + tri-id gathers and additionally returns the winner's shading
    + material rows in HitRecord.payload."""
    n = origin.shape[0]
    if t_max is None:
        t_max = jnp.full((n,), T_MAX, jnp.float32)
    nc = _effective_chunks(fat.leaf_tri.shape[1], chunks)
    epi = _resolve_epi(fat.leaf_tri.shape[1], nc, epi_chunks)
    g_s = GS if gs is None else gs
    if gs is None and (nc > 1 or epi > 1 or not PACKED_ARGMIN):
        g_s = 1  # chunked/epi ablation modes keep the flat-slab layout off
    if g_s > 1:
        # group streaming: candidates ARE groups (no member expansion);
        # member gating/commits unroll inside the kernel
        rays, geom, cand, centry, ncand, n = _prepare(
            fat, origin, direction, t_min, t_max, block, g_s, expand=False
        )
    else:
        rays, geom, cand, centry, ncand, n = _prepare(
            fat, origin, direction, t_min, t_max, block, entry_group
        )
    out = _run_blocks(
        rays, geom, cand, centry, ncand,
        pack_leaf_aabbs(fat, epi if epi > 1 else nc),
        leaf_feat_packed, interpret=interpret, block=block,
        mode=MT_MODE, packed_argmin=PACKED_ARGMIN,
        subs=_resolve_subs(subs, block), chunks=nc, epi=epi,
        early_exit=EARLY_EXIT if early_exit is None else early_exit,
        ring=RING if ring is None else ring, gs=g_s,
        gs_gate=GS_GATE if gs_gate is None else gs_gate,
    )  # [nb, 4, block]
    best = out[:, 0, :].reshape(-1)[:n]
    slot = out[:, 1, :].reshape(-1)[:n].astype(jnp.int32)
    k = fat.leaf_tri.shape[1]
    hit = slot >= 0
    from stratum_tpu.ops import mxu as smxu

    if slot_payload is not None:
        # SLOT MODE: defer tri/bary/payload to finalize_hit (one
        # caller-order row gather AFTER any trace-local unsort) — riding
        # resolved fields through the sorted wrapper's inverse gather
        # measured strictly worse
        return HitRecord(
            t=jnp.where(hit, best, T_MAX),
            tri=jnp.where(hit, 0, -1),
            bary=jnp.zeros((n, 2), jnp.float32),
            slot=slot,
        )
    rf = smxu.ray_features(origin, direction)  # [N, 10]
    tri = jnp.where(
        hit, fat.leaf_tri.reshape(-1)[jnp.maximum(slot, 0)], -1
    )
    payload = None
    # barycentrics of the winner: one feature-row gather + a 10-dot —
    # far cheaper than carrying two extra [K,B] reductions through
    # every leaf visit inside the kernel.
    # one [N, 40] row gather; the contraction is strided elementwise
    # ops (a batched [1,10]x[10,4] einsum lowers to tiny per-batch
    # matmuls and measured ~50ms+ at 2M rays)
    flat = fat.leaf_feat.reshape(-1, 40)[jnp.maximum(slot, 0)]  # [N,40]
    a = jnp.zeros_like(best)
    u_num = jnp.zeros_like(best)
    v_num = jnp.zeros_like(best)
    for f in range(10):
        a = a + rf[:, f] * flat[:, f * 4 + 0]
        u_num = u_num + rf[:, f] * flat[:, f * 4 + 1]
        v_num = v_num + rf[:, f] * flat[:, f * 4 + 2]
    best_t = jnp.where(tri >= 0, best, T_MAX)
    inv_a = jnp.where(jnp.abs(a) > 1e-12, 1.0 / a, 0.0)
    bary = jnp.stack([u_num * inv_a, v_num * inv_a], axis=-1)
    bary = jnp.where(hit[:, None], bary, 0.0)
    # NOTE on t precision: the committed t carries the kernel's contraction
    # precision (x3 split ~2^-21 relative; packed_argmin additionally clears
    # the low _IDX_BITS mantissa bits, <= 2^-13 relative) — both far below
    # the tracer's 1e-4 epsilon. Recomputing the winner's t exactly here
    # (one extra t_num FMA chain off the feature row) was measured to cost
    # ~190 ms per 2M-ray wave (XLA fusion regression: primary 111 -> 301
    # ms), so the kernel t is returned as-is.
    return HitRecord(t=best_t, tri=tri, bary=bary, payload=payload)


def finalize_hit(slot_payload, origin, direction, h: HitRecord) -> HitRecord:
    """Resolve a slot-mode HitRecord (see pallas_closest ``slot_payload``)
    into a full record with ONE [N, 88] row gather by the winning slot:
    tri + barycentrics (MT coeff dot with the CALLER-ORDER ray features —
    bit-identical to the classic sorted-space finalize) + the fused
    shading/material payload. No-op for already-resolved records."""
    if h.slot is None:
        return h
    from stratum_tpu.ops import mxu as smxu

    slot = h.slot
    hit = slot >= 0
    payload = slot_payload[jnp.maximum(slot, 0)]  # [N, 88] — THE gather
    tri = jnp.where(hit, payload[:, 62].astype(jnp.int32), -1)
    rf = smxu.ray_features(origin, direction)  # [N, 10]
    a = jnp.zeros_like(h.t)
    u_num = jnp.zeros_like(h.t)
    v_num = jnp.zeros_like(h.t)
    for f in range(10):
        a = a + rf[:, f] * payload[:, 32 + f * 3 + 0]
        u_num = u_num + rf[:, f] * payload[:, 32 + f * 3 + 1]
        v_num = v_num + rf[:, f] * payload[:, 32 + f * 3 + 2]
    inv_a = jnp.where(jnp.abs(a) > 1e-12, 1.0 / a, 0.0)
    bary = jnp.stack([u_num * inv_a, v_num * inv_a], axis=-1)
    bary = jnp.where(hit[:, None], bary, 0.0)
    return HitRecord(t=h.t, tri=tri, bary=bary, payload=payload, slot=None)


def pallas_occluded(
    fat, leaf_feat_packed, origin, direction, t_max, t_min=1e-4,
    block: int = BLOCK, interpret: bool = False, subs: int | None = None,
    chunks: int | None = None, epi_chunks: int | None = None,
    entry_group: int | None = None, ring: int | bool | None = None,
    gs: int | None = None, gs_gate: bool | None = None,
):
    """Any-hit through the dedicated early-exit kernel: a commit zeroes the
    ray's t bound so fully-blocked blocks stop visiting leaves immediately
    (reference: shadow RayQuery first-commit, intersection.hlsli:192-239)."""
    limit = t_max * np.float32(1.0 - 1e-3)
    nc = _effective_chunks(fat.leaf_tri.shape[1], chunks)
    epi = _resolve_epi(fat.leaf_tri.shape[1], nc, epi_chunks)
    g_s = GS if gs is None else gs
    if gs is None and (nc > 1 or epi > 1 or not PACKED_ARGMIN):
        g_s = 1  # chunked/epi ablation modes keep the flat-slab layout off
    if g_s > 1:
        rays, geom, cand, centry, ncand, n = _prepare(
            fat, origin, direction, t_min, limit, block, g_s, expand=False
        )
    else:
        rays, geom, cand, centry, ncand, n = _prepare(
            fat, origin, direction, t_min, limit, block, entry_group
        )
    out = _run_blocks(
        rays, geom, cand, centry, ncand,
        pack_leaf_aabbs(fat, epi if epi > 1 else nc),
        leaf_feat_packed, interpret=interpret, block=block,
        kernel_name="occluded", mode=MT_MODE,
        subs=_resolve_subs(subs, block), chunks=nc, epi=epi,
        ring=RING if ring is None else ring, gs=g_s,
        gs_gate=GS_GATE if gs_gate is None else gs_gate,
    )
    return out[:, 0, :].reshape(-1)[:n] > 0.5
