"""Pallas packet-traversal kernel: the hot inner loop on-chip.

The XLA packet tracer (ops/packet.py) pays two costs the hardware doesn't
require: a kernel launch per leaf visit (while_loop iteration) and leaf
feature gathers at XLA's ~5 ns/row. This kernel runs each ray block's whole
candidate loop inside ONE Pallas program:

- grid over ray blocks; each block's rays ([B, 16] Plucker features + t_max)
  live in VMEM;
- the block's candidate leaf ids + entry distances (computed and sorted
  front-to-back by XLA once per wave) are DMA'd into SMEM at block start;
- each visit DMAs one leaf's packed feature slab [16, 4K] from HBM into a
  double-buffered VMEM scratch (the next leaf's DMA overlaps the current
  leaf's math) and runs one [B,16]x[16,4K] MXU matmul at HIGHEST precision
  — all four Moller-Trumbore quantities for K triangles at once;
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


def pack_leaf_features(fat) -> jnp.ndarray:
    """FatBVH -> [L, 16, 4K] f32 DMA slabs: rows 0-9 = the Plucker feature
    matrix (quantity-major columns [a(K) | u(K) | v(K) | t(K)]), rows 10-15
    zero so a [B,16] ray block can matmul the slab directly."""
    L, K = fat.leaf_tri.shape
    feat = jnp.transpose(fat.leaf_feat, (0, 2, 3, 1))  # [L, 10, 4, K]
    feat = feat.reshape(L, 10, 4 * K)
    return jnp.pad(feat, ((0, 0), (0, FEAT_ROWS - 10), (0, 0)))


def _kernel(ncand_sp, rays_ref, cand_hbm, centry_hbm, feat_hbm, out_ref,
            buf, dsem, cand_s, centry_s, csem):
    b = pl.program_id(0)
    # stage this block's candidate metadata into SMEM. The arrays are packed
    # [nb, 8, C8] (element c at row c%8, col c//8) so the per-block slice is
    # tile-aligned (Mosaic: sublane slices must be multiples of 8).
    pltpu.make_async_copy(cand_hbm.at[b], cand_s, csem.at[0]).start()
    pltpu.make_async_copy(centry_hbm.at[b], centry_s, csem.at[1]).start()
    pltpu.make_async_copy(cand_hbm.at[b], cand_s, csem.at[0]).wait()
    pltpu.make_async_copy(centry_hbm.at[b], centry_s, csem.at[1]).wait()
    n_cand = ncand_sp[b]
    rays = rays_ref[0]  # [B, 16]
    t_max = rays_ref[0, :, 10:11]  # [B, 1]
    B = rays.shape[0]
    k4 = buf.shape[2]
    k = k4 // 4

    def cand_at(c):
        return cand_s[lax.rem(c, 8), c // 8]

    def centry_at(c):
        return centry_s[lax.rem(c, 8), c // 8]

    def dma(slot, c):
        return pltpu.make_async_copy(
            feat_hbm.at[cand_at(c)], buf.at[slot], dsem.at[slot]
        )

    @pl.when(n_cand > 0)
    def _():
        dma(0, 0).start()

    def cond(state):
        c, best_t, _, _, _ = state
        return (c < n_cand) & (centry_at(c) < jnp.max(best_t))

    def body(state):
        c, best_t, best_slot, best_u, best_v = state
        slot = lax.rem(c, 2)
        nxt = c + 1

        @pl.when(nxt < n_cand)
        def _():
            dma(lax.rem(nxt, 2), nxt).start()

        dma(slot, c).wait()
        out = jax.lax.dot_general(
            rays, buf[slot], (((1,), (0,)), ((), ())),
            precision=lax.Precision.HIGHEST,
        )  # [B, 4K]
        a = out[:, 0 * k : 1 * k]
        u_num = out[:, 1 * k : 2 * k]
        v_num = out[:, 2 * k : 3 * k]
        t_num = out[:, 3 * k : 4 * k]
        inv_a = jnp.where(
            jnp.abs(a) > 1e-12, 1.0 / jnp.where(a != 0.0, a, 1.0), 0.0
        )
        uu = u_num * inv_a
        vv = v_num * inv_a
        tt = t_num * inv_a
        valid = (
            (jnp.abs(a) > 1e-12)
            & (uu >= 0.0)
            & (vv >= 0.0)
            & (uu + vv <= 1.0)
            & (tt > 1e-4)
            & (tt < best_t)
        )
        tt = jnp.where(valid, tt, T_MAX)
        # Mosaic has no general gather: select the per-ray argmin via a
        # one-hot reduction instead of take_along_axis
        kbest = jnp.argmin(tt, axis=1)  # [B]
        onehot = (
            lax.broadcasted_iota(jnp.int32, tt.shape, 1) == kbest[:, None]
        ).astype(tt.dtype)
        tk = jnp.sum(tt * onehot, axis=1, keepdims=True)
        uk = jnp.sum(uu * onehot, axis=1, keepdims=True)
        vk = jnp.sum(vv * onehot, axis=1, keepdims=True)
        closer = tk < best_t
        slot_id = (cand_at(c) * k + kbest).astype(jnp.float32)[:, None]
        best_t = jnp.where(closer, tk, best_t)
        best_slot = jnp.where(closer, slot_id, best_slot)
        best_u = jnp.where(closer, uk, best_u)
        best_v = jnp.where(closer, vk, best_v)
        return nxt, best_t, best_slot, best_u, best_v

    state = (
        jnp.asarray(0, jnp.int32),
        t_max,
        jnp.full((B, 1), -1.0, jnp.float32),
        jnp.zeros((B, 1), jnp.float32),
        jnp.zeros((B, 1), jnp.float32),
    )
    c_final, best_t, best_slot, best_u, best_v = lax.while_loop(
        cond, body, state
    )

    # drain: an early exit leaves the prefetched next-leaf DMA in flight;
    # its semaphore must be consumed or it corrupts the next grid step
    @pl.when(c_final < n_cand)
    def _():
        dma(lax.rem(c_final, 2), c_final).wait()

    out_ref[0] = jnp.concatenate(
        [best_t, best_slot, best_u, best_v], axis=1
    )


def _pack8(arr, fill):
    """[nb, C] -> [nb, 8, C8] with element c at (c%8, c//8); C8 is padded to
    a multiple of 128 so HBM slices stay lane-tile aligned."""
    nb, c = arr.shape
    c8 = -(-c // 8)
    c8 = -(-c8 // 128) * 128
    arr = jnp.pad(arr, ((0, 0), (0, c8 * 8 - c)), constant_values=fill)
    return jnp.transpose(arr.reshape(nb, c8, 8), (0, 2, 1))


@functools.partial(
    jax.jit, static_argnames=("interpret", "block")
)
def _run_blocks(rays, cand, centry, ncand, leaf_feat, interpret=False,
                block=BLOCK):
    nb, c_max = cand.shape
    cand8 = _pack8(cand, 0)
    centry8 = _pack8(centry, jnp.float32(3.0e38))
    c8 = cand8.shape[2]
    return pl.pallas_call(
        _kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(nb,),
            in_specs=[
                pl.BlockSpec((1, block, 16), lambda b, *_: (b, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.HBM),  # cand8 [nb, 8, C8]
                pl.BlockSpec(memory_space=pltpu.HBM),  # centry8 [nb, 8, C8]
                pl.BlockSpec(memory_space=pltpu.HBM),  # leaf features
            ],
            out_specs=pl.BlockSpec((1, block, 4), lambda b, *_: (b, 0, 0),
                                   memory_space=pltpu.VMEM),
            scratch_shapes=[
                pltpu.VMEM((2,) + leaf_feat.shape[1:], jnp.float32),
                pltpu.SemaphoreType.DMA((2,)),
                pltpu.SMEM((8, c8), jnp.int32),
                pltpu.SMEM((8, c8), jnp.float32),
                pltpu.SemaphoreType.DMA((2,)),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((nb, block, 4), jnp.float32),
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(ncand.reshape(-1), rays, cand8, centry8, leaf_feat)


def _prepare(fat, origin, direction, t_min, t_max, block):
    from stratum_tpu.ops import mxu as smxu
    from stratum_tpu.ops import packet as spacket

    n = origin.shape[0]
    L = fat.leaf_tri.shape[0]
    nb = -(-n // block)
    nb = -(-nb // 8) * 8  # group-of-8 alignment for the entry pass
    pad = nb * block - n
    o = jnp.pad(origin, ((0, pad), (0, 0))).reshape(nb, block, 3)
    d = jnp.pad(direction, ((0, pad), (0, 0)), constant_values=1.0).reshape(
        nb, block, 3
    )
    tm = jnp.pad(t_max, (0, pad)).reshape(nb, block)

    entries = lax.map(
        lambda args: jax.vmap(
            lambda ob, db, tb: spacket._block_entries(fat, ob, db, t_min, tb)
        )(*args),
        (
            o.reshape(-1, 8, block, 3),
            d.reshape(-1, 8, block, 3),
            tm.reshape(-1, 8, block),
        ),
    ).reshape(nb, L)
    order = jnp.argsort(entries, axis=1).astype(jnp.int32)
    sorted_entry = jnp.take_along_axis(entries, order, axis=1)
    ncand = jnp.sum(jnp.isfinite(sorted_entry), axis=1, keepdims=True).astype(
        jnp.int32
    )
    sorted_entry = jnp.where(
        jnp.isfinite(sorted_entry), sorted_entry, jnp.float32(3.0e38)
    )
    rf = smxu.ray_features(o.reshape(-1, 3), d.reshape(-1, 3)).reshape(
        nb, block, 10
    )
    rays = jnp.concatenate(
        [rf, tm[..., None], jnp.zeros((nb, block, 5), jnp.float32)], axis=-1
    )
    return rays, order, sorted_entry, ncand, n


def pallas_closest(
    fat, leaf_feat_packed, origin, direction, t_min=1e-4, t_max=None,
    block: int = BLOCK, interpret: bool = False,
) -> HitRecord:
    """Closest hit via the Pallas kernel. ``leaf_feat_packed`` =
    pack_leaf_features(fat) (precomputed once per scene)."""
    n = origin.shape[0]
    if t_max is None:
        t_max = jnp.full((n,), T_MAX, jnp.float32)
    rays, cand, centry, ncand, n = _prepare(
        fat, origin, direction, t_min, t_max, block
    )
    out = _run_blocks(
        rays, cand, centry, ncand, leaf_feat_packed,
        interpret=interpret, block=block,
    )
    out = out.reshape(-1, 4)[:n]
    k = fat.leaf_tri.shape[1]
    slot = out[:, 1].astype(jnp.int32)
    hit = slot >= 0
    tri = jnp.where(
        hit, fat.leaf_tri.reshape(-1)[jnp.maximum(slot, 0)], -1
    )
    best_t = jnp.where(tri >= 0, out[:, 0], T_MAX)
    return HitRecord(t=best_t, tri=tri, bary=out[:, 2:4])


def pallas_occluded(
    fat, leaf_feat_packed, origin, direction, t_max, t_min=1e-4,
    block: int = BLOCK, interpret: bool = False,
):
    """Any-hit via the closest kernel bounded to the segment."""
    limit = t_max * np.float32(1.0 - 1e-3)
    hit = pallas_closest(
        fat, leaf_feat_packed, origin, direction, t_min, limit,
        block=block, interpret=interpret,
    )
    return hit.tri >= 0
