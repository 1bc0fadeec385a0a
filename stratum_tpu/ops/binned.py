"""Binned pair-stream tracer: pair-perfect MXU packing for incoherent waves.

The block kernel (ops/pallas_trace.py) charges each committed leaf visit a
full 128-lane slab stream, but on sorted SECONDARY waves the measured
pretest occupancy at 128-lane granularity is ~0.26 and the per-commit cost
is machinery-bound (~0.7 us vs a 0.3 us MXU stream floor at K=256) — see
tools/probe_pairs.py and the STATUS.md roofline memo. This module flips
the schedule from "stream leaves past resident rays" to "bin rays by the
leaves they want":

1. every g consecutive rays of the (trace-locally sorted) wave form a
   GROUP; per-ray slab tests against every leaf AABB (chunk-scanned, no
   [N, L] materialization) reduce to per-group pass bits;
2. passing (group, leaf) PAIRS are emitted into a fixed [NG, pcap] table
   (cap pcap per group, capacity mcap per wave — both measured on real
   waves by tools/perf_binned.py) and sorted by leaf id (one fused
   lax.sort carrying the pair id);
3. each leaf's pair run is padded to a multiple of 128//g pairs by a
   cumsum-renumber + one scatter, so every 128-lane BIN holds pairs of
   EXACTLY ONE leaf at full occupancy;
4. a minimal Pallas kernel (grid = bins) runs ONE C=48 Moller-Trumbore
   matmul + packed argmin per bin. The leaf slab arrives through a
   scalar-prefetch-driven BlockSpec index map, so Mosaic pipelines the
   HBM fetch and ELIDES it when consecutive bins share a leaf (sorted
   order makes same-leaf bins adjacent) — there is no per-visit DMA
   machinery, no pretest, no best-t carry in the kernel at all;
5. bin results scatter back to the emission table and a min over pcap
   per ray resolves the closest hit.

Trade-offs vs the block kernel: no front-to-back early exit (measured to
never fire on fully-alive sorted waves) and conservative fixed capacities
(overflow counts are returned for measurement; capacities are sized with
headroom from probe data). Dead rays (t bound 0) emit no pairs, so
post-RR sparse waves compact for free — the explicit compaction the block
path measured as a net loss.

TPU-native replacement for the same hardware traversal as the block
kernel (reference: src/Shaders/common/intersection.hlsli:65-191); the
binning schedule itself has no reference counterpart (the GPU's SIMT
scheduler repacks warps in hardware; on TPU the repack is an explicit
sort + scatter, paid once per wave instead of per visit).
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
from stratum_tpu.ops.pallas_trace import _IDX_BITS, _mt_classify

# miss sentinel: +inf's bit pattern — any packed (t | idx) of a valid hit
# (t finite positive, low _IDX_BITS bits replaced by the slot index)
# compares strictly below it in int space
_MISS = 0x7F800000  # python int: a jnp scalar here would be captured as a
_UMAX = np.uint32(0xFFFFFFFF)  # pallas kernel constant (rejected)
# rays per emission slice: bounds the [S, 64, 3] slab-test intermediates
# (~25 MB) while keeping the lax.map trip count small
_SLICE = 32768


def _bin_kernel(bleaf_sp, rays_ref, feat_ref, out_ref):
    """One grid step = ``sb`` 128-lane bins OF ONE LEAF: C=48 banded MT
    matmul + packed argmin over [sb*128] lanes at once.

    No pretest, no best-t carry, no DMA machinery — the grid/BlockSpec
    pipeline stages both operands, and a bin is 100% committed work by
    construction. sb > 1 (superbins) amortizes the per-grid-step pipeline
    fixed cost (measured ~1.1 us/step vs the ~0.3 us matmul at sb=1) over
    sb bins; leaf runs are padded to sb*bw pairs so a step never spans a
    leaf. bleaf < 0 marks an all-sentinel step (capacity padding): skip
    the math, emit misses."""
    i = pl.program_id(0)
    bl = bleaf_sp[i]

    @pl.when(bl < 0)
    def _miss():
        out_ref[0] = jnp.full(out_ref.shape[1:], _MISS, jnp.int32)

    @pl.when(bl >= 0)
    def _hit():
        r = rays_ref[0]  # [16, sb*128] f32 (rows 10-15 zero)
        r_hi = r.astype(jnp.bfloat16)
        r_lo = (r - r_hi.astype(jnp.float32)).astype(jnp.bfloat16)
        rays_mm = jnp.concatenate([r_hi, r_hi, r_lo], axis=0)  # [48, sbW]
        s = feat_ref[0]  # [32, 4K] bf16 (s_hi | s_lo)
        slab = jnp.concatenate([s, s[0:16]], axis=0)  # [48, 4K]
        out = lax.dot_general(
            slab, rays_mm, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [4K, 128]
        k4 = out.shape[0]
        k = k4 // 4
        abs_a, stn, valid = _mt_classify(
            out[0 * k : 1 * k], out[1 * k : 2 * k],
            out[2 * k : 3 * k], out[3 * k : 4 * k],
        )
        # t = stn / abs_a via exponent-negation Newton reciprocal
        # (rel err <= 2^-17, below the packed low-bit clearing)
        rec = lax.bitcast_convert_type(
            jnp.int32(0x7EF311C3) - lax.bitcast_convert_type(abs_a, jnp.int32),
            jnp.float32,
        )
        rec = rec * (2.0 - abs_a * rec)
        rec = rec * (2.0 - abs_a * rec)
        tt = jnp.where(valid, stn * rec, jnp.inf)
        mask = jnp.int32(~((1 << _IDX_BITS) - 1))
        bits = lax.bitcast_convert_type(tt, jnp.int32)
        iota_k = lax.broadcasted_iota(jnp.int32, tt.shape, 0)
        packed = jnp.min((bits & mask) | iota_k, axis=0, keepdims=True)
        out_ref[0] = packed  # [1, 128] int32


@functools.partial(
    jax.jit,
    static_argnames=("g", "pcap", "mcap", "interpret", "stage", "sb", "em"),
)
def _binned_trace(o, d, tb, tmn, leaf_lo, leaf_hi, leaf_feat, g, pcap, mcap,
                  interpret=False, stage=None, sb=1, em="ray"):
    """Core pipeline on a PADDED wave (N divisible by g * _SLICE buckets).

    Returns (packedmin [NG, g] int32, leaf_w [NG, g] int32, stats)."""
    n = o.shape[0]
    ng = n // g
    L = leaf_lo.shape[0]
    L64 = -(-L // 64) * 64
    # NaN pads: an INVERTED pad box passes the slab test for every ray
    # (per-axis min/max symmetrizes the bounds) — probe_pairs_k landmine
    lo_p = jnp.pad(leaf_lo, ((0, L64 - L), (0, 0)),
                   constant_values=float("nan"))
    hi_p = jnp.pad(leaf_hi, ((0, L64 - L), (0, 0)),
                   constant_values=float("nan"))
    bw = 128 // g  # pairs (groups) per bin

    # ---- 1+2. per-group pass bits -> [NG, pcap] leaf slots ----
    # xyz axes SCALARIZED so every intermediate is [S, 64] with leaves on
    # the lane dim: a [S, 64, 3] layout puts 3 on the minor (lane) dim and
    # tile-pads it toward 128 — the same trap packet._block_entries
    # documents as measured 4x (and this pass runs (L64/64) x (N/S) times)
    def emit_slice(args):
        os_, ds_, tbs = args  # [S, 3], [S, 3], [S]
        ngs = os_.shape[0] // g
        inv = jnp.where(
            jnp.abs(ds_) > 1e-20, 1.0 / ds_, jnp.sign(ds_) * 1e20 + 1e20
        )
        if em == "group":
            # GROUP-INTERVAL slab tests (r5 emit diet): one interval-
            # arithmetic test per (group, leaf) instead of g per-ray tests
            # + an any-reduction — conservative (a pass whenever ANY real
            # ray could pass, possibly more), so it can only ADD pairs the
            # kernel then rejects; hits are unchanged. Dead lanes (t bound
            # 0) are masked out of the interval so they never inflate it;
            # an all-dead group gets an inverted interval and emits
            # nothing. Intermediates are [NGS, 64] — g-fold smaller than
            # the per-ray pass — at ~2x the ops per element.
            alive_l = (tbs > 0.0)[:, None]  # [S, 1]
            big = jnp.float32(3.0e38)

            def gmin(x):
                return jnp.min(
                    jnp.where(alive_l, x, big).reshape(ngs, g, 3), axis=1
                )

            def gmax(x):
                return jnp.max(
                    jnp.where(alive_l, x, -big).reshape(ngs, g, 3), axis=1
                )

            o_lo, o_hi = gmin(os_), gmax(os_)  # [NGS, 3]
            i_lo, i_hi = gmin(inv), gmax(inv)
            tb_g = jnp.max(tbs.reshape(ngs, g), axis=1)  # [NGS]
            ol = [o_lo[:, a : a + 1] for a in range(3)]  # [NGS, 1] each
            oh = [o_hi[:, a : a + 1] for a in range(3)]
            il = [i_lo[:, a : a + 1] for a in range(3)]
            ih = [i_hi[:, a : a + 1] for a in range(3)]
        else:
            ox, oy, oz = os_[:, 0:1], os_[:, 1:2], os_[:, 2:3]  # [S, 1]
            ix, iy, iz = inv[:, 0:1], inv[:, 1:2], inv[:, 2:3]

        def leaf_chunk(carry, ci):
            count, slots = carry  # [ngs], [ngs, pcap]
            lo_c = lax.dynamic_slice(lo_p, (ci, 0), (64, 3))
            hi_c = lax.dynamic_slice(hi_p, (ci, 0), (64, 3))
            if em == "group":
                # interval of t = (b - o) * i per axis/bound: 4-combo
                # product bounds (i may span zero for a sign-mixed group)
                tn_lo = jnp.zeros((ngs, 64), jnp.float32)
                tf_hi = jnp.full((ngs, 64), big, jnp.float32)
                for a in range(3):
                    bt = []
                    for b_ in (lo_c[None, :, a], hi_c[None, :, a]):
                        u_lo = b_ - oh[a]  # [NGS, 64]
                        u_hi = b_ - ol[a]
                        p1, p2 = u_lo * il[a], u_lo * ih[a]
                        p3, p4 = u_hi * il[a], u_hi * ih[a]
                        bt.append((
                            jnp.minimum(
                                jnp.minimum(p1, p2), jnp.minimum(p3, p4)
                            ),
                            jnp.maximum(
                                jnp.maximum(p1, p2), jnp.maximum(p3, p4)
                            ),
                        ))
                    # near/far per axis: min/max of the two bound-t
                    # intervals (conservative envelope over the group)
                    tn_lo = jnp.maximum(
                        tn_lo, jnp.minimum(bt[0][0], bt[1][0])
                    )
                    tf_hi = jnp.minimum(
                        tf_hi, jnp.maximum(bt[0][1], bt[1][1])
                    )
                pg = (
                    (tn_lo <= tf_hi) & (tf_hi >= tmn)
                    & (tn_lo < tb_g[:, None])
                )  # [NGS, 64]
            else:
                t0x = (lo_c[None, :, 0] - ox) * ix  # [S, 64]
                t1x = (hi_c[None, :, 0] - ox) * ix
                t0y = (lo_c[None, :, 1] - oy) * iy
                t1y = (hi_c[None, :, 1] - oy) * iy
                t0z = (lo_c[None, :, 2] - oz) * iz
                t1z = (hi_c[None, :, 2] - oz) * iz
                tn = jnp.maximum(
                    jnp.maximum(
                        jnp.minimum(t0x, t1x), jnp.minimum(t0y, t1y)
                    ),
                    jnp.maximum(jnp.minimum(t0z, t1z), 0.0),
                )
                tf = jnp.minimum(
                    jnp.minimum(
                        jnp.maximum(t0x, t1x), jnp.maximum(t0y, t1y)
                    ),
                    jnp.maximum(t0z, t1z),
                )
                # tf >= t_min matches the block kernel's entry pass
                # (packet._block_entries); the intersection epsilon itself
                # is _mt_classify's 1e-4 relative bound, as in the block
                # kernel
                p = (tn <= tf) & (tf >= tmn) & (tn < tbs[:, None])  # [S,64]
                pg = p.reshape(ngs, g, 64).any(axis=1)  # [ngs, 64]
            cum = jnp.cumsum(pg.astype(jnp.int32), axis=1)
            dest = count[:, None] + cum - 1  # slot index where passing
            leaf1 = (ci + lax.broadcasted_iota(jnp.int32, (1, 64), 1)) + 1
            cols = [
                jnp.max(jnp.where(pg & (dest == pp), leaf1, 0), axis=1)
                for pp in range(pcap)
            ]
            upd = jnp.stack(cols, axis=1)  # [ngs, pcap]; 0 = no update
            slots = jnp.where(upd > 0, upd - 1, slots)
            return (count + cum[:, -1], slots), None

        init = (
            jnp.zeros((ngs,), jnp.int32),
            jnp.full((ngs, pcap), -1, jnp.int32),
        )
        (count, slots), _ = lax.scan(
            leaf_chunk, init, jnp.arange(0, L64, 64, dtype=jnp.int32)
        )
        return count, slots

    s = min(_SLICE, n)
    count, slots = lax.map(
        lambda a: emit_slice(a),
        (
            o.reshape(-1, s, 3),
            d.reshape(-1, s, 3),
            tb.reshape(-1, s),
        ),
    )
    count = count.reshape(ng)  # RAW count (uncapped; > pcap = overflow)
    slots = slots.reshape(ng, pcap)

    def _cut(*deps):
        """Stage-cut return for tools/profile_binned_stages: a tiny
        reduction depending on everything computed so far, so XLA DCEs
        the rest of the pipeline and wall-clock deltas attribute stages."""
        z = jnp.zeros((ng, g), jnp.int32)
        acc = jnp.int32(0)
        for x in deps:
            acc = acc + jnp.sum(x.astype(jnp.int32) & 1)
        return z + acc, z, {
            "pairs": acc, "dropped_pcap": acc, "dropped_mcap": acc,
            "bins_used": acc,
        }

    if stage == "emit":
        return _cut(count, slots)

    # ---- 3. sort pairs by leaf (pair id rides the sort) ----
    piota = lax.broadcasted_iota(jnp.int32, (ng, pcap), 1)
    key = jnp.where(
        (piota < jnp.minimum(count, pcap)[:, None]) & (slots >= 0),
        slots.astype(jnp.uint32), _UMAX,
    ).reshape(-1)
    pid = jnp.arange(ng * pcap, dtype=jnp.int32)
    skey, spid = lax.sort((key, pid), num_keys=1)
    mcap = min(mcap, ng * pcap)
    skey = skey[:mcap]
    spid = spid[:mcap]
    valid = skey != _UMAX
    if stage == "sort":
        return _cut(skey, spid)

    # ---- 4. pad each leaf run to a STEP multiple (cumsum renumber) ----
    # step = sb bins = pw pairs of ONE leaf (superbins amortize the
    # kernel's per-grid-step fixed cost; padding waste grows from bw to
    # pw per leaf run — ~sb*g extra slab rows per leaf, a few % on waves
    # whose runs are hundreds of pairs long)
    pw = sb * bw  # pairs per grid step
    mpad = (mcap + pw * (L + 2) + pw - 1) // pw * pw
    idx = jnp.arange(mcap, dtype=jnp.int32)
    b = jnp.concatenate(
        [jnp.ones((1,), bool), skey[1:] != skey[:-1]]
    )
    start = lax.cummax(jnp.where(b, idx, -1))
    sstart = jnp.concatenate([jnp.zeros((1,), jnp.int32), start[:-1]])
    prevlen = idx - sstart
    padb = jnp.where(b & (idx > 0), (pw - lax.rem(prevlen, pw)) % pw, 0)
    dst = idx + jnp.cumsum(padb)
    dst = jnp.where(valid & (dst < mpad), dst, mpad)  # drop mode
    pleaf = jnp.full((mpad,), -1, jnp.int32).at[dst].set(
        skey.astype(jnp.int32), mode="drop"
    )
    ppid = jnp.full((mpad,), ng * pcap, jnp.int32).at[dst].set(
        spid, mode="drop"
    )

    nsteps = mpad // pw
    nbins = mpad // bw
    bin_leaf = pleaf[::pw]  # all pairs of a step share the leaf
    if stage == "pad":
        return _cut(pleaf, ppid)

    # ---- 5. gather ray feature rows into bin order ----
    from stratum_tpu.ops import mxu as smxu

    rf = smxu.ray_features(o, d)  # [N, 10] f32
    rf = jnp.pad(rf, ((0, 0), (0, 6)))
    # banded rows FLATTENED to [NG, 16*g]: a [NG, 16, g] table puts g on
    # the minor (lane) dim and tile-pads it toward 128 — the r5 stage
    # profile measured that gather at +95 ms/wave (16x physical bytes);
    # the flat layout gathers clean full-lane rows and leaves one fused
    # (reshape, transpose, reshape) relayout into bin-lane order
    banded = jnp.transpose(rf.reshape(ng, g, 16), (0, 2, 1)).reshape(
        ng, 16 * g
    )
    grp = jnp.minimum(ppid // pcap, ng - 1)
    gath = banded[grp]  # [MPAD, 16*g] — ONE clean row gather
    bin_rays = jnp.transpose(
        gath.reshape(nsteps, pw, 16, g), (0, 2, 1, 3)
    ).reshape(nsteps, 16, sb * 128)
    if stage == "gather":
        return _cut(bin_rays, bin_leaf)

    # ---- 6. the kernel ----
    binout = pl.pallas_call(
        _bin_kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(nsteps,),
            in_specs=[
                pl.BlockSpec((1, 16, sb * 128), lambda i, bl: (i, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(
                    (1,) + leaf_feat.shape[1:],
                    lambda i, bl: (jnp.maximum(bl[i], 0), 0, 0),
                    memory_space=pltpu.VMEM,
                ),
            ],
            # 3D out: a (1, W) block on a [nsteps, W] array violates the
            # Mosaic block rule (last two dims divisible by (8, 128) or
            # equal to the array dims); [nsteps, 1, W] with (1, 1, W)
            # blocks satisfies it exactly
            out_specs=pl.BlockSpec(
                (1, 1, sb * 128), lambda i, bl: (i, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ),
        out_shape=jax.ShapeDtypeStruct((nsteps, 1, sb * 128), jnp.int32),
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
    )(bin_leaf, bin_rays, leaf_feat)
    if stage == "kernel":
        return _cut(binout)

    # ---- 7. resolve: per-ray min over pair slots, ROW-GRANULAR ----
    # Element-granular scatters price ~10 ns/element in EVERY form (the
    # 2-D column scatter, 8x 1-D scatter-min, and the direct per-ray
    # scatter all measured 81-114 ms at 1M pairs on-chip —
    # tools/probe_resolve.py), so the resolve avoids scatters entirely:
    # (a) sort pair results by GROUP id (one dummy entry per group
    #     guarantees every group a segment; invalid pairs sort last),
    # (b) bounded segment-min by log2(pcap) DILATION passes (a group has
    #     <= pcap+1 entries, so shifted mins of stride 1,2,4,.. converge
    #     and never cross segment boundaries thanks to the key guard),
    # (c) a compaction sort on (is-first ? group : BIG) lands exactly one
    #     answer per group, group-ordered, in the first ng slots.
    # Probe: 21.2 ms vs 100-114 for the scatter forms. The winning LEAF
    # rides the dilation as g tracked arrays (ties keep the first entry
    # in sorted order = ascending leaf id, matching the old argmin over
    # emission slots, which are also leaf-ascending).
    rows_t = jnp.transpose(
        binout.reshape(nbins, bw, g), (2, 0, 1)
    ).reshape(g, mpad)
    grp_pairs = jnp.where(ppid < ng * pcap, ppid // pcap, ng)
    keys1 = jnp.concatenate([grp_pairs, jnp.arange(ng, dtype=jnp.int32)])
    ops1 = tuple(
        jnp.concatenate([rows_t[r], jnp.full((ng,), _MISS, jnp.int32)])
        for r in range(g)
    ) + (
        jnp.concatenate([pleaf, jnp.full((ng,), -1, jnp.int32)]),
    )
    srt = lax.sort((keys1,) + ops1, num_keys=1)
    sk = srt[0]
    vals = list(srt[1 : 1 + g])
    leafs = [srt[1 + g]] * g  # per-lane-row winner leaf tracking
    m_ext = sk.shape[0]
    sh = 1
    while sh <= pcap:
        same = jnp.concatenate(
            [sk[sh:] == sk[:-sh], jnp.zeros((sh,), bool)]
        )
        for r in range(g):
            sval = jnp.concatenate(
                [vals[r][sh:], jnp.full((sh,), _MISS, jnp.int32)]
            )
            slf = jnp.concatenate(
                [leafs[r][sh:], jnp.full((sh,), -1, jnp.int32)]
            )
            closer = same & (sval < vals[r])
            vals[r] = jnp.where(closer, sval, vals[r])
            leafs[r] = jnp.where(closer, slf, leafs[r])
        sh *= 2
    first = jnp.concatenate(
        [jnp.ones((1,), bool), sk[1:] != sk[:-1]]
    ) & (sk < ng)
    key2 = jnp.where(first, sk, jnp.int32(m_ext))
    srt2 = lax.sort((key2,) + tuple(vals) + tuple(leafs), num_keys=1)
    packedmin = jnp.stack([v[:ng] for v in srt2[1 : 1 + g]]).T  # [NG, g]
    leaf_w = jnp.stack([lf[:ng] for lf in srt2[1 + g :]]).T
    stats = {
        "pairs": jnp.sum(jnp.minimum(count, pcap)),
        "dropped_pcap": jnp.sum(jnp.maximum(count - pcap, 0)),
        "dropped_mcap": jnp.maximum(
            jnp.sum((key != _UMAX).astype(jnp.int32)) - mcap, 0
        ),
        "bins_used": jnp.sum((bin_leaf >= 0).astype(jnp.int32)),
    }
    return packedmin, leaf_w, stats


def pallas_closest_binned(
    fat, leaf_feat_packed, origin, direction, t_min=1e-4, t_max=None,
    g: int = 8, pcap: int = 16, mcap: int | None = None, sb: int = 1,
    em: str = "ray", interpret: bool = False, slot_payload=None,
    with_stats: bool = False,
) -> HitRecord:
    """Closest hit via the binned pair-stream kernel (drop-in for
    pallas_closest on SORTED waves; see module docstring). ``g`` = rays
    per pair group (the sort makes neighbors want the same leaves);
    ``pcap`` = max leaves per group; ``mcap`` = pair capacity per wave
    (default n // 2). Overflow beyond either capacity drops pairs —
    measure with ``with_stats`` / tools/perf_binned.py and size with
    headroom. ``t_min`` gates pair emission (tf >= t_min, same as the
    block kernel's entry pass); the intersection epsilon is
    _mt_classify's 1e-4 relative bound. ``leaf_feat_packed`` must be the
    flat (chunks=1) c48 [L8, 32, 4K] layout (pack_leaf_features
    MT_MODE="c48")."""
    if leaf_feat_packed.dtype != jnp.bfloat16:
        raise ValueError("binned tracer requires the c48 bf16 slab layout")
    from stratum_tpu.ops.pallas_trace import _effective_chunks

    if _effective_chunks(fat.leaf_tri.shape[1]) != 1:
        # a chunk-major (chunks>1) c48 slab has the same shape/dtype but
        # permuted columns — the kernel's flat [a|u|v|t] slices would read
        # the wrong quantities and commit silently wrong hits
        raise ValueError(
            "binned tracer requires the FLAT (chunks=1) c48 slab layout; "
            "the module is configured for chunk-major slabs "
            "(pallas_trace.CHUNKS > 1)"
        )
    if 128 % g != 0:
        raise ValueError(f"g ({g}) must divide 128")
    k = fat.leaf_tri.shape[1]
    if k > (1 << _IDX_BITS):
        raise ValueError(
            f"leaf_size {k} exceeds the packed-argmin budget "
            f"({1 << _IDX_BITS})"
        )
    n = origin.shape[0]
    if t_max is None:
        t_max = jnp.full((n,), T_MAX, jnp.float32)
    if mcap is None:
        mcap = max(n // 2, 1 << 14)
    s = min(_SLICE, -(-n // g) * g)
    npad = -(-n // s) * s
    o = jnp.pad(origin, ((0, npad - n), (0, 0)))
    d = jnp.pad(direction, ((0, npad - n), (0, 0)), constant_values=1.0)
    tb = jnp.pad(t_max, (0, npad - n))  # pad t bound 0 -> no pairs
    packedmin, leaf_w, stats = _binned_trace(
        o, d, tb, jnp.float32(t_min), fat.leaf_lo, fat.leaf_hi,
        leaf_feat_packed, g=g, pcap=pcap, mcap=int(mcap), sb=sb, em=em,
        interpret=interpret,
    )
    mask = jnp.int32(~((1 << _IDX_BITS) - 1))
    pm = packedmin.reshape(-1)[:n]
    lw = leaf_w.reshape(-1)[:n]
    t = lax.bitcast_convert_type(pm & mask, jnp.float32)
    hit = (t < t_max) & (t < T_MAX) & (lw >= 0)
    slot = jnp.where(hit, lw * k + (pm & ~mask), -1)
    best_t = jnp.where(hit, t, T_MAX)
    if with_stats:
        return HitRecord(
            t=best_t, tri=jnp.where(hit, 0, -1),
            bary=jnp.zeros((n, 2), jnp.float32), slot=slot,
        ), stats
    if slot_payload is not None:
        return HitRecord(
            t=best_t, tri=jnp.where(hit, 0, -1),
            bary=jnp.zeros((n, 2), jnp.float32), slot=slot,
        )
    # classic resolve: tri id + barycentrics of the winner (one feature
    # row gather + a 10-dot — same recipe as pallas_closest)
    from stratum_tpu.ops import mxu as smxu

    tri = jnp.where(
        hit, fat.leaf_tri.reshape(-1)[jnp.maximum(slot, 0)], -1
    )
    rf = smxu.ray_features(origin, direction)
    flat = fat.leaf_feat.reshape(-1, 40)[jnp.maximum(slot, 0)]
    a = jnp.zeros_like(best_t)
    u_num = jnp.zeros_like(best_t)
    v_num = jnp.zeros_like(best_t)
    for f in range(10):
        a = a + rf[:, f] * flat[:, f * 4 + 0]
        u_num = u_num + rf[:, f] * flat[:, f * 4 + 1]
        v_num = v_num + rf[:, f] * flat[:, f * 4 + 2]
    inv_a = jnp.where(jnp.abs(a) > 1e-12, 1.0 / a, 0.0)
    bary = jnp.stack([u_num * inv_a, v_num * inv_a], axis=-1)
    bary = jnp.where(hit[:, None], bary, 0.0)
    return HitRecord(
        t=jnp.where(tri >= 0, best_t, T_MAX), tri=tri, bary=bary
    )


def pallas_occluded_binned(
    fat, leaf_feat_packed, origin, direction, t_max, t_min=1e-4,
    g: int = 8, pcap: int = 16, mcap: int | None = None, sb: int = 1,
    em: str = "ray", interpret: bool = False, with_stats: bool = False,
):
    """Any-hit via the binned pipeline: same pair emission (a dead lane's
    t bound 0 emits no pairs) and bin kernel; a ray is blocked when the
    resolved closest t lands inside (t_min, t_max * (1 - 1e-3)) — the same
    limit shrink as pallas_occluded. No per-visit early exit exists to
    lose here: the pipeline is one pass by construction, and occlusion
    waves skip the closest path's winner resolve entirely.

    Reference: shadow-ray RayQuery first-commit semantics
    (src/Shaders/common/intersection.hlsli:192-239)."""
    if leaf_feat_packed.dtype != jnp.bfloat16:
        raise ValueError("binned tracer requires the c48 bf16 slab layout")
    from stratum_tpu.ops.pallas_trace import _effective_chunks

    if _effective_chunks(fat.leaf_tri.shape[1]) != 1:
        raise ValueError(
            "binned tracer requires the FLAT (chunks=1) c48 slab layout"
        )
    if 128 % g != 0:
        raise ValueError(f"g ({g}) must divide 128")
    n = origin.shape[0]
    limit = t_max * np.float32(1.0 - 1e-3)
    if mcap is None:
        mcap = max(n // 2, 1 << 14)
    s = min(_SLICE, -(-n // g) * g)
    npad = -(-n // s) * s
    o = jnp.pad(origin, ((0, npad - n), (0, 0)))
    d = jnp.pad(direction, ((0, npad - n), (0, 0)), constant_values=1.0)
    tb = jnp.pad(limit, (0, npad - n))  # pad bound 0 -> no pairs
    packedmin, _leaf_w, stats = _binned_trace(
        o, d, tb, jnp.float32(t_min), fat.leaf_lo, fat.leaf_hi,
        leaf_feat_packed, g=g, pcap=pcap, mcap=int(mcap), sb=sb, em=em,
        interpret=interpret,
    )
    mask = jnp.int32(~((1 << _IDX_BITS) - 1))
    t = lax.bitcast_convert_type(
        packedmin.reshape(-1)[:n] & mask, jnp.float32
    )
    blocked = t < limit
    if with_stats:
        return blocked, stats
    return blocked
