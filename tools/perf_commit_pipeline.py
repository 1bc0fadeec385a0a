"""Where does the 1.48 us/sub-commit go? (closest kernel, C=48, K=1024)

profile_visits measured 1.48 us per sub-commit in the real traversal
kernel; the saturated-MXU charge for one [48,4K]x[48,128] bf16 pass is
0.26 us (real-depth) .. 0.68 us (128-deep), and the VPU epilogue
(classify + packed-argmin select) models to ~0.4 us. Whether the gap is
(a) MXU/VPU serialization the compiler could pipeline away, (b) the
while_loop's scalar control, or (c) the epilogue being pricier than
modeled decides the next kernel restructure.

Each variant runs ITERS visit iterations of ONE sub-commit inside a
single Pallas program, operands VMEM-resident (the real kernel's slab is
in a VMEM DMA ring by commit time), slab indexed from a 4-deep ring so
Mosaic can neither hoist nor CSE the dots:

  bare       matmul -> [1,B] row consume           (free-pipelining bound;
             consumes only out[0:1,:] so its extra traffic matches the epi
             variants' [1,B] best/slot writes instead of a [4K,B] add)
  classify   matmul -> _mt_classify -> accumulate  (adds classify VPU; note
             its [k,B] accumulate consume is heavier than epi's [1,B]
             commit, so classify-vs-epi deltas slightly overstate classify)
  epi        matmul -> classify -> _select_update  (the REAL commit body)
  epi_when   epi with each commit under pl.when(scalar bit)  (predication)
  epi_while  epi inside lax.while_loop w/ scalar-prefetch count (real loop)
  epi_drain  epi gated on a vector->scalar drain of best_ref — the real
             kernel's loop-carried pretest dependency
  epi_x2     epi, 2 independent sub-commits per iteration (128-lane cols)
             -> if per-commit cost drops, cross-commit overlap exists and
                unrolling the real kernel's sub loop wins
  epi_x2/epi_w256 count 2 commits per iteration in the ns/commit math
  epi_w256   ONE double-width [48,4K]x[48,256] commit (merged sub-blocks)
  ring       the planned r4 kernel restructure: the commit writes its
             per-visit (t, slot) into a depth-2 VMEM ring (no best_ref
             read-modify-write on the commit path); the top of iteration
             c merges ring slot c-1 into best_ref (min is associative,
             so deferred merging is exact) and recomputes the NEXT
             iteration's gate word against the merged best (one visit
             stale = conservative), carrying it as a loop value so no
             vector->scalar drain sits in front of the matmul. If ring
             beats epi_drain/epi_while on-chip, the real kernel gets
             this structure.

NOTE: with the constant operands (rays=0.25, feat=0.5) every product row
equals 6.0, so _mt_classify's su+sv<=abs_a test fails on all lanes and no
commit ever updates best_ref/slot_ref — o_ref is a dead-code sink only
(timing is unaffected: the commit work is data-independent).

Usage: python tools/perf_commit_pipeline.py [--iters=256] [--k=1024]
"""

from __future__ import annotations

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/stratum_jax_cache")

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from stratum_tpu.utils import jaxcache

jaxcache.enable()

from stratum_tpu.ops.pallas_trace import _mt_classify, _select_update  # noqa: E402

NL = 4  # slab ring depth (mirrors the DMA ring)
B = 128  # sub-block width


def _kernel(n_sp, rays_ref, feat_ref, word_ref, o_ref, best_ref, slot_ref,
            acc, *, iters, variant, k):
    rays = rays_ref[...]  # [48, B or 2B] bf16
    best_ref[...] = jnp.full_like(best_ref[...], 3.0e38)
    slot_ref[...] = jnp.full_like(slot_ref[...], -1.0)
    acc[...] = jnp.zeros_like(acc[...])
    dims = (((0,), (0,)), ((), ()))

    def dot(i, lo=0, w=B):
        slab = feat_ref[lax.rem(i, NL)]  # [48, 4K] bf16
        return lax.dot_general(
            slab, rays[:, lo:lo + w], dims,
            preferred_element_type=jnp.float32,
        )

    def classify(out):
        return _mt_classify(
            out[0 * k:1 * k], out[1 * k:2 * k],
            out[2 * k:3 * k], out[3 * k:4 * k],
        )

    def commit(out, i, lo=0, w=B):
        abs_a, stn, valid = classify(out)
        # slot_base typed exactly like the real call site (int32 tracer)
        _select_update(valid, stn, abs_a, best_ref, slot_ref, lo, w,
                       i * k, True)

    if variant == "bare":
        def body(i, _):
            # consume ONE output row: the epi variants' commit writes are
            # [1,B], so a full [4K,B] accumulate here (~512 vector regs of
            # extra traffic per iteration) would pollute the "+over bare"
            # deltas with consume-cost differences (ADVICE r3)
            acc[0:1, 0:B] = acc[0:1, 0:B] + dot(i)[0:1, :]
            return 0
        lax.fori_loop(0, iters, body, 0)
    elif variant == "classify":
        def body(i, _):
            abs_a, stn, valid = classify(dot(i))
            acc[0:k, 0:B] = acc[0:k, 0:B] + jnp.where(valid, stn, abs_a)
            return 0
        lax.fori_loop(0, iters, body, 0)
    elif variant == "epi":
        def body(i, _):
            commit(dot(i), i)
            return 0
        lax.fori_loop(0, iters, body, 0)
    elif variant == "epi_when":
        def body(i, _):
            w = word_ref[lax.rem(i, 8)]

            @pl.when((w & 1) != 0)
            def _():
                commit(dot(i), i)
            return 0
        lax.fori_loop(0, iters, body, 0)
    elif variant == "epi_while":
        n = n_sp[0]

        def cond(s):
            return s < n

        def body(c):
            commit(dot(c), c)
            return c + 1
        lax.while_loop(cond, body, jnp.asarray(0, jnp.int32))
    elif variant == "epi_drain":
        # the real kernel's structure: a vector->scalar drain that READS
        # best_ref gates each commit — the loop-carried dependency that
        # forbids cross-visit pipelining (pretest(c+1) waits on commit(c))
        def body(i, _):
            want = jnp.min(best_ref[0:1, :]) > -1.0  # always true

            @pl.when(want)
            def _():
                commit(dot(i), i)
            return 0
        lax.fori_loop(0, iters, body, 0)
    elif variant == "epi_x2":
        def body(i, _):
            # two independent 128-lane sub-commits from one iteration —
            # disjoint best_ref columns, so the only serialization left is
            # whatever Mosaic/the hardware cannot overlap
            commit(dot(i, 0, B), i, 0, B)
            commit(dot(i, B, B), i, B, B)
            return 0
        lax.fori_loop(0, iters, body, 0)
    elif variant == "epi_w256":
        def body(i, _):
            # ONE double-width commit: [48,4K]x[48,256] + a 256-lane
            # epilogue — models merging two adjacent wanting sub-blocks
            # into one commit (half the instruction issues; whether that
            # helps says if the epilogue is issue-bound or element-bound)
            commit(dot(i, 0, 2 * B), i, 0, 2 * B)
            return 0
        lax.fori_loop(0, iters, body, 0)
    elif variant == "ring":
        # deferred-merge restructure (see docstring), depth-1 static slot:
        # acc row 0 = per-visit t minima, row 1 = per-visit slot ids
        n = n_sp[0]

        def ring_commit(out, i):
            abs_a, stn, valid = classify(out)
            r = lax.bitcast_convert_type(
                jnp.int32(0x7EF311C3)
                - lax.bitcast_convert_type(abs_a, jnp.int32),
                jnp.float32,
            )
            r = r * (2.0 - abs_a * r)
            r = r * (2.0 - abs_a * r)
            tt = jnp.where(valid, stn * r, jnp.inf)
            mask = jnp.int32(~((1 << 10) - 1))
            bits = lax.bitcast_convert_type(tt, jnp.int32)
            iota_k = lax.broadcasted_iota(jnp.int32, tt.shape, 0)
            packed = jnp.min((bits & mask) | iota_k, axis=0, keepdims=True)
            acc[0:1, 0:B] = lax.bitcast_convert_type(
                packed & mask, jnp.float32
            )
            acc[1:2, 0:B] = (packed & ~mask).astype(
                jnp.float32
            ) + i.astype(jnp.float32) * jnp.float32(k)

        def merge():
            tk = acc[0:1, 0:B]
            closer = tk < best_ref[0:1, 0:B]
            best_ref[0:1, 0:B] = jnp.where(closer, tk, best_ref[0:1, 0:B])
            slot_ref[0:1, 0:B] = jnp.where(
                closer, acc[1:2, 0:B], slot_ref[0:1, 0:B]
            )

        acc[0:2, 0:B] = jnp.full((2, B), jnp.inf)

        def cond(s):
            return s[0] < n

        def body(s):
            c, word = s

            @pl.when(c > 0)
            def _():
                merge()
                acc[0:1, 0:B] = jnp.full((1, B), jnp.inf)

            @pl.when((word & 1) != 0)
            def _():
                ring_commit(dot(c), c)
            # next iteration's gate word: reads best_ref (merged through
            # c-1), NOT this iteration's commit — the drain overlaps the
            # commit's MXU/VPU work
            nxt_word = (
                jnp.min(best_ref[0:1, 0:B]) > -1.0
            ).astype(jnp.int32)
            return c + 1, nxt_word

        c_fin, _ = lax.while_loop(
            cond, body, (jnp.asarray(0, jnp.int32), jnp.asarray(1, jnp.int32))
        )

        @pl.when(c_fin > 0)
        def _():
            merge()
    else:
        raise ValueError(variant)
    o_ref[0:1, :] = best_ref[0:1, 0:B] + acc[0:1, 0:B]
    o_ref[1:2, :] = slot_ref[0:1, 0:B]


@functools.partial(
    jax.jit, static_argnames=("variant", "k", "iters", "interpret")
)
def run_inner(rays, feat, word, n, variant, k, iters, interpret=False):
    lanes = rays.shape[1]
    grid = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(1,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((1, lanes), jnp.float32),
            pltpu.VMEM((1, lanes), jnp.float32),
            pltpu.VMEM((4 * k, lanes), jnp.float32),
        ],
    )
    return pl.pallas_call(
        functools.partial(_kernel, iters=iters, variant=variant, k=k),
        grid_spec=grid,
        out_shape=jax.ShapeDtypeStruct((2, B), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
        interpret=interpret,
    )(n, rays, feat, word)


def run(variant, k, iters, interpret=False):
    """Build RUNTIME operands (random device arrays) and invoke the jitted
    kernel. Operands must NOT be constants inside the jit: XLA constant-
    folds the ENTIRE program — pallas_call included — by evaluating it at
    compile time, so every timed call just fetches a cached constant (this
    invalidated the first two on-chip tables of this tool AND round 3's
    '74 ns deep pipelining' number: totals were flat at launch overhead
    for any iters)."""
    import numpy as np

    lanes = 2 * B if variant in ("epi_x2", "epi_w256") else B
    rng = np.random.default_rng(0)
    rays = jnp.asarray(
        rng.random((48, lanes), np.float32) * 0.5
    ).astype(jnp.bfloat16)
    feat = jnp.asarray(
        rng.random((NL, 48, 4 * k), np.float32) * 0.5
    ).astype(jnp.bfloat16)
    word = jnp.full((8,), 0xFF, jnp.int32)
    n = jnp.asarray([iters], jnp.int32)
    return run_inner(rays, feat, word, n, variant, k, iters, interpret)


def main():
    from stratum_tpu.utils.flags import Options

    opts = Options(sys.argv[1:])
    iters = opts.get_int("iters", 2048)
    base_iters = opts.get_int("base_iters", 512)
    k = opts.get_int("k", 1024)
    interp = opts.get_bool("interpret", False)
    if opts.get_bool("cpu", False):
        jax.config.update("jax_platforms", "cpu")
    print(f"devices: {jax.devices()}  iters={base_iters}->{iters} k={k}")
    variants = ["bare", "classify", "epi", "epi_when", "epi_while",
                "epi_drain", "epi_x2", "epi_w256", "ring"]
    base_ns = None

    def timed(v, it):
        out = run(v, k, it, interp)
        out.block_until_ready()
        reps = 8
        t0 = time.perf_counter()
        for _ in range(reps):
            out = run(v, k, it, interp)
        out.block_until_ready()
        return (time.perf_counter() - t0) / reps

    for v in variants:
        # marginal cost between two trip counts cancels launch + RPC
        # overhead (the axon tunnel adds a per-dispatch floor that varies
        # by milliseconds between configs)
        d_lo = timed(v, base_iters)
        d_hi = timed(v, iters)
        per = 2 if v in ("epi_x2", "epi_w256") else 1
        ns = (d_hi - d_lo) / ((iters - base_iters) * per) * 1e9
        note = ""
        if v == "bare":
            base_ns = ns
        elif base_ns:
            note = f"  ({ns - base_ns:+8.1f} over bare)"
        print(f"{v:10s}: {d_hi * 1e3:8.3f} ms  {ns:8.1f} ns/commit "
              f"(marginal){note}", flush=True)


if __name__ == "__main__":
    main()
