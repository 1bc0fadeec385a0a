"""Microbench: Mosaic matmul cost model for the traversal contraction.

The traversal kernel's per-sub-visit matmul is [16,4K]^T x [16,sw] (bf16,
x3 emulation). Whether round 3's reformulation should batch leaves along M,
deepen the contraction, or cut emulation passes depends on which of three
cost models the hardware follows:

  A. padded-contraction: a C=16 matmul costs the same as C=128
     -> only deeper *useful* contraction or fewer passes help
  B. per-call fixed overhead (weight load / drain latency)
     -> batching leaves along M amortizes it
  C. proportional: cost ~ M*C*B
     -> already efficient; the bottleneck is elsewhere (epilogue)

Each variant runs ITERS iterations of one matmul shape inside a single
Pallas program (fori_loop, operands resident in VMEM, accumulate into
scratch so nothing is DCE'd), which mirrors the traversal kernel's
conditions far better than an XLA-level dot benchmark.
"""

from __future__ import annotations

import functools
import time

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

ITERS = 512


def _mm_kernel(a_ref, b_ref, o_ref, acc, *, iters, passes, reps):
    """acc += a^T @ b, `iters` times; `passes` repeated dots emulate the
    bf16-split multi-pass cost; `reps` splits the M dim into equal calls
    (reps=8 models 8 separate per-leaf matmuls vs one batched)."""
    a = a_ref[...]
    m = a.shape[1]
    dims = (((0,), (0,)), ((), ()))

    def body(i, carry):
        # loop- and pass-dependent RHS so Mosaic can neither hoist the
        # dots out of the loop nor CSE the emulation passes together; the
        # FULL [M,B] output feeds the accumulator so no output rows can be
        # dead-code-narrowed. passes=0 is the control: identical loop and
        # consume cost with the dots replaced by a broadcast — subtract it.
        fi = carry
        b = b_ref[...] * fi
        for r in range(reps):
            sl = a[:, r * (m // reps) : (r + 1) * (m // reps)]
            if passes == 0:
                out = jnp.broadcast_to(b[0:1, :], (m // reps, b.shape[1]))
            else:
                out = lax.dot_general(
                    sl.astype(jnp.bfloat16), b.astype(jnp.bfloat16), dims,
                    preferred_element_type=jnp.float32,
                )
                for p in range(passes - 1):
                    out = out + lax.dot_general(
                        sl.astype(jnp.bfloat16),
                        (b + jnp.float32(p + 1)).astype(jnp.bfloat16),
                        dims,
                        preferred_element_type=jnp.float32,
                    )
            acc[r * (m // reps) : (r + 1) * (m // reps), :] = (
                acc[r * (m // reps) : (r + 1) * (m // reps), :] + out
            )
        return fi * 1.0000001

    lax.fori_loop(0, iters, body, jnp.float32(1.0))
    o_ref[...] = acc[...]


@functools.partial(jax.jit, static_argnames=("c", "m", "b", "passes", "reps"))
def run(c, m, b, passes, reps):
    a = jnp.ones((c, m), jnp.float32) * 0.5
    rb = jnp.ones((c, b), jnp.float32) * 0.25
    return pl.pallas_call(
        functools.partial(
            _mm_kernel, iters=ITERS, passes=passes, reps=reps
        ),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((m, b), jnp.float32),
        scratch_shapes=[pltpu.VMEM((m, b), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
    )(a, rb)


def main():
    print(f"devices: {jax.devices()}")
    cases = [
        # (label, C, M, B, passes, reps)
        ("current sub-visit: [16,1024]x[16,128] x3", 16, 1024, 128, 3, 1),
        ("current, 1-pass bf16", 16, 1024, 128, 1, 1),
        ("8 leaves, 8 calls x3 (per-leaf)", 16, 8192, 128, 3, 8),
        ("8 leaves, 1 call  x3 (batched-M)", 16, 8192, 128, 3, 1),
        ("8 leaves, 1 call  x1", 16, 8192, 128, 1, 1),
        ("deep C=128: [128,1024]x[128,128] x3", 128, 1024, 128, 3, 1),
        ("deep C=128, 1-pass", 128, 1024, 128, 1, 1),
        ("wide B: [16,1024]x[16,512] x3", 16, 1024, 512, 3, 1),
        ("wide B batched: [16,8192]x[16,512] x3", 16, 8192, 512, 3, 1),
        ("C=8:  [8,1024]x[8,128] x3", 8, 1024, 128, 3, 1),
        ("C=32: [32,1024]x[32,128] x3", 32, 1024, 128, 3, 1),
    ]
    def timeit(c, m, b, passes, reps):
        out = run(c, m, b, passes, reps)
        out.block_until_ready()
        t0 = time.perf_counter()
        n = 8
        for _ in range(n):
            out = run(c, m, b, passes, reps)
        out.block_until_ready()
        return (time.perf_counter() - t0) / n / ITERS

    # slope method: same shape at passes=1 and passes=5; (t5-t1)/4 is the
    # marginal cost of ONE extra matmul pass with loop/consume costs
    # perfectly cancelled
    for label, c, m, b, _passes, reps in cases:
        t1 = timeit(c, m, b, 1, reps)
        t5 = timeit(c, m, b, 5, reps)
        per_pass = max((t5 - t1) / 4.0, 1e-12)
        mflop = 2.0 * c * m * b / 1e6
        eff = 2.0 * 16 * m * b / 1e6  # useful MT work at 16-feature rows
        print(
            f"{label:45s} {per_pass * 1e9:9.1f} ns/pass "
            f"(t1={t1 * 1e9:7.1f} t5={t5 * 1e9:7.1f})  "
            f"{mflop / per_pass / 1e6:9.1f} GFLOP/s issued "
            f"({eff / per_pass / 1e6:8.1f} useful/pass)"
        )


if __name__ == "__main__":
    main()
