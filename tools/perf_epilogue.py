"""Microbench the Pallas visit cost: one (sub, leaf) exec = C=48 matmul
[48,4K]x[48,sw] + VPU epilogue (classify + packed argmin). Times a kernel
that runs ITERS execs back-to-back under each epilogue variant to find
where the 1.18 us/exec goes:

  none      matmul only (consume the accumulator with one add)
  classify  matmul + sign-normalized validity, no argmin/commit
  nodiv     full epilogue with the divide replaced by a multiply
  full      the real epilogue (_mt_classify + _select_update)
  fused     min-chain validity + xor sign-flip + deferred valid/inf fold

python tools/perf_epilogue.py [--k=512] [--sw=128] [--iters=64] [--reps=20]
"""

from __future__ import annotations

import functools
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/stratum_jax_cache")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from stratum_tpu.utils import jaxcache  # noqa: E402

jaxcache.enable()


def main():
    from stratum_tpu.utils.flags import Options

    opts = Options(sys.argv[1:])
    if opts.has("cpu"):
        import jax

        jax.config.update("jax_platforms", "cpu")

    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax import lax
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    K = opts.get_int("k", 512)
    SW = opts.get_int("sw", 128)
    ITERS = opts.get_int("iters", 64)
    REPS = opts.get_int("reps", 20)
    C = 48
    SIGN = np.int32(-2147483648)
    MASK = np.int32(~((1 << 10) - 1))

    def classify(a, u, v, t):
        s = jnp.sign(a)
        abs_a = a * s
        su = u * s
        sv = v * s
        stn = t * s
        valid = (
            (abs_a > 1e-12) & (su >= 0.0) & (sv >= 0.0)
            & (su + sv <= abs_a) & (stn > 1e-4 * abs_a)
        )
        return abs_a, stn, valid

    def select_update(valid, stn, abs_a, best_ref, div=True):
        best_row = best_ref[0:1, :]
        valid = valid & (stn < best_row * abs_a)
        denom = jnp.where(abs_a > 0.0, abs_a, 1.0)
        tt = jnp.where(valid, stn / denom if div else stn * denom, jnp.inf)
        bits = lax.bitcast_convert_type(tt, jnp.int32)
        iota_k = lax.broadcasted_iota(jnp.int32, tt.shape, 0)
        packed = jnp.min((bits & MASK) | iota_k, axis=0, keepdims=True)
        tk = lax.bitcast_convert_type(packed & MASK, jnp.float32)
        best_ref[0:1, :] = jnp.minimum(tk, best_row)

    def select_fused(m1, m2, stn, abs_a, best_ref):
        best_row = best_ref[0:1, :]
        m3 = jnp.minimum(m2, best_row * abs_a - stn)
        valid = (m1 >= 0.0) & (m3 > 0.0)
        numer = jnp.where(valid, stn, jnp.inf)
        tt = numer / abs_a
        bits = lax.bitcast_convert_type(tt, jnp.int32)
        iota_k = lax.broadcasted_iota(jnp.int32, tt.shape, 0)
        packed = jnp.min((bits & MASK) | iota_k, axis=0, keepdims=True)
        tk = lax.bitcast_convert_type(packed & MASK, jnp.float32)
        best_ref[0:1, :] = jnp.minimum(tk, best_row)

    def classify_fused(a, u, v, t):
        ab = lax.bitcast_convert_type(a, jnp.int32)
        sm = ab & SIGN
        abs_a = lax.bitcast_convert_type(ab ^ sm, jnp.float32)
        su = lax.bitcast_convert_type(
            lax.bitcast_convert_type(u, jnp.int32) ^ sm, jnp.float32
        )
        sv = lax.bitcast_convert_type(
            lax.bitcast_convert_type(v, jnp.int32) ^ sm, jnp.float32
        )
        stn = lax.bitcast_convert_type(
            lax.bitcast_convert_type(t, jnp.int32) ^ sm, jnp.float32
        )
        m1 = jnp.minimum(jnp.minimum(su, sv), abs_a - (su + sv))
        m2 = jnp.minimum(stn - 1e-4 * abs_a, abs_a - 1e-12)
        return abs_a, stn, m1, m2

    def kernel(slab_ref, rays_ref, out_ref, best_ref, variant="full"):
        slab = slab_ref[...]
        rays = rays_ref[...]
        best_ref[...] = jnp.full((1, SW), 3.0e38, jnp.float32)
        k = K

        def body(i, acc):
            # perturb the rays per iter so the matmul can't be hoisted
            r = rays + (i.astype(jnp.float32) * 1e-9)
            out = lax.dot_general(
                slab, r, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # [4K, SW]
            a = out[0 * k : 1 * k]
            u = out[1 * k : 2 * k]
            v = out[2 * k : 3 * k]
            t = out[3 * k : 4 * k]
            if variant == "none":
                best_ref[0:1, :] = jnp.minimum(
                    best_ref[0:1, :], jnp.min(a, axis=0, keepdims=True)
                )
            elif variant == "classify":
                abs_a, stn, valid = classify(a, u, v, t)
                best_ref[0:1, :] = jnp.minimum(
                    best_ref[0:1, :],
                    jnp.min(jnp.where(valid, stn, jnp.inf), axis=0,
                            keepdims=True),
                )
            elif variant == "nodiv":
                abs_a, stn, valid = classify(a, u, v, t)
                select_update(valid, stn, abs_a, best_ref, div=False)
            elif variant == "fused":
                abs_a, stn, m1, m2 = classify_fused(a, u, v, t)
                select_fused(m1, m2, stn, abs_a, best_ref)
            else:
                abs_a, stn, valid = classify(a, u, v, t)
                select_update(valid, stn, abs_a, best_ref)
            return acc

        lax.fori_loop(0, ITERS, body, jnp.float32(0.0))
        out_ref[...] = best_ref[...]

    rng = np.random.default_rng(0)
    slab = jnp.asarray(
        rng.standard_normal((C, 4 * K)), jnp.bfloat16
    )
    rays = jnp.asarray(rng.standard_normal((C, SW)), jnp.bfloat16)

    results = {}
    for variant in ("none", "classify", "nodiv", "full", "fused"):
        run = pl.pallas_call(
            functools.partial(kernel, variant=variant),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((1, SW), jnp.float32),
            scratch_shapes=[pltpu.VMEM((1, SW), jnp.float32)],
        )
        f = jax.jit(lambda s, r, run=run: run(s, r))
        o = f(slab, rays)
        jax.block_until_ready(o)
        t0 = time.time()
        for _ in range(REPS):
            o = f(slab, rays)
        jax.block_until_ready(o)
        dt = (time.time() - t0) / REPS / ITERS
        results[variant] = dt
        print(f"{variant:9s}: {dt*1e9:8.1f} ns/exec")

    mxu = 4 * K * SW * 128 / 197e12
    print(f"theoretical C->128 matmul charge: {mxu*1e9:8.1f} ns")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
