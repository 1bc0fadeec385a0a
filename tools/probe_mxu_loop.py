"""Why doesn't perf_commit_pipeline scale with iters? Minimal probe: a
Pallas kernel that runs a fori_loop of [48,4K]x[48,B] bf16 dots with a
non-eliminable accumulate, timed at several trip counts. If total time is
flat in iters, the loop body is being folded/elided and every past
per-commit microbench number is invalid; if it scales, the commit cost is
real and the pipeline question can be trusted.

python tools/probe_mxu_loop.py [--k=1024]
"""

from __future__ import annotations

import functools
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/stratum_jax_cache")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from stratum_tpu.utils import jaxcache

jaxcache.enable()

B = 128
NL = 4


def _kernel(rays_ref, feat_ref, o_ref, acc, *, iters, dep):
    rays = rays_ref[...]
    acc[...] = jnp.zeros_like(acc[...])
    dims = (((0,), (0,)), ((), ()))

    def body(i, carry):
        slab = feat_ref[lax.rem(i, NL)]
        if dep:
            # loop-carried data dependency INTO the matmul operand: no
            # iteration can be CSE'd or reordered
            r = rays + carry.astype(jnp.bfloat16)
            out = lax.dot_general(slab, r, dims,
                                  preferred_element_type=jnp.float32)
        else:
            out = lax.dot_general(slab, rays, dims,
                                  preferred_element_type=jnp.float32)
        acc[0:1, :] = acc[0:1, :] + out[0:1, :]
        return carry + out[0, 0] * 1e-30

    c = lax.fori_loop(0, iters, body, jnp.float32(0.0))
    o_ref[0:1, :] = acc[0:1, :] + c


@functools.partial(jax.jit, static_argnames=("iters", "dep"))
def run(rays, feat, iters, dep):
    return pl.pallas_call(
        functools.partial(_kernel, iters=iters, dep=dep),
        grid=(1,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((1, B), jnp.float32),
        scratch_shapes=[pltpu.VMEM((1, B), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
    )(rays, feat)


def main():
    from stratum_tpu.utils.flags import Options

    opts = Options(sys.argv[1:])
    k = opts.get_int("k", 1024)
    print(f"devices: {jax.devices()}  k={k}")
    import numpy as np

    rng = np.random.default_rng(0)
    rays = jnp.asarray(
        rng.random((48, B), np.float32) * 0.5
    ).astype(jnp.bfloat16)
    feat = jnp.asarray(
        rng.random((NL, 48, 4 * k), np.float32) * 0.5
    ).astype(jnp.bfloat16)
    for dep in (False, True):
        prev = None
        for iters in (256, 1024, 4096):
            out = run(rays, feat, iters, dep)
            out.block_until_ready()
            t0 = time.perf_counter()
            reps = 8
            for _ in range(reps):
                out = run(rays, feat, iters, dep)
            out.block_until_ready()
            dt = (time.perf_counter() - t0) / reps
            scale = "" if prev is None else f"  x{dt/prev:.2f} vs prev"
            prev = dt
            print(f"  dep={int(dep)} iters={iters:5d}: {dt*1e3:8.3f} ms "
                  f"{dt/iters*1e9:8.1f} ns/iter{scale} "
                  f"(out[0,0]={float(out[0, 0]):.4e})", flush=True)


if __name__ == "__main__":
    main()
