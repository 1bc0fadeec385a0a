"""Sub-block-width sweep for the Pallas closest kernel: wall time and
matmul-visit counts (n_exec) at subs in {8, 16, 32} (sub widths 256 /
128 / 64 lanes at block=2048), on a coherent primary wave and a sorted
secondary wave.

Decides whether DYNAMIC SUB PAIRING has headroom: two 64-lane sub-blocks
wanting the same leaf could share one [4K, 128] matmul (block-diagonal
C=96 contraction), so if n_exec(subs=32) < 2 x n_exec(subs=16) the
pairable fraction is real. A ratio near 2 means adjacent halves always
co-want and pairing is a no-op.

Usage: python tools/sweep_subs.py [--scene=atrium]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/stratum_jax_cache")

from stratum_tpu.utils import jaxcache  # noqa: E402

jaxcache.enable()


def main():
    width, height = 1920, 1080

    import jax
    import jax.numpy as jnp
    import numpy as np

    from stratum_tpu.render import camera
    from stratum_tpu.scene import builtin, flatten
    from stratum_tpu.ops import pallas_trace as spallas
    from stratum_tpu.ops.intersect import T_MAX
    from stratum_tpu.utils.flags import Options

    opts = Options(sys.argv[1:])
    g = getattr(builtin, opts.get_str("scene", "atrium"))()
    scene, _ = flatten.flatten(g.root)
    node, cam = flatten.find_camera(g.root)
    view = camera.make_view(node.to_world(), cam.fovy, width, height)
    n = width * height
    geo = scene.geo
    fat = scene.fat_bvh
    nc_eff = spallas._effective_chunks(fat.leaf_size)
    print(f"L={fat.num_leaves} leaves of K={fat.leaf_size}")

    px, py = camera.pixel_grid_tiled(width, height, 8, 64)
    u = jnp.full((n, 2), 0.5, jnp.float32)
    o0, d0 = camera.generate_rays(view, px, py, u, width, height)

    def run_raw(o, d, subs):
        @jax.jit
        def f(o, d):
            tm = jnp.full((n,), T_MAX, jnp.float32)
            rays, geom, cand, centry, ncand, _ = spallas._prepare(
                fat, o, d, 1e-4, tm, 2048
            )
            out = spallas._run_blocks(
                rays, geom, cand, centry, ncand,
                spallas.pack_leaf_aabbs(fat, nc_eff),
                scene.leaf_feat_packed,
                block=2048, mode=spallas.MT_MODE, subs=subs, chunks=nc_eff,
            )
            return out

        out = jax.block_until_ready(f(o, d))
        t0 = time.time()
        for _ in range(5):
            out = f(o, d)
        jax.block_until_ready(out)
        dt = (time.time() - t0) / 5
        return out, dt

    def report(name, o, d):
        base_exec = None
        for subs in (1, 2, 4, 8, 16):
            out, dt = run_raw(o, d, subs)
            execs = np.asarray(out[:, 3, 0])
            iters = np.asarray(out[:, 2, 0])
            ratio = (
                "" if base_exec is None
                else f"  exec-ratio vs subs=8: {execs.mean() / base_exec:.2f}"
            )
            if base_exec is None:
                base_exec = execs.mean()
            print(
                f"{name} subs={subs:2d} (sw={2048 // subs:3d}): "
                f"{dt * 1e3:7.1f} ms  iters {iters.mean():6.1f}  "
                f"execs {execs.mean():7.1f}{ratio}"
            )

    report("primary  ", o0, d0)

    # sorted secondary (cosine bounce off the primary hits, same key as
    # the trace-local sort uses)
    h = jax.jit(
        lambda o, d: spallas.pallas_closest(
            fat, scene.leaf_feat_packed, o, d, block=2048
        )
    )(o0, d0)
    from stratum_tpu.core import rng as srng
    from stratum_tpu.core import math as smath
    from stratum_tpu.render.shading import make_shading_point
    from stratum_tpu.ops.intersect import ray_offset
    from stratum_tpu.ops import raysort

    sp = make_shading_point(geo, h.tri, h.bary, d0)
    st = srng.rng_init(px, py, 7)
    uu, _ = srng.next_floats(st, 2)
    wi_local = smath.sample_cos_hemisphere(uu[..., 0], uu[..., 1])
    d1 = smath.to_world(wi_local, sp.shading_normal)
    o1 = ray_offset(sp.position, sp.geom_normal)
    alive = h.tri >= 0
    d1 = jnp.where(alive[:, None], d1, jnp.ones_like(d1))
    lo = jnp.min(geo.positions, axis=0)
    hi = jnp.max(geo.positions, axis=0)
    tm1 = jnp.where(alive, T_MAX, 0.0)
    key = raysort.ray_key(o1, d1, tm1, lo, hi)
    order = jnp.argsort(key)
    report("secondary", o1[order], d1[order])
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
