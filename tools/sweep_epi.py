"""A/B epilogue-only chunk gating (pallas_trace epi_chunks): one full-slab
MXU matmul per surviving sub-block (the matmul is ~130 ns, negligible) with
the ~25-op VPU validity/argmin epilogue gated per intra-leaf chunk by the
existing per-chunk AABB pretests. This is the half of intra-leaf gating the
chunks=8 sweep could not isolate — that mode also split the matmul into 8
small passes, which is where it measured its 1.5-3x loss
(tools/sweep_chunks.py, STATUS.md).

Measures primary / sorted-secondary / occluded 2M-ray waves on the atrium
for epi_chunks in {1, 2, 4, 8}.

Usage: python tools/sweep_epi.py [--block=2048] [--subs=16] [--epi=1,2,4,8]
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
    import jax
    import jax.numpy as jnp
    import numpy as np

    from stratum_tpu.ops import pallas_trace as spallas
    from stratum_tpu.ops.bvh import morton3
    from stratum_tpu.ops.intersect import T_MAX, ray_offset
    from stratum_tpu.core import math as smath
    from stratum_tpu.core import rng as srng
    from stratum_tpu.render import camera
    from stratum_tpu.render.shading import make_shading_point
    from stratum_tpu.scene import builtin, flatten
    from stratum_tpu.utils.flags import Options

    opts = Options(sys.argv[1:])
    block = opts.get_int("block", 2048)
    subs = opts.get_int("subs", 16)
    epis = [int(x) for x in opts.get_str("epi", "1,2,4,8").split(",")]
    width, height = 1920, 1080

    g = builtin.atrium()
    scene, _ = flatten.flatten(g.root)
    node, cam = flatten.find_camera(g.root)
    view = camera.make_view(node.to_world(), cam.fovy, width, height)
    n = width * height
    fat = scene.fat_bvh
    feat = scene.leaf_feat_packed
    print(f"L={fat.num_leaves} K={fat.leaf_size} block={block} subs={subs}")

    px, py = camera.pixel_grid_tiled(width, height, 8, 64)
    u = jnp.full((n, 2), 0.5, jnp.float32)
    o0, d0 = camera.generate_rays(view, px, py, u, width, height)

    # sorted secondary rays off the primary hit (profile_visits recipe)
    h = jax.jit(
        lambda o, d: spallas.pallas_closest(fat, feat, o, d, block=block,
                                            subs=subs)
    )(o0, d0)
    sp = make_shading_point(scene.geo, h.tri, h.bary, d0)
    st = srng.rng_init(px, py, 7)
    uu, _ = srng.next_floats(st, 2)
    wi_local = smath.sample_cos_hemisphere(uu[..., 0], uu[..., 1])
    d1 = smath.to_world(wi_local, sp.shading_normal)
    o1 = ray_offset(sp.position, sp.geom_normal)
    alive = h.tri >= 0
    d1 = jnp.where(alive[:, None], d1, jnp.ones_like(d1))
    lo = jnp.min(scene.geo.positions, axis=0)
    hi = jnp.max(scene.geo.positions, axis=0)
    q = (o1 - lo) / jnp.maximum(hi - lo, 1e-9)
    octant = (
        (d1[..., 0] > 0).astype(jnp.uint32)
        | ((d1[..., 1] > 0).astype(jnp.uint32) << 1)
        | ((d1[..., 2] > 0).astype(jnp.uint32) << 2)
    )
    key = (octant << jnp.uint32(29)) | (morton3(q) >> jnp.uint32(3))
    key = jnp.where(alive, key, jnp.uint32(0xFFFFFFFF))
    order = jnp.argsort(key)
    o1s, d1s = o1[order], d1[order]
    tm_occ = jnp.where(alive, 20.0, 0.0)[order]

    def bench(f, *args):
        r = jax.block_until_ready(f(*args))
        t0 = time.time()
        for _ in range(3):
            r = f(*args)
        jax.block_until_ready(r)
        return (time.time() - t0) / 3 * 1e3

    ref = {}
    for epi in epis:
        cl = jax.jit(
            lambda o, d, e=epi: spallas.pallas_closest(
                fat, feat, o, d, block=block, subs=subs, epi_chunks=e
            ).t.sum()
        )
        oc = jax.jit(
            lambda o, d, tm, e=epi: spallas.pallas_occluded(
                fat, feat, o, d, tm, block=block, subs=subs, epi_chunks=e
            ).sum()
        )
        tp = bench(cl, o0, d0)
        ts = bench(cl, o1s, d1s)
        to = bench(oc, o1s, d1s, tm_occ)
        # correctness anchor: hit-t sum must match epi=1 exactly up to ties
        tsum = float(np.asarray(cl(o0, d0)))
        osum = float(np.asarray(oc(o1s, d1s, tm_occ)))
        if 1 in ref:
            dt = abs(tsum - ref[1][0]) / max(abs(ref[1][0]), 1e-9)
            do = abs(osum - ref[1][1])
            tag = f"  dt={dt:.2e} docc={do:.0f}"
        else:
            ref[1] = (tsum, osum)
            tag = ""
        print(
            f"epi={epi}: primary {tp:7.1f} ms ({n / tp / 1e3:5.1f} Mr/s)  "
            f"secondary {ts:7.1f} ms  occluded {to:7.1f} ms{tag}",
            flush=True,
        )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
