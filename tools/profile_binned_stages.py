"""Per-stage attribution of the binned pair-stream tracer pipeline.

perf_binned (r5) measured binned secsort ~1.9x SLOWER than the block
kernel with only ~17 ms of modeled MXU in its bins — the cost lives in
the XLA prep stages. This times cumulative cuts of _binned_trace
(emit -> sort -> pad -> gather -> kernel -> full) on the atrium sorted
secondary wave; deltas attribute each stage. Same-process interleaved,
3 reps each.

python tools/profile_binned_stages.py [--k=256] [--g=8] [--pcap=16] [--sb=1]
"""

from __future__ import annotations

import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/stratum_jax_cache")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from stratum_tpu.utils import jaxcache  # noqa: E402

jaxcache.enable()


def fetch(x):
    import numpy as np

    return float(np.asarray(x).reshape(-1)[0])


def main():
    from stratum_tpu.utils.flags import Options

    opts = Options(sys.argv[1:])
    k = opts.get_int("k", 256)
    g = opts.get_int("g", 8)
    pcap = opts.get_int("pcap", 16)
    sb = opts.get_int("sb", 1)
    em = opts.get_str("em", "ray")
    import jax
    import jax.numpy as jnp
    import numpy as np

    from stratum_tpu.ops import binned as sbinned
    from stratum_tpu.ops import packet as spacket
    from stratum_tpu.ops import pallas_trace as spallas
    from stratum_tpu.ops.bvh import morton3
    from stratum_tpu.ops.intersect import T_MAX, ray_offset
    from stratum_tpu.core import math as smath
    from stratum_tpu.core import rng as srng
    from stratum_tpu.render import camera
    from stratum_tpu.render.shading import make_shading_point
    from stratum_tpu.scene import builtin, flatten

    width, height = 1920, 1080
    gph = builtin.atrium()
    scene0, _ = flatten.flatten(gph.root)
    node, cam = flatten.find_camera(gph.root)
    view = camera.make_view(node.to_world(), cam.fovy, width, height)
    n = width * height
    px, py = camera.pixel_grid_tiled(width, height, 8, 64)
    u = jnp.full((n, 2), 0.5, jnp.float32)
    origin, direction = camera.generate_rays(view, px, py, u, width, height)
    pos_np = np.asarray(scene0.geo.positions)
    idx_np = np.asarray(scene0.geo.indices)
    valid = np.asarray(scene0.geo.tri_material) >= 0
    fat = spacket.build_fat_bvh_sah(pos_np, idx_np, valid, leaf_size=k)
    feat = spallas.pack_leaf_features(fat)
    print(f"K={k} leaves={fat.num_leaves} g={g} pcap={pcap} sb={sb} em={em}", flush=True)

    h0 = spallas.pallas_closest(fat, feat, origin, direction, block=2048)
    sp = make_shading_point(scene0.geo, h0.tri, h0.bary, direction)
    st = srng.rng_init(px, py, 7)
    uu, _ = srng.next_floats(st, 2)
    wi = smath.to_world(
        smath.sample_cos_hemisphere(uu[..., 0], uu[..., 1]),
        sp.shading_normal,
    )
    o1 = ray_offset(sp.position, sp.geom_normal)
    alive = h0.tri >= 0
    d1 = jnp.where(alive[:, None], wi, jnp.ones_like(wi))
    glo = jnp.min(scene0.geo.positions, axis=0)
    ghi = jnp.max(scene0.geo.positions, axis=0)
    q = (o1 - glo) / jnp.maximum(ghi - glo, 1e-9)
    octant = (
        (d1[..., 0] > 0).astype(jnp.uint32)
        | ((d1[..., 1] > 0).astype(jnp.uint32) << 1)
        | ((d1[..., 2] > 0).astype(jnp.uint32) << 2)
    )
    key = (octant << jnp.uint32(29)) | (morton3(q) >> jnp.uint32(3))
    key = jnp.where(alive, key, jnp.uint32(0xFFFFFFFF))
    order = jnp.argsort(key)
    os_ = jax.device_put(o1[order]).block_until_ready()
    ds_ = jax.device_put(d1[order]).block_until_ready()
    ts_ = jax.device_put(
        jnp.where(alive[order], T_MAX, 0.0)
    ).block_until_ready()

    mcap = -(-n // 2 // 128) * 128
    s = min(sbinned._SLICE, -(-n // g) * g)
    npad = -(-n // s) * s
    op = jnp.pad(os_, ((0, npad - n), (0, 0)))
    dp = jnp.pad(ds_, ((0, npad - n), (0, 0)), constant_values=1.0)
    tp = jnp.pad(ts_, (0, npad - n))

    stages = ["emit", "sort", "pad", "gather", "kernel", None]
    prev = 0.0
    for stage in stages:
        def run(stage=stage):
            pm, lw, st_ = sbinned._binned_trace(
                op, dp, tp, jnp.float32(1e-4), fat.leaf_lo, fat.leaf_hi,
                feat, g=g, pcap=pcap, mcap=int(mcap), stage=stage, sb=sb,
                em=em,
            )
            return pm.sum()

        fetch(run())  # compile + warm
        t0 = time.time()
        for _ in range(3):
            r = run()
        fetch(r)
        dt = (time.time() - t0) / 3 * 1e3
        name = stage or "full"
        print(f"  cum {name:7s}: {dt:8.1f} ms  (delta {dt - prev:+8.1f})",
              flush=True)
        prev = dt


if __name__ == "__main__":
    main()
