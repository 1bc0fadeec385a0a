"""Charged-volume-vs-leaf-size probe (companion to probe_pairs.py).

Rebuilds the atrium BVH at K in {64, 128, 256, 512} and reports the
g=128 charged volume (the current kernel's pretest granularity) on the
real primary and sorted-secondary waves, with the MXU-model time.

Measured (r4 session 6, NaN-pad-corrected): secondary commits at g=128
barely drop with K (440K/358K/277K/223K at K=64/128/256/512) while the
measured wave time is ~constant at ~0.7 us x commits — the kernel is
per-commit MACHINERY-bound at every K, and its MXU stream model (45-129
ms) sits 2.3-4x below the ~200 ms measurement. Pads note: an inverted
(lo=+big, hi=-big) AABB pad PASSES the slab test for every ray (the
per-axis min/max symmetrizes the bounds) — pad probe boxes with NaN.

python tools/probe_pairs_k.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/stratum_jax_cache")

from stratum_tpu.utils import jaxcache  # noqa: E402

jaxcache.enable()

BLOCK = 2048


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax import lax

    from stratum_tpu.ops import pallas_trace as spallas
    from stratum_tpu.ops import packet as spacket
    from stratum_tpu.ops.intersect import T_MAX
    from stratum_tpu.render import camera
    from stratum_tpu.scene import builtin, flatten

    width, height = 1920, 1080
    g = builtin.atrium()
    scene, _ = flatten.flatten(g.root)
    node, cam = flatten.find_camera(g.root)
    view = camera.make_view(node.to_world(), cam.fovy, width, height)
    n = width * height
    fat0 = scene.fat_bvh

    px, py = camera.pixel_grid_tiled(width, height, 8, 64)
    u = jnp.full((n, 2), 0.5, jnp.float32)
    o0, d0 = camera.generate_rays(view, px, py, u, width, height)

    closest0 = jax.jit(
        lambda o, d: spallas.pallas_closest(
            fat0, scene.leaf_feat_packed, o, d, block=BLOCK
        )
    )
    h0 = closest0(o0, d0)

    from stratum_tpu.core import math as smath
    from stratum_tpu.core import rng as srng
    from stratum_tpu.ops.bvh import morton3
    from stratum_tpu.ops.intersect import ray_offset
    from stratum_tpu.render.shading import make_shading_point

    sp = make_shading_point(scene.geo, h0.tri, h0.bary, d0)
    st = srng.rng_init(px, py, 7)
    uu, _ = srng.next_floats(st, 2)
    wi_local = smath.sample_cos_hemisphere(uu[..., 0], uu[..., 1])
    d1 = smath.to_world(wi_local, sp.shading_normal)
    o1 = ray_offset(sp.position, sp.geom_normal)
    alive = h0.tri >= 0
    d1 = jnp.where(alive[:, None], d1, jnp.ones_like(d1))
    glo = jnp.min(scene.geo.positions, axis=0)
    ghi = jnp.max(scene.geo.positions, axis=0)
    q = (o1 - glo) / jnp.maximum(ghi - glo, 1e-9)
    octant = (
        (d1[..., 0] > 0).astype(jnp.uint32)
        | ((d1[..., 1] > 0).astype(jnp.uint32) << 1)
        | ((d1[..., 2] > 0).astype(jnp.uint32) << 2)
    )
    key = (octant << jnp.uint32(29)) | (morton3(q) >> jnp.uint32(3))
    key = jnp.where(alive, key, jnp.uint32(0xFFFFFFFF))
    order = jnp.argsort(key)
    os_, ds_ = o1[order], d1[order]
    t_alive = jnp.where(alive[order], T_MAX, 0.0)

    def volume(fat, K, o, d, tb, tag):
        L = fat.num_leaves
        Lpad = -(-L // 64) * 64
        lo = jnp.pad(fat.leaf_lo, ((0, Lpad - L), (0, 0)),
                     constant_values=float('nan'))
        hi = jnp.pad(fat.leaf_hi, ((0, Lpad - L), (0, 0)),
                     constant_values=float('nan'))

        @jax.jit
        def probe(o, d, t_bound):
            nb = o.shape[0] // BLOCK
            ob = o[: nb * BLOCK].reshape(nb, BLOCK, 3)
            db = d[: nb * BLOCK].reshape(nb, BLOCK, 3)
            tbb = t_bound[: nb * BLOCK].reshape(nb, BLOCK)

            def per_block(args):
                ob, db, tb = args
                inv = jnp.where(
                    jnp.abs(db) > 1e-20, 1.0 / db,
                    jnp.sign(db) * 1e20 + 1e20
                )

                def leaf_chunk(carry, idx):
                    lo_c = lax.dynamic_slice(lo, (idx, 0), (64, 3))
                    hi_c = lax.dynamic_slice(hi, (idx, 0), (64, 3))
                    t0 = (lo_c[None] - ob[:, None]) * inv[:, None]
                    t1 = (hi_c[None] - ob[:, None]) * inv[:, None]
                    tn = jnp.maximum(jnp.max(jnp.minimum(t0, t1), -1), 0.0)
                    tf = jnp.min(jnp.maximum(t0, t1), -1)
                    p = (tn <= tf) & (tn < tb[:, None])
                    pg = p.reshape(BLOCK // 128, 128, 64).any(axis=1)
                    return carry, pg.sum(axis=0).astype(jnp.int32)

                _, cc = lax.scan(
                    leaf_chunk, 0,
                    jnp.arange(0, Lpad, 64, dtype=jnp.int32),
                )
                return cc.reshape(Lpad)

            return lax.map(per_block, (ob, db, tbb), batch_size=8)

        w = np.asarray(probe(o, d, tb))
        commits = int(w.sum())
        rows = commits * (4 * K + 128)
        mxu_ms = rows / (4 * 0.94e9) * 1e3
        print(
            f"  {tag}: L={L:5d} commits {commits/1e3:8.1f}K  "
            f"stream rows {rows/1e6:8.1f}M  mxu-model ~{mxu_ms:7.1f}ms"
        )

    for K in (64, 128, 256, 512):
        fat = spacket.build_fat_bvh_sah(
            scene.geo.positions, scene.geo.indices,
            scene.geo.tri_material >= 0, leaf_size=K,
        )
        print(f"K={K}:")
        volume(fat, K, os_, ds_, t_alive, "secondary inf  ")
        volume(fat, K, o0, d0,
               jnp.full((n,), T_MAX, jnp.float32), "primary   inf  ")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
