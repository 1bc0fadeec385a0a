"""Occupancy probe for the pair-stream tracer candidate (r4 session 6).

The roofline memo's one large term is charged MXU volume: ~600K slab rows
per 2048-ray block vs a ~25-30K useful union — and every K/gating sweep
measured the volume INVARIANT, because the pretest granularity is a
128-lane sub-block: 128 incoherent rays collectively pass almost every
candidate AABB, so commits charge full-width slabs for lanes that want
nothing. This probe measures, on the REAL bench waves (atrium primary /
sorted secondary / unsorted secondary), the AABB pass rate at lane-group
granularities g in {1, 8, 32, 128} against (a) t_max = inf (what a
one-pass pair scheme with no early exit must charge) and (b) the true
hit t (the perfect-early-exit lower bound). From the g-granular group
counts it derives, for a pair-packing tracer that gathers wanting
g-groups into dense 128-lane commits:

  pairs      = sum over (block, leaf) of wanting g-groups
  commits    = sum ceil(w_{b,l} / (128/g))  (packing waste at group size)
  MXU rows   = commits * 4K  (one [48,4K]x[48,128] slab stream each)
  gather tax = pairs * g rows * 7 ns (ray rows moved into commit order)

and compares against the current kernel's measured exec counts. This is
the go/no-go number for the pair-stream kernel build.

Measured (r4 session 6, atrium K=256, NaN-pad-corrected): secondary
sorted inf — g=1 pairs 3.30M (1.6 wanted leaves/ray), g=128 commits
280K (0.26 occupancy, 86 ms MXU model) vs g=1 global-packed ~26K
commits (~10 ms); primary is coherent (g=1 == g=128 within 13%).
WARNING: pad probe AABBs with NaN — an inverted (lo=+big, hi=-big) box
PASSES the slab test for every ray (per-axis min/max symmetrizes), and
the first run of this probe was dominated by pad-leaf pairs.

python tools/probe_pairs.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/stratum_jax_cache")

from stratum_tpu.utils import jaxcache  # noqa: E402

jaxcache.enable()

BLOCK = 2048
GS = (1, 8, 32, 128)


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax import lax

    from stratum_tpu.ops import pallas_trace as spallas
    from stratum_tpu.ops.intersect import T_MAX
    from stratum_tpu.render import camera
    from stratum_tpu.scene import builtin, flatten

    width, height = 1920, 1080
    g = builtin.atrium()
    scene, _ = flatten.flatten(g.root)
    node, cam = flatten.find_camera(g.root)
    view = camera.make_view(node.to_world(), cam.fovy, width, height)
    n = width * height
    fat = scene.fat_bvh
    L = fat.num_leaves
    K = fat.leaf_size
    print(f"L={L} leaves of K={K}; wave n={n}")

    px, py = camera.pixel_grid_tiled(width, height, 8, 64)
    u = jnp.full((n, 2), 0.5, jnp.float32)
    o0, d0 = camera.generate_rays(view, px, py, u, width, height)

    closest = jax.jit(
        lambda o, d: spallas.pallas_closest(
            fat, scene.leaf_feat_packed, o, d, block=BLOCK
        )
    )

    lo = fat.leaf_lo  # [L, 3]
    hi = fat.leaf_hi

    @jax.jit
    def probe(o, d, t_bound):
        """Per-block, per-leaf wanting-group counts at each granularity.

        Returns counts [len(GS), nb, L] int32 (w_{g,b,l} = number of
        g-lane groups in block b with any ray passing leaf l's slab test
        against its t bound)."""
        nb = o.shape[0] // BLOCK  # trailing partial block dropped (<0.1%)
        ob = o[: nb * BLOCK].reshape(nb, BLOCK, 3)
        db = d[: nb * BLOCK].reshape(nb, BLOCK, 3)
        tb = t_bound[: nb * BLOCK].reshape(nb, BLOCK)

        def per_block(args):
            ob, db, tb = args
            inv = jnp.where(
                jnp.abs(db) > 1e-20, 1.0 / db, jnp.sign(db) * 1e20 + 1e20
            )
            # [BLOCK, L, 3] broadcasting in chunks over L to bound memory
            def leaf_chunk(carry, idx):
                lo_c = lax.dynamic_slice(lo, (idx, 0), (64, 3))
                hi_c = lax.dynamic_slice(hi, (idx, 0), (64, 3))
                t0 = (lo_c[None] - ob[:, None]) * inv[:, None]  # [B,64,3]
                t1 = (hi_c[None] - ob[:, None]) * inv[:, None]
                tn = jnp.max(jnp.minimum(t0, t1), axis=-1)
                tn = jnp.maximum(tn, 0.0)
                tf = jnp.min(jnp.maximum(t0, t1), axis=-1)
                p = (tn <= tf) & (tn < tb[:, None])  # [B, 64]
                outs = []
                for gg in GS:
                    pg = p.reshape(BLOCK // gg, gg, 64).any(axis=1)
                    outs.append(pg.sum(axis=0).astype(jnp.int32))  # [64]
                return carry, jnp.stack(outs)  # [len(GS), 64]

            _, cc = lax.scan(
                leaf_chunk, 0, jnp.arange(0, Lpad, 64, dtype=jnp.int32)
            )  # [Lpad/64, len(GS), 64]
            return jnp.transpose(cc, (1, 0, 2)).reshape(len(GS), Lpad)

        return lax.map(per_block, (ob, db, tb), batch_size=8)

    Lpad = -(-L // 64) * 64
    lo = jnp.pad(lo, ((0, Lpad - L), (0, 0)), constant_values=float('nan'))
    hi = jnp.pad(hi, ((0, Lpad - L), (0, 0)), constant_values=float('nan'))

    def report(name, o, d, t_true):
        print(f"\n== {name} ==")
        for tmode, tb in (("inf", jnp.full((n,), T_MAX, jnp.float32)),
                          ("true-t", t_true)):
            counts = np.asarray(probe(o, d, tb))  # [nb, len(GS), Lpad]
            for gi, gg in enumerate(GS):
                w = counts[:, gi, :]  # [nb, L]
                pairs = int(w.sum())
                per_commit = 128 // gg
                commits = int(np.ceil(w / per_commit).sum())
                rows = commits * 4 * K
                mxu_ms = rows * (4 * K + 128) / (4 * 0.94e9) / (4 * K) * 1e3
                gather_ms = pairs * gg * 7e-9 * 1e3
                print(
                    f"  t={tmode:6s} g={gg:4d}: pairs {pairs/1e6:8.2f}M  "
                    f"commits {commits/1e3:8.1f}K  rows {rows/1e6:8.1f}M  "
                    f"mxu~{mxu_ms:7.1f}ms  gather~{gather_ms:7.1f}ms  "
                    f"occup {pairs * gg / max(commits * 128, 1):.2f}"
                )

    # primary wave
    h0 = closest(o0, d0)
    report("primary", o0, d0, jnp.asarray(h0.t))

    # sorted + unsorted secondary (the profile_visits recipe)
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
    # dead lanes: zero t bound so they pass nothing (the kernel's sort
    # parks them in tail blocks the same way)
    h1 = closest(os_, ds_)
    t_true = jnp.where(alive[order], jnp.asarray(h1.t), 0.0)
    report("secondary sorted", os_, ds_,
           jnp.where(alive[order], t_true, 0.0))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
