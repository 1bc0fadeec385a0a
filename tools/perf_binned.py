"""Binned pair-stream tracer vs the block kernel: on-chip wave A/Bs.

Atrium waves (the profile_visits recipe): coherent primary, trace-locally
SORTED secondary (what the integrator actually feeds the tracer), and the
unsorted secondary for reference. Per config prints wall ms, Mrays/s, hit
agreement vs the block kernel, and the binned capacity stats (pairs,
pcap/mcap drops, bin occupancy) that size the production defaults.

python tools/perf_binned.py [--ks=128,256] [--gs=8,16] [--pcap=16]
    [--mcapdiv=2] [--sb=1] [--block=2048] [--cpu]
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
    import jax
    import jax.numpy as jnp

    if opts.has("cpu"):
        jax.config.update("jax_platforms", "cpu")

    import numpy as np

    from stratum_tpu.ops import binned as sbinned
    from stratum_tpu.ops import pallas_trace as spallas
    from stratum_tpu.ops import packet as spacket
    from stratum_tpu.ops.bvh import morton3
    from stratum_tpu.ops.intersect import T_MAX, ray_offset
    from stratum_tpu.render import camera
    from stratum_tpu.render.shading import make_shading_point
    from stratum_tpu.core import math as smath
    from stratum_tpu.core import rng as srng
    from stratum_tpu.scene import builtin, flatten

    width = opts.get_int("width", 1920)
    height = opts.get_int("height", 1080)
    block = opts.get_int("block", 2048)
    ks = [int(k) for k in opts.get_str("ks", "128,256").split(",")]
    gs = [int(g) for g in opts.get_str("gs", "8,16").split(",")]
    pcap = opts.get_int("pcap", 16)
    mcapdiv = opts.get_int("mcapdiv", 2)
    sb = opts.get_int("sb", 1)
    em = opts.get_str("em", "ray")
    g = builtin.atrium()
    scene0, _ = flatten.flatten(g.root)
    node, cam = flatten.find_camera(g.root)
    view = camera.make_view(node.to_world(), cam.fovy, width, height)
    n = width * height
    px, py = camera.pixel_grid_tiled(width, height, 8, 64)
    u = jnp.full((n, 2), 0.5, jnp.float32)
    origin, direction = camera.generate_rays(view, px, py, u, width, height)
    pos_np = np.asarray(scene0.geo.positions)
    idx_np = np.asarray(scene0.geo.indices)
    valid = np.asarray(scene0.geo.tri_material) >= 0

    for k in ks:
        fat = spacket.build_fat_bvh_sah(pos_np, idx_np, valid, leaf_size=k)
        feat = spallas.pack_leaf_features(fat)
        print(f"K={k}: leaves={fat.num_leaves}", flush=True)

        # sorted secondary wave (probe_pairs recipe: cosine bounce off the
        # primary hit, octant+morton order, dead lanes parked at the tail)
        h0 = spallas.pallas_closest(fat, feat, origin, direction,
                                    block=block)
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
        os_, ds_ = o1[order], d1[order]
        ts_ = jnp.where(alive[order], T_MAX, 0.0)

        waves = (
            ("primary ", origin, direction,
             jnp.full((n,), T_MAX, jnp.float32)),
            ("secsort ", os_, ds_, ts_),
            # unsorted secondary (camera order): the reference wave for
            # how much of the binned win is the trace-local sort
            ("secraw  ", o1, d1, jnp.where(alive, T_MAX, 0.0)),
        )

        @jax.jit
        def block_closest(o, d, tm):
            h = spallas.pallas_closest(fat, feat, o, d, t_max=tm,
                                       block=block)
            return h.t, h.tri

        ref = {}
        for name, o_, d_, tm_ in waves:
            t_, tri_ = block_closest(o_, d_, tm_)
            fetch(t_)
            t0 = time.time()
            for _ in range(3):
                t_, tri_ = block_closest(o_, d_, tm_)
            fetch(t_)
            dt = (time.time() - t0) / 3
            ref[name] = (np.asarray(t_), np.asarray(tri_))
            print(
                f"  block             {name}: {dt*1e3:8.1f} ms "
                f"{n/dt/1e6:7.2f} Mrays/s",
                flush=True,
            )

        for gg in gs:
            mcap = -(-n // mcapdiv // 128) * 128

            @jax.jit
            def binned_closest(o, d, tm, gg=gg, mcap=mcap):
                h = sbinned.pallas_closest_binned(
                    fat, feat, o, d, t_max=tm, g=gg, pcap=pcap, mcap=mcap,
                    sb=sb, em=em,
                )
                return h.t, h.tri

            @jax.jit
            def binned_stats(o, d, tm, gg=gg, mcap=mcap):
                _, st = sbinned.pallas_closest_binned(
                    fat, feat, o, d, t_max=tm, g=gg, pcap=pcap, mcap=mcap,
                    sb=sb, em=em, with_stats=True,
                )
                return st

            for name, o_, d_, tm_ in waves:
                t_, tri_ = binned_closest(o_, d_, tm_)
                fetch(t_)
                t0 = time.time()
                for _ in range(3):
                    t_, tri_ = binned_closest(o_, d_, tm_)
                fetch(t_)
                dt = (time.time() - t0) / 3
                tn, trin = np.asarray(t_), np.asarray(tri_)
                tr, trir = ref[name]
                hit_agree = ((trin >= 0) == (trir >= 0)).mean()
                both = (trin >= 0) & (trir >= 0)
                t_agree = (
                    np.abs(tn[both] - tr[both])
                    <= 2e-3 * (1 + np.abs(tr[both]))
                ).mean() if both.any() else 1.0
                st = jax.tree.map(
                    lambda x: int(np.asarray(x)), binned_stats(o_, d_, tm_)
                )
                bw = sb * (128 // gg)  # pairs per grid STEP
                occ = st["pairs"] / max(st["bins_used"] * bw, 1)
                print(
                    f"  binned g={gg:2d} p={pcap} sb={sb} em={em[0]} {name}: "
                    f"{dt*1e3:8.1f} ms "
                    f"{n/dt/1e6:7.2f} Mrays/s  hit={hit_agree:.4f} "
                    f"t={t_agree:.4f}  pairs={st['pairs']/1e3:.0f}K "
                    f"bins={st['bins_used']/1e3:.0f}K occ={occ:.2f} "
                    f"dropP={st['dropped_pcap']} dropM={st['dropped_mcap']}",
                    flush=True,
                )


if __name__ == "__main__":
    main()
