"""Group-streaming (K, gs) sweep on the atrium: isolated waves + e2e.

The roofline memo's lever: candidate unit = gs id-consecutive leaves,
ONE DMA per group, unrolled member commits with carried gate words — so
the per-visit fixed costs that made K < 256 lose amortize over gs, and
small-K slabs (whose MXU streams are proportionally cheaper) become
affordable. Baselines: gs=1 at the same K, and the K=512 default.

python tools/perf_gs.py [--ks=64,128,256] [--gss=2,4,8] [--block=2048]
    [--e2e] [--spp=3] [--gates=0,1]

--gates sweeps GS_GATE (member-gated group DMAs): gate=1 fetches each
group member under its own pretest-word-gated DMA, so members no
sub-block can reach cost no HBM traffic (the reason gs > 1 lost on
sorted-secondary waves). gate is skipped at gs=1 (no groups to gate).
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

    from stratum_tpu.ops import pallas_trace as spallas
    from stratum_tpu.ops import packet as spacket
    from stratum_tpu.render import camera, integrator
    from stratum_tpu.scene import builtin, flatten

    width = opts.get_int("width", 1920)
    height = opts.get_int("height", 1080)
    block = opts.get_int("block", 2048)
    spp = opts.get_int("spp", 3)
    run_e2e = opts.has("e2e")
    ks = [int(k) for k in opts.get_str("ks", "64,128,256").split(",")]
    gss = [int(g) for g in opts.get_str("gss", "1,4,8").split(",")]
    gates = [int(g) for g in opts.get_str("gates", "1").split(",")]
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
    rng = np.random.default_rng(7)

    for k in ks:
        fat = spacket.build_fat_bvh_sah(pos_np, idx_np, valid, leaf_size=k)
        feat = spallas.pack_leaf_features(fat)
        scene = flatten.replace_bvh(scene0, fat, feat)
        print(f"K={k}: leaves={fat.num_leaves}", flush=True)

        h0 = spallas.pallas_closest(fat, feat, origin, direction,
                                    block=block)
        hp = origin + direction * jnp.minimum(h0.t, 1e6)[:, None]
        un = rng.random((n, 3), np.float32) * 2.0 - 1.0
        sd = jnp.asarray(
            un / np.maximum(np.linalg.norm(un, axis=-1, keepdims=True), 1e-9)
        )
        so = hp - direction * 1e-3
        t_occ = jnp.full((n,), 50.0, jnp.float32)

        combos = [(1, 0)] + [
            (g_, gate) for g_ in gss if g_ > 1 for gate in gates
        ]
        for gs, gate in combos:
            tag = f"gs={gs}" + (f" gate={gate}" if gs > 1 else "")

            @jax.jit
            def closest(o, d, gs=gs, gate=gate):
                h = spallas.pallas_closest(
                    fat, feat, o, d, block=block, gs=gs, gs_gate=bool(gate)
                )
                return h.t.sum(), h.tri.sum()

            @jax.jit
            def occl(o, d, t, gs=gs, gate=gate):
                return spallas.pallas_occluded(
                    fat, feat, o, d, t, block=block, gs=gs,
                    gs_gate=bool(gate)
                ).sum()

            for name, (o_, d_) in (
                ("primary", (origin, direction)),
                ("secondary", (so, sd)),
            ):
                ts, tri = closest(o_, d_)
                fetch(ts)
                t0 = time.time()
                for _ in range(3):
                    s, tri = closest(o_, d_)
                fetch(s)
                dt = (time.time() - t0) / 3
                print(
                    f"  {tag} {name:9s}: {dt*1e3:8.1f} ms "
                    f"{n/dt/1e6:7.2f} Mrays/s (tri {fetch(tri):.0f})",
                    flush=True,
                )
            fetch(occl(so, sd, t_occ))
            t0 = time.time()
            for _ in range(3):
                s = occl(so, sd, t_occ)
            fetch(s)
            dt = (time.time() - t0) / 3
            print(
                f"  {tag} occluded : {dt*1e3:8.1f} ms "
                f"{n/dt/1e6:7.2f} Mrays/s (sum {fetch(s):.0f})",
                flush=True,
            )

            if not run_e2e:
                continue
            cfg = integrator.RenderConfig(
                width=width, height=height, max_bounces=4, bsdf="disney",
                presample_lights=4096, coherent_tiles=16, tracer="pallas",
                gs=gs, gs_gate=gate if gs > 1 else -1,
            )
            rpc = integrator.render_path_with_counts
            img, n_rays = rpc(scene, view, cfg, 0)
            fetch(n_rays)
            t0 = time.time()
            tot = 0
            for s in range(1, spp + 1):
                img, n_rays = rpc(scene, view, cfg, s)
                tot += int(fetch(n_rays))
            dt = (time.time() - t0) / spp
            print(
                f"  {tag} e2e b4   : {dt*1e3:8.1f} ms/spp "
                f"{tot/spp/dt/1e6:7.2f} Mrays/s "
                f"(img mean {float(np.asarray(img).mean()):.4f})",
                flush=True,
            )


if __name__ == "__main__":
    main()
