"""End-to-end A/B of the binned pair-stream composition on the bench
config: block kernel everywhere (baseline) vs binned on the sorted
secondary closest waves and/or the deferred occlusion wave (the coherent
primary peel always stays on the block kernel — it is the wave class the
group-streaming block kernel wins hardest).

Interleaved reps (baseline / variant alternating) so tunnel drift cancels;
prints ms/spp + Mrays/s per config and the image-mean delta vs baseline
(the binned tracer must not change the estimator).

python tools/perf_binned_e2e.py [--k=256] [--scene=atrium]
    [--cfgs=8:0,8:8,16:16] [--sb=4] [--pcap=16] [--spp=3] [--rounds=2]
    [--width=1920] [--height=1080]

--cfgs entries are  binned_secondary_g : binned_shadow_g  (0 = block).
"""

from __future__ import annotations

import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/stratum_jax_cache")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from stratum_tpu.utils import jaxcache  # noqa: E402

jaxcache.enable()


def main():
    import dataclasses

    import numpy as np

    from stratum_tpu.utils.flags import Options

    opts = Options(sys.argv[1:])
    import jax

    if opts.has("cpu"):
        jax.config.update("jax_platforms", "cpu")

    from stratum_tpu.ops import packet as spacket
    from stratum_tpu.render import camera, integrator
    from stratum_tpu.scene import builtin, flatten

    width = opts.get_int("width", 1920)
    height = opts.get_int("height", 1080)
    spp = opts.get_int("spp", 3)
    rounds = opts.get_int("rounds", 2)
    k = opts.get_int("k", 256)
    sb = opts.get_int("sb", 4)
    pcap = opts.get_int("pcap", 16)
    em = opts.get_str("em", "ray")
    cfgs = [
        tuple(int(x) for x in c.split(":"))
        for c in opts.get_str("cfgs", "8:0,8:8").split(",")
    ]
    scene_name = opts.get_str("scene", "atrium")
    g = getattr(builtin, scene_name)()
    scene0, _ = flatten.flatten(g.root)
    node, cam = flatten.find_camera(g.root)
    view = camera.make_view(node.to_world(), cam.fovy, width, height)

    pos_np = np.asarray(scene0.geo.positions)
    idx_np = np.asarray(scene0.geo.indices)
    valid = np.asarray(scene0.geo.tri_material) >= 0
    fat = spacket.build_fat_bvh_sah(pos_np, idx_np, valid, leaf_size=k)
    scene = flatten.replace_bvh(scene0, fat)
    print(f"K={k}: leaves={fat.num_leaves} sb={sb} pcap={pcap} em={em}", flush=True)

    base = integrator.RenderConfig(
        width=width, height=height, max_bounces=4, bsdf="disney",
        presample_lights=4096, coherent_tiles=16,
    )
    n_rays_per_spp = None

    def bench_cfg(cfg):
        img = None
        tot = 0.0
        for s in range(spp):
            t0 = time.time()
            img, n_rays = integrator.render_path_with_counts(
                scene, view, cfg, s + 1
            )
            jax.block_until_ready(img)
            tot += time.time() - t0
        return tot / spp, float(np.asarray(img).mean()), int(
            np.asarray(n_rays)
        )

    variants = [("block baseline", base)]
    for gsec, gsha in cfgs:
        cfg = dataclasses.replace(
            base, binned_secondary=gsec, binned_shadow=gsha,
            binned_pcap=pcap, binned_sb=sb, binned_em=em,
        )
        variants.append((f"binned sec={gsec} sha={gsha}", cfg))
        if opts.has("mix") and gsec:
            for nb in (1, 2):
                variants.append((
                    f"mix binned_bounces={nb}",
                    dataclasses.replace(
                        base, binned_bounces=nb, binned_secondary=0,
                        binned_pcap=pcap, binned_sb=sb, binned_em=em,
                    ),
                ))
        if opts.has("nosort") and gsec:
            # binned secraw ~= secsort (r5 session 2): the emit IS the
            # binning, so skip the trace-local sort for the binned waves
            variants.append((
                f"binned sec={gsec} sha={gsha} nosort",
                dataclasses.replace(cfg, sort_rays=False),
            ))

    # compile everything once (excluded from timing)
    for name, cfg in variants:
        t0 = time.time()
        _, nr = integrator.render_path_with_counts(scene, view, cfg, 0)
        jax.block_until_ready(nr)
        n_rays_per_spp = int(np.asarray(nr))
        print(f"  compiled {name}: {time.time()-t0:.0f}s", flush=True)

    sums = {name: [] for name, _ in variants}
    means = {}
    for r in range(rounds):
        for name, cfg in variants:
            dt, mean, _ = bench_cfg(cfg)
            sums[name].append(dt)
            means[name] = mean
            print(
                f"  round {r}: {name:24s} {dt*1e3:8.1f} ms/spp "
                f"{n_rays_per_spp/dt/1e6:6.2f} Mrays/s  mean={mean:.4f}",
                flush=True,
            )
    print("--- summary (best of rounds) ---")
    base_mean = means[variants[0][0]]
    for name, _ in variants:
        best = min(sums[name])
        print(
            f"  {name:24s} {best*1e3:8.1f} ms/spp "
            f"{n_rays_per_spp/best/1e6:6.2f} Mrays/s  "
            f"dmean={means[name]-base_mean:+.5f}",
            flush=True,
        )


if __name__ == "__main__":
    main()
