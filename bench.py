"""Benchmark driver: prints ONE JSON line with the headline metric.

Headline: END-TO-END path-tracing throughput on the atrium (133K-triangle
Sponza-class scene, BASELINE.md config 3) at 1080p through the Pallas
BVH tracer — rays counted exactly like the reference's performance counters
(closest-hit + shadow rays actually traced, Node/BDPT.cpp:385-391).
Also measures the Cornell MXU path and primary-ray traversal; those ride in
the metric string. Baseline target: 50 Mrays/sec/chip (BASELINE.json).

Usage: python bench.py [--cpu] [--spp=N] [--batch] [--lanes=N]
"""

from __future__ import annotations

import json
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/stratum_jax_cache")

BASELINE_MRAYS = 50.0


def _fetch(x):
    import numpy as np

    return float(np.asarray(x).reshape(-1)[0])


def _measure_e2e(scene, view, cfg, spp, integrator, batched=False, lanes=0):
    if lanes > 1:
        # all `lanes` samples as extra wavefront lanes in one wave set
        # (render_path_lanes); flip via --lanes=N after the on-chip A/B
        img, n_rays = integrator.render_path_lanes(scene, view, cfg, lanes, 0)
        _fetch(n_rays)  # compile + run
        reps = max(1, spp // lanes)
        t0 = time.time()
        total = 0
        for r in range(reps):
            img, n_rays = integrator.render_path_lanes(
                scene, view, cfg, lanes, 1 + r * lanes
            )
            total += int(_fetch(n_rays))
        dt = time.time() - t0
        return total / dt / 1e6, dt / (reps * lanes)
    if batched:
        # all spp in one compiled launch (render_path_batched); flip via
        # --batch after the on-chip A/B (tools/profile_sppbatch.py)
        img, n_rays = integrator.render_path_batched(scene, view, cfg, spp, 0)
        _fetch(n_rays)  # compile + run
        t0 = time.time()
        img, n_rays = integrator.render_path_batched(scene, view, cfg, spp, 1)
        total = int(_fetch(n_rays))
        dt = time.time() - t0
        return total / dt / 1e6, dt / spp
    img, n_rays = integrator.render_path_with_counts(scene, view, cfg, 0)
    _fetch(n_rays)  # compile + run
    t0 = time.time()
    total = 0
    for s in range(1, spp + 1):
        img, n_rays = integrator.render_path_with_counts(scene, view, cfg, s)
        total += int(_fetch(n_rays))
    dt = time.time() - t0
    return total / dt / 1e6, dt / spp


def main() -> int:
    from stratum_tpu.utils.flags import Options

    opts = Options(sys.argv[1:])
    import jax

    if opts.has("cpu"):
        jax.config.update("jax_platforms", "cpu")
    from stratum_tpu.utils import jaxcache

    jaxcache.enable()

    import jax.numpy as jnp

    from stratum_tpu.render import camera, integrator
    from stratum_tpu.scene import builtin, flatten

    width = opts.get_int("width", 1920)
    height = opts.get_int("height", 1080)
    spp = opts.get_int("spp", 4)
    on_cpu = opts.has("cpu")
    if on_cpu:
        # CI-scale fallback: tiny frame, brute tracer
        width, height, spp = 128, 128, 2

    results = {}

    # --- config 3: full path trace, Sponza-class scene, BVH tracer --------
    g = builtin.atrium() if not on_cpu else builtin.cornell_box()
    scene, _ = flatten.flatten(g.root)
    node, cam = flatten.find_camera(g.root)
    view = camera.make_view(node.to_world(), cam.fovy, width, height)
    # sort_rays (default True) sorts CLOSEST waves only: measured 1987
    # (closest-only) / 2085 (none) / 2406 (closest+shadow) ms/spp
    # coherent_tiles=16: block-shared NEE tile groups (reference:
    # eCoherentSampling) — measured 2.4x on the deferred shadow wave
    # (cand/blk 71 -> 8.6, tools/profile_shadow.py)
    cfg = integrator.RenderConfig(
        width=width, height=height, max_bounces=4, bsdf="disney",
        presample_lights=4096,
        coherent_tiles=opts.get_int("coherent", 16),
    )
    batched = opts.has("batch")
    lanes = opts.get_int("lanes", 0)
    mrays_atrium, spp_s = _measure_e2e(
        scene, view, cfg, spp, integrator, batched, lanes
    )
    results["atrium_e2e"] = round(mrays_atrium, 3)
    results["atrium_ms_per_spp"] = round(spp_s * 1e3, 1)

    # --- primary-ray traversal alone (the BVH tracer's ceiling) -----------
    if not on_cpu:
        from stratum_tpu.ops import pallas_trace as spallas

        n = width * height
        px, py = camera.pixel_grid_tiled(width, height, 8, 64)
        u = jnp.full((n, 2), 0.5, jnp.float32)
        origin, direction = camera.generate_rays(
            view, px, py, u, width, height
        )

        @jax.jit
        def closest(o, d):
            # block=2048 is the production tracer block (integrator.py);
            # the old 512 probe under-reported the ceiling by ~30%
            h = spallas.pallas_closest(
                scene.fat_bvh, scene.leaf_feat_packed, o, d, block=2048
            )
            return h.t.sum()

        _fetch(closest(origin, direction))
        t0 = time.time()
        for _ in range(3):
            s = closest(origin, direction)
        _fetch(s)
        results["atrium_primary_traversal"] = round(
            n / ((time.time() - t0) / 3) / 1e6, 2
        )

    # --- config 4: textured asset through the file loaders -----------------
    # colonnade: 110K tris, OBJ+MTL+PNG textures + HDR sun/sky env map,
    # loaded via scene/loaders/obj.py + io/image.py (VERDICT r2: prove the
    # pipeline on an asset that goes through the real ingestion path, and
    # stop tuning kernel constants on one scene)
    if not on_cpu:
        try:
            from stratum_tpu.scene import sample_assets

            g4, _info = sample_assets.load_colonnade(
                "/tmp/stratum_colonnade_bench"
            )
            scene4, _ = flatten.flatten(g4.root)
            node4, cam4 = flatten.find_camera(g4.root)
            view4 = camera.make_view(
                node4.to_world(), cam4.fovy, width, height
            )
            mrays_col, col_ms = _measure_e2e(
                scene4, view4, cfg, spp, integrator, batched, lanes
            )
            results["colonnade_e2e"] = round(mrays_col, 3)
            results["colonnade_ms_per_spp"] = round(col_ms * 1e3, 1)
        except Exception as e:  # keep the headline even if a side scene dies
            print(f"colonnade bench failed: {e!r}", file=sys.stderr)

    # --- BDPT at 1080p (the reference's headline renderer, chunked) -------
    if not on_cpu and not opts.has("nobdpt"):
        try:
            from stratum_tpu.render import bdpt as sbdpt

            cfgb = integrator.RenderConfig(
                width=width, height=height, max_bounces=3, bsdf="disney",
                sort_rays=True, lvc_connections=4, presample_lights=4096,
            )
            img = sbdpt.render_bdpt_chunked(scene, view, cfgb, 0, chunks=16)
            jax.block_until_ready(img)
            t0 = time.time()
            img = sbdpt.render_bdpt_chunked(scene, view, cfgb, 1, chunks=16)
            jax.block_until_ready(img)
            results["bdpt_hd_ms_per_spp"] = round((time.time() - t0) * 1e3, 1)
        except Exception as e:
            print(f"bdpt bench failed: {e!r}", file=sys.stderr)

    # --- config 1/3: Cornell (MXU dense path) ------------------------------
    g2 = builtin.cornell_box()
    scene2, _ = flatten.flatten(g2.root)
    node2, cam2 = flatten.find_camera(g2.root)
    view2 = camera.make_view(node2.to_world(), cam2.fovy, width, height)
    cfg2 = integrator.RenderConfig(
        width=width, height=height, max_bounces=4, presample_lights=4096,
    )
    try:
        mrays_cornell, _ = _measure_e2e(
            scene2, view2, cfg2, spp, integrator, batched, lanes
        )
        results["cornell_e2e"] = round(mrays_cornell, 3)
    except Exception as e:
        print(f"cornell bench failed: {e!r}", file=sys.stderr)
        results["cornell_e2e"] = None

    headline = results["atrium_e2e"]
    result = {
        "metric": (
            f"end-to-end path tracing, atrium 133K tris {width}x{height} "
            f"{spp}spp 4 bounces NEE+MIS+RR disney (pallas BVH tracer); "
            f"cornell_e2e={results['cornell_e2e']} "
            f"colonnade_e2e={results.get('colonnade_e2e')} "
            f"primary_traversal={results.get('atrium_primary_traversal')} "
            f"atrium_ms_per_spp={results['atrium_ms_per_spp']} "
            f"bdpt_hd_ms_per_spp={results.get('bdpt_hd_ms_per_spp')}"
        ),
        "value": headline,
        "unit": "Mrays/sec/chip",
        "vs_baseline": round(headline / BASELINE_MRAYS, 4),
    }
    print(json.dumps(result))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
