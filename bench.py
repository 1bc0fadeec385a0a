"""Benchmark driver: prints ONE JSON line with the headline metric.

Measures path-tracing throughput (Mrays/sec/chip) on the Cornell box at
1080p — rays counted exactly like the reference's performance counters
(closest-hit + shadow rays actually traced, Node/BDPT.cpp:385-391).
Baseline target: 50 Mrays/sec/chip (BASELINE.json north_star).

Usage: python bench.py [--cpu] [--width=N] [--height=N] [--spp=N]
"""

from __future__ import annotations

import json
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/stratum_jax_cache")

BASELINE_MRAYS = 50.0


def main() -> int:
    from stratum_tpu.utils.flags import Options

    opts = Options(sys.argv[1:])
    import jax

    if opts.has("cpu"):
        jax.config.update("jax_platforms", "cpu")

    import numpy as np

    from stratum_tpu.render import camera, integrator
    from stratum_tpu.scene import builtin, flatten

    width = opts.get_int("width", 1920)
    height = opts.get_int("height", 1080)
    spp = opts.get_int("spp", 8)
    g = builtin.cornell_box()
    scene, _ = flatten.flatten(g.root)
    node, cam = flatten.find_camera(g.root)
    view = camera.make_view(node.to_world(), cam.fovy, width, height)
    cfg = integrator.RenderConfig(width=width, height=height, max_bounces=4)

    # warmup/compile
    img, n_rays = integrator.render_path_with_counts(scene, view, cfg, 0)
    img.block_until_ready()

    t0 = time.time()
    total_rays = 0
    for s in range(1, spp + 1):
        img, n_rays = integrator.render_path_with_counts(scene, view, cfg, s)
        total_rays += int(n_rays)
    img.block_until_ready()
    dt = time.time() - t0

    mrays = total_rays / dt / 1e6
    result = {
        "metric": f"path-tracing throughput, Cornell {width}x{height}, "
        f"{spp}spp, {cfg.max_bounces} bounces, NEE+MIS",
        "value": round(mrays, 3),
        "unit": "Mrays/sec/chip",
        "vs_baseline": round(mrays / BASELINE_MRAYS, 4),
    }
    print(json.dumps(result))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
