"""Perf probe: per-phase timings of the hot path on the real chip.

Usage: python tools/perf_probe.py [--scene=atrium|cornell] [--width=] [--height=]
Timings use a scalar np.asarray fetch (block_until_ready does not block
through the axon tunnel — STATUS.md).
"""

from __future__ import annotations

import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/stratum_jax_cache")


def fetch(x):
    import numpy as np

    return float(np.asarray(x).reshape(-1)[0])


def main():
    from stratum_tpu.utils.flags import Options

    opts = Options(sys.argv[1:])
    import jax
    import jax.numpy as jnp
    import numpy as np

    if opts.has("cpu"):
        jax.config.update("jax_platforms", "cpu")

    from stratum_tpu.render import camera, integrator
    from stratum_tpu.scene import builtin, flatten

    scene_name = opts.get_str("scene", "atrium")
    width = opts.get_int("width", 1920)
    height = opts.get_int("height", 1080)
    t0 = time.time()
    g = getattr(builtin, scene_name)()
    scene, _ = flatten.flatten(g.root)
    node, cam = flatten.find_camera(g.root)
    view = camera.make_view(node.to_world(), cam.fovy, width, height)
    print(
        f"flatten {time.time()-t0:.1f}s tris={scene.geo.num_triangles} "
        f"leaves={scene.fat_bvh.num_leaves} K={scene.fat_bvh.leaf_size}"
    )

    n = width * height

    # --- phase 1: primary rays through the pallas tracer ------------------
    from stratum_tpu.ops import pallas_trace as spallas

    px, py = camera.pixel_grid(width, height)
    u = jnp.full((n, 2), 0.5, jnp.float32)
    origin, direction = camera.generate_rays(view, px, py, u, width, height)

    @jax.jit
    def closest(o, d):
        h = spallas.pallas_closest(
            scene.fat_bvh, scene.leaf_feat_packed, o, d, block=opts.get_int("block", 512)
        )
        return h.t.sum()

    s = closest(origin, direction)
    fetch(s)  # compile+run
    t0 = time.time()
    reps = 3
    for _ in range(reps):
        s = closest(origin, direction)
    fetch(s)
    dt = (time.time() - t0) / reps
    print(f"pallas primary closest: {dt*1e3:.1f} ms = {n/dt/1e6:.2f} Mrays/s")

    # --- phase 2: candidate prep alone ------------------------------------
    @jax.jit
    def prep(o, d):
        tm = jnp.full((n,), 3.0e38, jnp.float32)
        rays, cand, centry, ncand, _ = spallas._prepare(
            scene.fat_bvh, o, d, 1e-4, tm, opts.get_int("block", 512)
        )
        return centry.sum()

    fetch(prep(origin, direction))
    t0 = time.time()
    for _ in range(reps):
        s = prep(origin, direction)
    fetch(s)
    dt_prep = (time.time() - t0) / reps
    print(f"candidate prep alone: {dt_prep*1e3:.1f} ms")

    # --- phase 3: end-to-end path trace ------------------------------------
    cfg = integrator.RenderConfig(
        width=width, height=height, max_bounces=4, bsdf="disney"
    )
    img, n_rays = integrator.render_path_with_counts(scene, view, cfg, 0)
    fetch(n_rays)
    t0 = time.time()
    total = 0
    for sdx in range(1, reps + 1):
        img, n_rays = integrator.render_path_with_counts(scene, view, cfg, sdx)
        total += int(fetch(n_rays))
    dt = time.time() - t0
    print(
        f"end-to-end path ({cfg.max_bounces} bounces, NEE+MIS, disney): "
        f"{dt/reps*1e3:.1f} ms/spp = {total/dt/1e6:.2f} Mrays/s"
    )


if __name__ == "__main__":
    main()
