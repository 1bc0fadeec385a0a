"""A/B spp batching (render_path_batched: all spp in one lax.scan launch)
vs per-sample dispatch, on the Cornell MXU path and the atrium BVH path.

Usage: python tools/profile_sppbatch.py [--spp=4] [--width=] [--height=]
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
    import numpy as np

    from stratum_tpu.render import camera, integrator
    from stratum_tpu.scene import builtin, flatten
    from stratum_tpu.utils.flags import Options

    opts = Options(sys.argv[1:])
    spp = opts.get_int("spp", 4)
    width = opts.get_int("width", 1920)
    height = opts.get_int("height", 1080)

    for name, graph, cfg_kw in (
        ("cornell (mxu)", builtin.cornell_box(), {}),
        (
            "atrium (pallas)", builtin.atrium(),
            dict(bsdf="disney", presample_lights=4096, coherent_tiles=16),
        ),
    ):
        scene, _ = flatten.flatten(graph.root)
        node, cam = flatten.find_camera(graph.root)
        view = camera.make_view(node.to_world(), cam.fovy, width, height)
        cfg = integrator.RenderConfig(
            width=width, height=height, max_bounces=4, **cfg_kw
        )

        # per-sample dispatch (the bench loop)
        img, n0 = integrator.render_path_with_counts(scene, view, cfg, 0)
        float(np.asarray(n0))
        t0 = time.time()
        total = 0
        for s in range(1, spp + 1):
            img, nr = integrator.render_path_with_counts(scene, view, cfg, s)
            total += int(np.asarray(nr))
        dt_seq = time.time() - t0

        # one launch
        img_b, nr_b = integrator.render_path_batched(scene, view, cfg, spp, 1)
        float(np.asarray(img_b).mean())  # compile+run
        t0 = time.time()
        img_b, nr_b = integrator.render_path_batched(scene, view, cfg, spp, 1)
        total_b = int(np.asarray(nr_b))
        dt_bat = time.time() - t0

        print(
            f"{name:16s} per-sample: {total / dt_seq / 1e6:7.3f} Mrays/s "
            f"({dt_seq / spp * 1e3:7.1f} ms/spp)   "
            f"batched: {total_b / dt_bat / 1e6:7.3f} Mrays/s "
            f"({dt_bat / spp * 1e3:7.1f} ms/spp)",
            flush=True,
        )

        # lane batching (render_path_lanes): spp samples as extra wavefront
        # lanes — coherence win (same-pixel samples sort into the same
        # blocks) on top of the launch amortization. Memory scales with
        # lanes; 2/4 are the practical points at 1080p.
        for lanes in (2, 4):
            try:
                img_l, nr_l = integrator.render_path_lanes(
                    scene, view, cfg, lanes, 1
                )
                float(np.asarray(img_l).mean())  # compile+run
                t0 = time.time()
                img_l, nr_l = integrator.render_path_lanes(
                    scene, view, cfg, lanes, 1
                )
                total_l = int(np.asarray(nr_l))
                dt_l = time.time() - t0
                print(
                    f"{name:16s} lanes={lanes}: "
                    f"{total_l / dt_l / 1e6:7.3f} Mrays/s "
                    f"({dt_l / lanes * 1e3:7.1f} ms/spp)",
                    flush=True,
                )
            except Exception as e:
                print(f"{name:16s} lanes={lanes}: FAILED {e!r}", flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
