"""Bisect the r4 bench regressions (VERDICT r4 item 4), interleaved on-chip.

BENCH_r04 vs r03: cornell_e2e 6.272 -> 5.01 (-20%), colonnade_e2e
3.899 -> 3.609 (-7.4%); both reproduce in the r5 session-start baseline
(4.97 / 3.603), so they are code, not tunnel noise. Suspects:

  cornell (MXU dense path): 96bb143 per-tri fused payload — the only r4
  commit touching that path. A/B: scene.tri_payload vs None.
  colonnade (pallas path): the GS=4 / K=256 default flip (7f88fcd,
  validated on atrium only). A/B: cfg.gs in {-1 (module default 4), 1},
  and a K=512 scene rebuild at gs=1 (the r3 default combo).

Interleaved rounds; prints ms/spp + Mrays/s per arm.

python tools/bisect_r4_regressions.py [--spp=3] [--rounds=2] [--skip=...]
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


def measure(scene, view, cfg, integrator, spp, tag):
    import time

    img, n_rays = integrator.render_path_with_counts(scene, view, cfg, 0)
    fetch(n_rays)  # compile + warm
    t0 = time.time()
    total = 0
    for s in range(1, spp + 1):
        img, n_rays = integrator.render_path_with_counts(scene, view, cfg, s)
        total += int(fetch(n_rays))
    dt = time.time() - t0
    print(
        f"  {tag}: {dt / spp * 1e3:.1f} ms/spp, "
        f"{total / dt / 1e6:.3f} Mrays/s",
        flush=True,
    )
    return dt / spp


def main():
    from stratum_tpu.utils.flags import Options

    opts = Options(sys.argv[1:])
    spp = opts.get_int("spp", 3)
    rounds = opts.get_int("rounds", 2)
    skip = set(opts.get_str("skip", "").split(","))
    import jax  # noqa: F401
    import numpy as np

    from stratum_tpu.ops import packet as spacket
    from stratum_tpu.ops import pallas_trace as spallas
    from stratum_tpu.render import camera, integrator
    from stratum_tpu.scene import builtin, flatten, sample_assets

    w, h = 1920, 1080

    arms = []

    if "cornell" not in skip:
        g2 = builtin.cornell_box()
        scene2, _ = flatten.flatten(g2.root)
        node2, cam2 = flatten.find_camera(g2.root)
        view2 = camera.make_view(node2.to_world(), cam2.fovy, w, h)
        cfg2 = integrator.RenderConfig(
            width=w, height=h, max_bounces=4, presample_lights=4096,
        )
        scene2_off = scene2._replace(tri_payload=None)
        import dataclasses

        # VERDICT r5 bisect RESULT (on-chip, 2 interleaved rounds, 3 spp):
        #   r4 few-lights presample auto-off: 1292-1293 ms/spp (5.01 Mr/s)
        #   tri_payload=OFF (same auto-off):  1291-1292 (5.01) -> payload
        #     is NOT the regression
        #   presample FORCED back on:         1003-1008 (6.42-6.46) -> the
        #     whole cornell -20% was the auto-disable; now reverted in
        #     integrator.py (presample_lights honored as given)
        arms += [
            ("cornell (presample on)  ", scene2, view2, cfg2),
            ("cornell tri_payload=OFF ", scene2_off, view2, cfg2),
            ("cornell presample OFF   ", scene2, view2,
             dataclasses.replace(cfg2, presample_lights=0)),
        ]

    if "colonnade" not in skip:
        g4, _ = sample_assets.load_colonnade("/tmp/stratum_colonnade_bench")
        scene4, _ = flatten.flatten(g4.root)
        node4, cam4 = flatten.find_camera(g4.root)
        view4 = camera.make_view(node4.to_world(), cam4.fovy, w, h)
        cfgc = integrator.RenderConfig(
            width=w, height=h, max_bounces=4, bsdf="disney",
            presample_lights=4096, coherent_tiles=16,
        )
        arms += [
            ("colonnade gs=4 K=256 (r4)", scene4, view4, cfgc),
            ("colonnade gs=1 K=256     ", scene4, view4,
             __import__("dataclasses").replace(cfgc, gs=1)),
        ]
        if "k512" not in skip:
            pos = np.asarray(scene4.geo.positions)
            idx = np.asarray(scene4.geo.indices)
            valid = np.asarray(scene4.geo.tri_material) >= 0
            fat512 = spacket.build_fat_bvh_sah(pos, idx, valid,
                                               leaf_size=512)
            from stratum_tpu.scene.flatten import build_slot_payload

            scene4b = scene4._replace(
                fat_bvh=fat512,
                leaf_feat_packed=spallas.pack_leaf_features(fat512),
                slot_payload=build_slot_payload(
                    scene4.geo, scene4.materials, fat512
                ),
            )
            arms += [
                ("colonnade gs=1 K=512 (r3)", scene4b, view4,
                 __import__("dataclasses").replace(cfgc, gs=1)),
            ]

    for r in range(rounds):
        print(f"--- round {r} ---", flush=True)
        for tag, sc, vw, cf in arms:
            measure(sc, vw, cf, integrator, spp, tag)


if __name__ == "__main__":
    main()
