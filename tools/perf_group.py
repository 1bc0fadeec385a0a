"""(K, entry_group) sweep for the Pallas tracer on the atrium.

Hierarchical candidate prep (pallas_trace.ENTRY_GROUP) makes the host-side
entry pass + argsort cost L/group instead of L — the cost that originally
forced K=1024 fat leaves. This sweep measures whether small leaves win once
prep is group-priced: isolated primary closest, a sorted secondary-style
wave (random hemisphere directions from primary hits), and the full
4-bounce path trace.

python tools/perf_group.py [--ks=128,256] [--groups=1,8] [--block=2048]
    [--cpu] [--e2e]
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
    run_e2e = opts.has("e2e")
    ring = opts.has("ring")  # deferred-merge kernel (pallas_trace.RING)
    ks = [int(k) for k in opts.get_str("ks", "128,256,1024").split(",")]
    groups = [int(g) for g in opts.get_str("groups", "1,8").split(",")]
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

    # secondary-style wave: cosine directions from the primary hit points
    # (fixed rng so every config sees identical rays)
    rng = np.random.default_rng(7)

    for k in ks:
        fat = spacket.build_fat_bvh_sah(pos_np, idx_np, valid, leaf_size=k)
        feat = spallas.pack_leaf_features(fat)
        scene = flatten.replace_bvh(scene0, fat, feat)
        print(f"K={k}: leaves={fat.num_leaves}", flush=True)

        h0 = spallas.pallas_closest(fat, feat, origin, direction, block=block)
        hp = origin + direction * jnp.minimum(h0.t, 1e6)[:, None]
        un = rng.random((n, 3), np.float32) * 2.0 - 1.0
        sd = jnp.asarray(un / np.maximum(
            np.linalg.norm(un, axis=-1, keepdims=True), 1e-9
        ))
        so = hp - direction * 1e-3

        for grp in groups:
            @jax.jit
            def closest(o, d, grp=grp, fat=fat, feat=feat, ring=ring):
                h = spallas.pallas_closest(
                    fat, feat, o, d, block=block, entry_group=grp, ring=ring
                )
                return h.t.sum()

            for name, (o_, d_) in (
                ("primary", (origin, direction)),
                ("secondary", (so, sd)),
            ):
                fetch(closest(o_, d_))
                t0 = time.time()
                reps = 3
                for _ in range(reps):
                    s = closest(o_, d_)
                fetch(s)
                dt = (time.time() - t0) / reps
                print(
                    f"  g={grp} {name:9s}: {dt*1e3:8.1f} ms "
                    f"{n/dt/1e6:7.2f} Mrays/s",
                    flush=True,
                )

            if not run_e2e:
                continue
            # entry_group rides RenderConfig (a real static jit key). The
            # old module-global flip + "fresh jit around __wrapped__" was
            # SILENTLY IGNORED: jax's trace cache is keyed by function
            # identity + avals, so the second flip reused the first trace
            # (measured round 4; the r3 e2e rows of this tool are invalid).
            cfg = integrator.RenderConfig(
                width=width, height=height, max_bounces=4,
                sort_rays=True, tracer="pallas",
                entry_group=grp, entry_group_primary=grp,
                entry_group_shadow=grp, ring=int(ring),
            )
            rpc = integrator.render_path_with_counts
            img, n_rays = rpc(scene, view, cfg, 0)
            fetch(n_rays)
            t0 = time.time()
            tot = 0
            for s in range(1, 3):
                img, n_rays = rpc(scene, view, cfg, s)
                tot += int(fetch(n_rays))
            dt = (time.time() - t0) / 2
            print(
                f"  g={grp} e2e b4   : {dt*1e3:8.1f} ms "
                f"{tot/2/dt/1e6:7.2f} Mrays/s",
                flush=True,
            )


if __name__ == "__main__":
    main()
