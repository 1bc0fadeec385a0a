"""Prep breakdown at the CURRENT kernel defaults (r4 s4): entries pass vs
argsort vs take_along vs rays/geom packing, at gs widths 1 and 4, on a
2M-ray coherent shadow wave (the deferred NEE wave is the biggest NEE
bucket and prep measured 30.2 of its 50.8 ms at L width).

python tools/perf_prep_breakdown.py [--block=2048]
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
    from stratum_tpu.utils.flags import Options

    opts = Options(sys.argv[1:])
    import jax
    import jax.numpy as jnp
    from jax import lax

    if opts.has("cpu"):
        jax.config.update("jax_platforms", "cpu")
    import numpy as np

    from stratum_tpu.ops import packet as spacket
    from stratum_tpu.ops import pallas_trace as spallas
    from stratum_tpu.ops import mxu as smxu
    from stratum_tpu.render import camera
    from stratum_tpu.scene import builtin, flatten

    block = opts.get_int("block", 2048)
    width, height = 1920, 1080
    g = builtin.atrium()
    scene, _ = flatten.flatten(g.root)
    node, cam = flatten.find_camera(g.root)
    view = camera.make_view(node.to_world(), cam.fovy, width, height)
    n = width * height
    fat = scene.fat_bvh
    L = fat.leaf_tri.shape[0]
    px, py = camera.pixel_grid_tiled(width, height, 8, 64)
    u = jnp.full((n, 2), 0.5, jnp.float32)
    origin, direction = camera.generate_rays(view, px, py, u, width, height)
    t_max = jnp.full((n,), 50.0, jnp.float32)

    def timed(fn, *args, reps=5):
        out = jax.block_until_ready(fn(*args))
        t0 = time.time()
        for _ in range(reps):
            out = fn(*args)
        jax.block_until_ready(out)
        return (time.time() - t0) / reps

    for gs in (1, 4):
        full = jax.jit(
            lambda o, d, t, gs=gs: spallas._prepare(
                fat, o, d, 1e-4, t, block, gs, expand=False
            )[2:5]
        )
        dt_full = timed(full, origin, direction, t_max)

        # pieces: replicate _prepare's stages so each can be timed alone
        nb = -(-n // block)
        nb = -(-nb // 8) * 8
        pad = nb * block - n

        def pieces(o_, d_, tm_, gs=gs):
            o = jnp.pad(o_, ((0, pad), (0, 0))).reshape(nb, block, 3)
            d = jnp.pad(d_, ((0, pad), (0, 0)),
                        constant_values=1.0).reshape(nb, block, 3)
            tm = jnp.pad(tm_, (0, pad)).reshape(nb, block)
            G = -(-L // gs)
            big = jnp.float32(3.0e37)
            glo = jnp.pad(fat.leaf_lo, ((0, G * gs - L), (0, 0)),
                          constant_values=big).reshape(G, gs, 3).min(axis=1)
            ghi = jnp.pad(fat.leaf_hi, ((0, G * gs - L), (0, 0)),
                          constant_values=-big).reshape(G, gs, 3).max(axis=1)
            efat = fat._replace(leaf_lo=glo, leaf_hi=ghi)
            entries = lax.map(
                lambda args: jax.vmap(
                    lambda ob, db, tb: spacket._block_entries(
                        efat, ob, db, 1e-4, tb
                    )
                )(*args),
                (o.reshape(-1, 8, block, 3), d.reshape(-1, 8, block, 3),
                 tm.reshape(-1, 8, block)),
            ).reshape(nb, G)
            return o, d, tm, entries

        o, d, tm, entries = jax.jit(pieces)(origin, direction, t_max)

        dt_entries = timed(
            jax.jit(lambda o_, d_, tm_: pieces(o_, d_, tm_)[3]),
            origin, direction, t_max,
        )
        dt_sort = timed(
            jax.jit(lambda e: jnp.argsort(e, axis=1).astype(jnp.int32)),
            entries,
        )
        order = jnp.argsort(entries, axis=1).astype(jnp.int32)
        dt_take = timed(
            jax.jit(
                lambda e, od: (
                    jnp.take_along_axis(e, od, axis=1),
                    jnp.sum(jnp.isfinite(
                        jnp.take_along_axis(e, od, axis=1)
                    ), axis=1),
                )
            ),
            entries, order,
        )

        def pack(o, d, tm):
            rf = smxu.ray_features(
                o.reshape(-1, 3), d.reshape(-1, 3)
            ).reshape(nb, block, 10)
            rays = jnp.concatenate(
                [rf, tm[..., None], jnp.zeros((nb, block, 5), jnp.float32)],
                axis=-1,
            ).swapaxes(1, 2)
            inv_d = jnp.where(jnp.abs(d) > 1e-20, 1.0 / d,
                              jnp.sign(d) * 1e20 + 1e20)
            geom = jnp.concatenate(
                [o, inv_d, jnp.zeros((nb, block, 2), jnp.float32)], axis=-1
            ).swapaxes(1, 2)
            return rays, geom

        dt_pack = timed(jax.jit(pack), o, d, tm)
        print(
            f"gs={gs} (G={-(-L // gs)}): full {dt_full*1e3:6.1f} ms | "
            f"entries {dt_entries*1e3:6.1f} sort {dt_sort*1e3:6.1f} "
            f"take+ncand {dt_take*1e3:6.1f} pack {dt_pack*1e3:6.1f}",
            flush=True,
        )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
