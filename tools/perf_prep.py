"""Prep breakdown: entries pass vs argsort vs kernel, on the atrium."""

from __future__ import annotations

import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/stratum_jax_cache")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def fetch(x):
    import numpy as np

    return float(np.asarray(x).reshape(-1)[0])


def main():
    import jax
    import jax.numpy as jnp

    from stratum_tpu.ops import packet as spacket
    from stratum_tpu.ops import pallas_trace as spallas
    from stratum_tpu.ops import mxu as smxu
    from stratum_tpu.render import camera
    from stratum_tpu.scene import builtin, flatten
    from jax import lax

    width, height, block = 1920, 1080, 512
    g = builtin.atrium()
    scene, _ = flatten.flatten(g.root)
    node, cam = flatten.find_camera(g.root)
    view = camera.make_view(node.to_world(), cam.fovy, width, height)
    n = width * height
    px, py = camera.pixel_grid_tiled(width, height, 8, 64)
    u = jnp.full((n, 2), 0.5, jnp.float32)
    origin, direction = camera.generate_rays(view, px, py, u, width, height)
    fat = scene.fat_bvh
    L = fat.num_leaves
    nb = -(-n // block)
    nb = -(-nb // 8) * 8
    pad = nb * block - n
    o = jnp.pad(origin, ((0, pad), (0, 0))).reshape(nb, block, 3)
    d = jnp.pad(direction, ((0, pad), (0, 0)), constant_values=1.0).reshape(
        nb, block, 3
    )
    tm = jnp.full((nb, block), 3.0e38, jnp.float32)

    @jax.jit
    def entries_only(o, d, tm):
        e = lax.map(
            lambda args: jax.vmap(
                lambda ob, db, tb: spacket._block_entries(
                    fat, ob, db, 1e-4, tb
                )
            )(*args),
            (
                o.reshape(-1, 8, block, 3),
                d.reshape(-1, 8, block, 3),
                tm.reshape(-1, 8, block),
            ),
        ).reshape(nb, L)
        return e.sum()

    @jax.jit
    def entries_sort(o, d, tm):
        e = lax.map(
            lambda args: jax.vmap(
                lambda ob, db, tb: spacket._block_entries(
                    fat, ob, db, 1e-4, tb
                )
            )(*args),
            (
                o.reshape(-1, 8, block, 3),
                d.reshape(-1, 8, block, 3),
                tm.reshape(-1, 8, block),
            ),
        ).reshape(nb, L)
        order = jnp.argsort(e, axis=1).astype(jnp.int32)
        return order.sum().astype(jnp.float32)

    @jax.jit
    def full_closest(org, dr):
        h = spallas.pallas_closest(
            fat, scene.leaf_feat_packed, org, dr, block=block
        )
        return h.t.sum()

    for name, fn, args in (
        ("entries", entries_only, (o, d, tm)),
        ("entries+sort", entries_sort, (o, d, tm)),
        ("full closest", full_closest, (origin, direction)),
    ):
        fetch(fn(*args))
        t0 = time.time()
        for _ in range(3):
            s = fn(*args)
        fetch(s)
        dt = (time.time() - t0) / 3
        print(f"{name:14s}: {dt*1e3:7.1f} ms", flush=True)
    print(f"full = {n/((time.time()-t0)/3)/1e6:.1f} (last rep calc)")


if __name__ == "__main__":
    main()
