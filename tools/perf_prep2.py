"""Measure the candidate-prep pass (entries + argsort + packing) at
block=2048 and compare the serial lax.map-over-groups formulation against a
fully-vmapped one.

Usage: python tools/perf_prep2.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/stratum_jax_cache")

from stratum_tpu.utils import jaxcache  # noqa: E402

jaxcache.enable()


def timed(fn, *args, reps=5):
    import jax

    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.time() - t0) / reps


def main():
    width, height = 1920, 1080
    block = 2048

    import jax
    import jax.numpy as jnp
    from jax import lax

    from stratum_tpu.render import camera
    from stratum_tpu.scene import builtin, flatten
    from stratum_tpu.ops import pallas_trace as spallas
    from stratum_tpu.ops import packet as spacket
    from stratum_tpu.ops.intersect import T_MAX

    g = builtin.atrium()
    scene, _ = flatten.flatten(g.root)
    node, cam = flatten.find_camera(g.root)
    view = camera.make_view(node.to_world(), cam.fovy, width, height)
    n = width * height
    fat = scene.fat_bvh
    L = fat.num_leaves

    px, py = camera.pixel_grid_tiled(width, height, 8, 64)
    u = jnp.full((n, 2), 0.5, jnp.float32)
    o0, d0 = camera.generate_rays(view, px, py, u, width, height)
    tm_full = jnp.full((n,), T_MAX, jnp.float32)

    @jax.jit
    def prep_now(o, d):
        out = spallas._prepare(fat, o, d, 1e-4, tm_full, block)
        return [x.sum() for x in out[:5]]

    print(f"current _prepare (b{block}): {timed(prep_now, o0, d0)*1e3:7.1f} ms")

    # entries pass alone, current formulation
    nb = -(-n // block)
    nb = -(-nb // 8) * 8
    pad = nb * block - n
    o_b = jnp.pad(o0, ((0, pad), (0, 0))).reshape(nb, block, 3)
    d_b = jnp.pad(d0, ((0, pad), (0, 0)), constant_values=1.0).reshape(
        nb, block, 3
    )
    tm_b = jnp.pad(tm_full, (0, pad)).reshape(nb, block)

    @jax.jit
    def entries_map(o, d, tm):
        return lax.map(
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

    print(f"entries via lax.map groups:  {timed(entries_map, o_b, d_b, tm_b)*1e3:7.1f} ms")

    @jax.jit
    def entries_vmap(o, d, tm):
        return jax.vmap(
            lambda ob, db, tb: spacket._block_entries(fat, ob, db, 1e-4, tb)
        )(o, d, tm)

    print(f"entries fully vmapped:       {timed(entries_vmap, o_b, d_b, tm_b)*1e3:7.1f} ms")

    ent = entries_map(o_b, d_b, tm_b)

    @jax.jit
    def sort_pack(entries):
        order = jnp.argsort(entries, axis=1).astype(jnp.int32)
        sorted_entry = jnp.take_along_axis(entries, order, axis=1)
        ncand = jnp.sum(
            jnp.isfinite(sorted_entry), axis=1, keepdims=True
        ).astype(jnp.int32)
        return order.sum(), sorted_entry.sum(), ncand.sum()

    print(f"argsort+gather+count:        {timed(sort_pack, ent)*1e3:7.1f} ms")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
