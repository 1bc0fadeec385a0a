"""Per-op breakdown of the Cornell/MXU path's non-trace tail (VERDICT r3
item 3: cornell_e2e is stuck at ~6.3 Mrays/s vs the 24 Mrays/s pure-closest
ceiling measured in r1; the ~248 ms/spp tail was never attributed below
the null-tracer level).

Times each pipeline stage in isolation at wave scale (2.07M lanes, the
1080p wavefront), plus whole-render ablations, so the tail decomposes into
named ops: shading-point gather, Disney eval / sample, NEE tile gather +
geometry, RNG draws, MXU closest/occluded waves, accumulate+tonemap.

python tools/profile_cornell_ops.py [--width=1920] [--height=1080] [--cpu]
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
    from stratum_tpu.utils.flags import Options

    opts = Options(sys.argv[1:])
    import jax
    import jax.numpy as jnp

    if opts.has("cpu"):
        jax.config.update("jax_platforms", "cpu")

    import numpy as np

    from stratum_tpu.core import rng as srng
    from stratum_tpu.ops import mxu as smxu
    from stratum_tpu.render import bsdf as sbsdf
    from stratum_tpu.render import camera, integrator
    from stratum_tpu.render import tonemap as stonemap
    from stratum_tpu.render.shading import load_material, make_shading_point
    from stratum_tpu.scene import builtin, flatten

    width = opts.get_int("width", 1920)
    height = opts.get_int("height", 1080)
    g = builtin.cornell_box()
    scene, _ = flatten.flatten(g.root)
    node, cam = flatten.find_camera(g.root)
    view = camera.make_view(node.to_world(), cam.fovy, width, height)
    n = width * height
    px, py = camera.pixel_grid(width, height)
    u = jnp.full((n, 2), 0.5, jnp.float32)
    origin, direction = camera.generate_rays(view, px, py, u, width, height)

    def timed(fn, *args, reps=5):
        out = jax.block_until_ready(fn(*args))
        t0 = time.time()
        for _ in range(reps):
            out = fn(*args)
        jax.block_until_ready(out)
        return (time.time() - t0) / reps

    # --- isolated waves -----------------------------------------------
    tf = scene.tri_features

    closest = jax.jit(lambda o, d: smxu.intersect_mxu(o, d, tf).t)
    occ = jax.jit(
        lambda o, d: smxu.occluded_mxu(
            o, d, jnp.full((n,), 10.0, jnp.float32), tf
        )
    )
    h = smxu.intersect_mxu(origin, direction, tf)
    geo = scene.geo

    shade = jax.jit(
        lambda tri, bary, d: make_shading_point(geo, tri, bary, d).position
    )
    sp = make_shading_point(geo, h.tri, h.bary, direction)
    mat_fn = jax.jit(
        lambda m: load_material(scene.materials, m).base_color
    )
    mat = load_material(scene.materials, sp.material)

    wo = jnp.broadcast_to(jnp.asarray([0.3, 0.5, 0.81]), (n, 3))
    wi = jnp.broadcast_to(jnp.asarray([-0.3, 0.5, 0.81]), (n, 3))
    from stratum_tpu.render import disney

    bsdf_eval, bsdf_sample = disney.disney_eval, disney.disney_sample
    ev = jax.jit(lambda m, a, b: bsdf_eval(m, a, b).f)
    u3 = jnp.full((n, 3), 0.4, jnp.float32)
    sm = jax.jit(lambda m, a, uu: bsdf_sample(m, a, uu).wi)

    st0 = srng.rng_init(px, py, 3, offset=0)
    draws = jax.jit(lambda s: srng.next_floats(s, 4)[0])

    # NEE on the presampled tile: gather + geometry
    tile = jnp.ones((4096, 12), jnp.float32)
    idx = (jnp.arange(n, dtype=jnp.int32) * 7) % 4096
    nee_gather = jax.jit(lambda t, i: t[i].sum(-1))

    acc = jnp.zeros((height, width, 3), jnp.float32)
    frame = jnp.abs(jnp.sin(jnp.arange(n * 3))).reshape(height, width, 3)
    tm = jax.jit(
        lambda a, f: stonemap.tonemap(
            (a + f) / 2.0, stonemap.TonemapMode.ACES, exposure=1.0,
            max_value=1.0,
        )
    )

    rows = [
        ("mxu closest wave", timed(closest, origin, direction)),
        ("mxu occluded wave", timed(occ, origin, direction)),
        ("shading point (gather+math)", timed(shade, h.tri, h.bary,
                                              direction)),
        ("material load (gather)", timed(mat_fn, sp.material)),
        ("disney eval", timed(ev, mat, wo, wi)),
        ("disney sample", timed(sm, mat, wo, u3)),
        ("rng 4 floats", timed(draws, st0)),
        ("nee tile gather [2M,12]", timed(nee_gather, tile, idx)),
        ("accumulate+tonemap 1080p", timed(tm, acc, frame)),
    ]
    print(f"cornell {width}x{height} ({n/1e6:.2f}M lanes):")
    for name, dt in rows:
        print(f"  {name:30s}: {dt*1e3:7.2f} ms", flush=True)

    # --- whole-render ablations ----------------------------------------
    base = dict(width=width, height=height, max_bounces=4,
                presample_lights=4096)
    for name, kw in (
        ("e2e full (bench cfg=lambert)", {}),
        ("e2e disney", dict(bsdf="disney")),
        ("e2e no-nee", dict(use_nee=False)),
        ("e2e no-rr", dict(rr_depth=99)),
        ("e2e 1 bounce", dict(max_bounces=1)),
        ("e2e null tracer", dict(tracer="null")),
    ):
        cfg = integrator.RenderConfig(**{**base, **kw})
        dt = timed(
            lambda s, cfg=cfg: integrator.render_path(scene, view, cfg, s),
            1, reps=3,
        )
        print(f"  {name:30s}: {dt*1e3:7.1f} ms/spp", flush=True)

    # expected waves per spp at 4 bounces: 5 closest + 5 occluded
    c = dict(rows)
    model = (
        5 * c["mxu closest wave"] + 5 * c["mxu occluded wave"]
        + 5 * c["shading point (gather+math)"] + 5 * c["disney eval"]
        + 5 * c["disney sample"] + 10 * c["rng 4 floats"]
        + 5 * c["nee tile gather [2M,12]"]
        + c["accumulate+tonemap 1080p"]
    )
    print(f"  modeled sum (5 bounces)       : {model*1e3:7.1f} ms/spp")
    print(f"  rays/spp ~ {(5 + 5) * n / 1e6:.1f}M")


if __name__ == "__main__":
    raise SystemExit(main())
