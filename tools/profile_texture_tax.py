"""Attribute the textured-scene tax (VERDICT r3 item 4): colonnade_e2e
measured 3.90 vs atrium 5.65 Mrays/s on similar triangle counts. Is the
~31% tax the texture taps (quad-atlas gathers + mip-select math), the
normal-map frame math, or the divergence textures induce in the wave?

Ablations on the SAME colonnade scene:
  full            : as benched (trilinear taps)
  stochastic      : 1-mip stochastic taps (half the gathers)
  no-normalmap    : normal map off (SLOT mask), color/rough taps kept
  no-textures     : all texture slots masked off (constants only) — the
                    pure no-tap scene; remaining gap vs atrium is geometry
Plus isolated tap microbenches at 2M lanes (bilinear vs stochastic, quad
atlas) with bench-realistic uv/lod.

python tools/profile_texture_tax.py [--spp=3] [--cpu]
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

    import dataclasses

    import numpy as np

    from stratum_tpu.render import camera, integrator
    from stratum_tpu.render import texture as stex
    from stratum_tpu.scene import flatten, sample_assets

    spp = opts.get_int("spp", 3)
    width, height = 1920, 1080
    g, _info = sample_assets.load_colonnade("/tmp/stratum_colonnade_bench")
    scene, _ = flatten.flatten(g.root)
    node, cam = flatten.find_camera(g.root)
    view = camera.make_view(node.to_world(), cam.fovy, width, height)
    cfg = integrator.RenderConfig(
        width=width, height=height, max_bounces=4, bsdf="disney",
        presample_lights=4096, coherent_tiles=16,
    )

    def run(name, scene_v, cfg_v):
        img, n_rays = integrator.render_path_with_counts(
            scene_v, view, cfg_v, 0
        )
        float(np.asarray(n_rays))
        t0 = time.time()
        tot = 0
        for s in range(1, spp + 1):
            img, n_rays = integrator.render_path_with_counts(
                scene_v, view, cfg_v, s
            )
            tot += int(np.asarray(n_rays))
        dt = (time.time() - t0) / spp
        print(
            f"  {name:14s}: {dt*1e3:8.1f} ms/spp {tot/spp/dt/1e6:7.2f} "
            f"Mrays/s (img mean {float(np.asarray(img).mean()):.4f})",
            flush=True,
        )
        return dt

    tx = scene.textures
    print(f"colonnade textures: {tx.num_tex} x {tx.base_res} "
          f"(slot mask {tx.slot_mask:#x})", flush=True)
    full = run("full", scene, cfg)
    run("stochastic", scene, dataclasses.replace(cfg, tex_filter="stochastic"))

    def masked(mask):
        tx2 = stex.TextureStack(
            tx.flat, tx.base_res, tx.num_levels, tx.num_tex, mask,
            quad=tx.quad,
        )
        return scene._replace(textures=tx2)

    no_nm = tx.slot_mask & ~stex.SLOT_NORMAL
    run("no-normalmap", masked(no_nm), cfg)
    notex = run("no-textures", masked(0), cfg)
    print(f"  tap tax: {(full-notex)*1e3:8.1f} ms/spp "
          f"({(full-notex)/full*100:.0f}% of full)", flush=True)

    # --- isolated taps at 2M lanes --------------------------------------
    n = width * height
    rng = np.random.default_rng(3)
    uv = jnp.asarray(rng.random((n, 2), np.float32))
    lod = jnp.asarray((rng.random(n) * 5).astype(np.float32))
    tid = jnp.asarray((rng.integers(0, max(tx.num_tex, 1), n)).astype(np.int32))
    u_l = jnp.asarray(rng.random(n, dtype=np.float32))

    def timed(fn, *args, reps=5):
        out = jax.block_until_ready(fn(*args))
        t0 = time.time()
        for _ in range(reps):
            out = fn(*args)
        jax.block_until_ready(out)
        return (time.time() - t0) / reps

    bil = jax.jit(lambda t, u, l: stex.sample_bilinear(tx, t, u, l))
    sto = jax.jit(
        lambda t, u, l, ul: stex.sample_bilinear(tx, t, u, l, u_lod=ul)
    )
    print(f"  tap bilinear(tri) [2M]       : "
          f"{timed(bil, tid, uv, lod)*1e3:7.2f} ms", flush=True)
    print(f"  tap stochastic 1-mip [2M]    : "
          f"{timed(sto, tid, uv, lod, u_l)*1e3:7.2f} ms", flush=True)


if __name__ == "__main__":
    raise SystemExit(main())
