"""Per-bounce marginal cost of the bench config, plus a raysort-machinery
microbench: where do the ~1.45 s/spp of closest-wave time actually go?

Successive max_bounces diffs give each bounce's in-context marginal cost
(its closest wave + shading/NEE overhead + its deferred-shadow rows);
the raysort microbench isolates the per-wave sort tax (key + argsort +
packed gather in + inverse gathers out) that the isolated kernel
measurements (104 / 216 ms) never included.

Usage: python tools/profile_bounces.py [--scene=atrium] [--sort=1]
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
    from stratum_tpu.utils.flags import Options

    opts = Options(sys.argv[1:])
    width = opts.get_int("width", 1920)
    height = opts.get_int("height", 1080)

    import jax
    import jax.numpy as jnp

    from stratum_tpu.render import camera, integrator
    from stratum_tpu.scene import builtin, flatten

    scene_name = opts.get_str("scene", "atrium")
    g = getattr(builtin, scene_name)() if scene_name != "cornell" \
        else builtin.cornell_box()
    scene, _ = flatten.flatten(g.root)
    node, cam = flatten.find_camera(g.root)
    view = camera.make_view(node.to_world(), cam.fovy, width, height)

    base = dict(
        width=width, height=height, bsdf="disney",
        presample_lights=4096, coherent_tiles=16,
        sort_rays=bool(opts.get_int("sort", 1)),
    )
    prev = 0.0
    for mb in range(5):
        cfg = integrator.RenderConfig(**{**base, "max_bounces": mb})
        dt = timed(
            lambda s, _c=cfg: integrator.render_path(scene, view, _c, s), 1
        ) * 1e3
        print(f"max_bounces={mb}: {dt:8.1f} ms/spp  (marginal {dt - prev:+8.1f})")
        prev = dt

    # ---- raysort machinery microbench (per 2M-ray closest wave) ----------
    n = width * height
    key_u = jnp.arange(n, dtype=jnp.uint32) * jnp.uint32(2654435761)
    o = jax.random.uniform(jax.random.PRNGKey(0), (n, 3), jnp.float32)
    d = jax.random.normal(jax.random.PRNGKey(1), (n, 3), jnp.float32)
    tm = jnp.full((n,), 1e30, jnp.float32)

    from stratum_tpu.ops import raysort

    lo = jnp.zeros((3,), jnp.float32)
    hi = jnp.ones((3,), jnp.float32)

    @jax.jit
    def keyfn(o, d, tm):
        return raysort.ray_key(o, d, tm, lo, hi)

    @jax.jit
    def sortfn(k):
        return jnp.argsort(k)

    @jax.jit
    def gather_in(o, d, tm, order):
        packed = jnp.concatenate(
            [o, d, tm[:, None], jnp.zeros_like(tm)[:, None]], axis=-1
        )[order]
        return packed

    @jax.jit
    def inv_of(order):
        return jnp.zeros_like(order).at[order].set(
            jnp.arange(order.shape[0], dtype=order.dtype)
        )

    @jax.jit
    def gather_out(t, bary, tri, inv):
        # mirrors closest_sorted: one packed uint32 inverse gather
        packed = jnp.concatenate(
            [
                jax.lax.bitcast_convert_type(t[:, None], jnp.uint32),
                jax.lax.bitcast_convert_type(bary, jnp.uint32),
                jax.lax.bitcast_convert_type(tri[:, None], jnp.uint32),
            ],
            axis=-1,
        )[inv]
        return packed

    @jax.jit
    def scatter_out(t, bary, tri, order):
        # candidate alternative: scatter sorted rows back instead of
        # gathering by the inverse permutation (saves building inv)
        packed = jnp.concatenate(
            [
                jax.lax.bitcast_convert_type(t[:, None], jnp.uint32),
                jax.lax.bitcast_convert_type(bary, jnp.uint32),
                jax.lax.bitcast_convert_type(tri[:, None], jnp.uint32),
            ],
            axis=-1,
        )
        return jnp.zeros_like(packed).at[order].set(packed)

    k = keyfn(o, d, tm)
    order = sortfn(k)
    inv = inv_of(order)
    t = tm * 0.5
    bary = o[:, :2]
    tri = jnp.arange(n, dtype=jnp.int32)
    print(f"ray_key [{n}]        : {timed(keyfn, o, d, tm)*1e3:7.2f} ms")
    print(f"argsort u32 [{n}]    : {timed(sortfn, k)*1e3:7.2f} ms")
    print(f"inv perm [{n}]       : {timed(inv_of, order)*1e3:7.2f} ms")
    print(f"gather in [N,8]      : {timed(gather_in, o, d, tm, order)*1e3:7.2f} ms")
    print(f"gather out [N,4] u32 : {timed(gather_out, t, bary, tri, inv)*1e3:7.2f} ms")
    print(f"scatter out (no inv) : {timed(scatter_out, t, bary, tri, order)*1e3:7.2f} ms")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
