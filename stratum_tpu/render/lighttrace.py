"""Light tracing: light subpaths splatted to the camera.

TPU-native analog of the reference's ``sample_photons`` kernel
(src/Shaders/kernels/renderers/bdpt.hlsl:103-147) and ``connect_view``
(src/Shaders/common/path.hlsli:536-616): subpaths start on a light
(power-weighted point + cosine emission), bounce through the scene, and at
every vertex connect to the pinhole camera with a visibility ray; the
contribution lands on the projected pixel.

Architectural translation: the reference splats with fixed-point atomics
into the light-trace image (path.hlsli:40-62, add_light_trace kernel);
here the whole wavefront's contributions become one ``scatter-add``
(``image.at[pixels].add``) per bounce — the sorted/segmented reduction XLA
lowers it to is the TPU's atomics replacement (SURVEY.md §2.5).

The pinhole importance function: a pixel measurement is the mean radiance
over the pixel footprint, so We(w) = N_pix / (A_plane * cos^3 theta_c) for
directions inside the pixel, and a point connection from vertex y carries
  C = beta * f * cos(theta_y) * We * cos(theta_c) / d^2.
Validated against the forward path tracer in tests/test_lighttrace.py.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from stratum_tpu.core import math as smath
from stratum_tpu.core import rng as srng
from stratum_tpu.ops import intersect
from stratum_tpu.render import camera as scamera
from stratum_tpu.render import lights as slights
from stratum_tpu.render.integrator import RenderConfig, _bsdf_fns, _trace_fns
from stratum_tpu.render.shading import (
    adjoint_ns_factor,
    apply_textures,
    load_material,
    make_shading_point,
)
from stratum_tpu.scene.schema import SceneData

# RNG stream namespace for light paths (disjoint from camera-pixel streams,
# which use pixel coords as the first two state words)
_LIGHT_STREAM = np.uint32(0x9E3779B9)


def trace_light(
    scene: SceneData, view, cfg: RenderConfig, seed, num_paths=None,
    lane0=0, total_paths=None,
):
    """Trace ``num_paths`` light subpaths (default W*H) and splat camera
    connections. Returns the light-traced image [H, W, 3] — an unbiased
    estimate of the same measurement as the forward path tracer EXCEPT
    directly-visible emitters (the t=1 strategy; add an emission-only camera
    pass for a complete image, as render_lt does).

    Sharded callers pass their lane count plus ``lane0`` (global first-lane
    index, keeps RNG streams globally unique) and ``total_paths`` (the
    estimator's 1/N normalization); the returned partial splat image is
    psum'd over the mesh (parallel/mesh.py)."""
    bsdf_eval, bsdf_sample = _bsdf_fns(cfg)
    trace_closest, trace_occluded = _trace_fns(scene, cfg)
    geo = scene.geo
    if num_paths is None:
        num_paths = cfg.width * cfg.height
    n = num_paths
    norm = total_paths if total_paths else n
    path_id = lane0 + jnp.arange(n, dtype=jnp.uint32)
    st = srng.rng_init(path_id, _LIGHT_STREAM, seed)

    cam_pos = view.camera_to_world[:, 3]
    num_pix = cfg.width * cfg.height
    image = jnp.zeros((num_pix, 3), jnp.float32)

    # -- emit from a light (sample_photons, bdpt.hlsl:103-147) -------------
    u, st = srng.next_floats(st, 3)
    ls = slights.sample_area_light(scene, u[..., 0], u[..., 1], u[..., 2])
    u, st = srng.next_floats(st, 2)
    local_dir = smath.sample_cos_hemisphere(u[..., 0], u[..., 1])
    direction = smath.to_world(local_dir, ls.normal)
    pdf_dir = smath.cosine_hemisphere_pdfW(local_dir[..., 2])
    # beta = Le * cos / (pdfA * pdfW) ; cos/pdfW = pi
    beta = ls.radiance * smath.safe_div(np.pi, ls.pdf_area)[..., None]
    origin = intersect.ray_offset(ls.position, ls.normal)
    alive = (ls.pdf_area > 0) & (
        jnp.max(ls.radiance, axis=-1) > 0
    )

    def splat(image, position, geom_normal, contrib, ok):
        """Project to the view, trace visibility to the camera, scatter-add
        (connect_view, path.hlsli:536-616)."""
        pix, inside, _ = scamera.sensor_importance(
            view, position, cfg.width, cfg.height
        )
        to_cam = cam_pos - position
        dist = smath.length(to_cam)
        wi_cam = to_cam / jnp.maximum(dist, 1e-20)[..., None]
        shadow_o = intersect.ray_offset(position, geom_normal)
        occluded = trace_occluded(shadow_o, wi_cam, dist)
        px = jnp.clip(pix[..., 0].astype(jnp.int32), 0, cfg.width - 1)
        py = jnp.clip(pix[..., 1].astype(jnp.int32), 0, cfg.height - 1)
        idx = py * cfg.width + px
        ok = ok & inside & ~occluded
        val = jnp.where(ok[..., None], contrib, 0.0)
        return image.at[idx].add(val), wi_cam, dist

    # camera importance: We * cos_c / d^2 with We = N/(A cos^3)
    def cam_factor(position):
        p_cam = jnp.einsum(
            "ij,nj->ni", view.world_to_camera[:, :3], position
        ) + view.world_to_camera[:, 3]
        dist2 = smath.length_squared(p_cam)
        cos_c = jnp.abs(p_cam[..., 2]) / jnp.maximum(
            jnp.sqrt(dist2), 1e-20
        )
        a_plane = view.projection.sensor_area
        we = num_pix / jnp.maximum(a_plane * cos_c ** 3, 1e-20)
        return smath.safe_div(we * cos_c, dist2)

    def bounce(carry, _):
        image, origin, direction, beta, st, alive = carry
        hit = trace_closest(origin, direction)
        sp = make_shading_point(geo, hit.tri, hit.bary, direction)
        mat = load_material(scene.materials, sp.material)
        if scene.textures.resolution > 1:
            mat = apply_textures(
                mat, scene.materials, scene.textures, sp.material, sp.uv
            )
        mat = mat._replace(
            eta=jnp.where(
                sp.front_face, mat.eta, 1.0 / jnp.maximum(mat.eta, 1e-6)
            )
        )
        alive = alive & hit.hit
        ns = sp.shading_normal
        wo_local = smath.to_local(-direction, ns)

        # connect this vertex to the camera
        to_cam = cam_pos - sp.position
        dist_c = smath.length(to_cam)
        wi_cam_w = to_cam / jnp.maximum(dist_c, 1e-20)[..., None]
        wi_cam_local = smath.to_local(wi_cam_w, ns)
        ev = bsdf_eval(mat, wo_local, wi_cam_local)
        w_cam = cam_factor(sp.position)
        # shading-normal adjoint: importance transport weighted by |ns.wi|
        # needs Veach's cosine-ratio correction (path.hlsli:67-98 adjoint)
        adj_ns = adjoint_ns_factor(sp.geom_normal, ns, -direction, wi_cam_w)
        contrib = (
            beta
            * ev.f
            * (jnp.abs(wi_cam_local[..., 2]) * adj_ns * w_cam / norm)[..., None]
        )
        ok = alive & (jnp.max(contrib, axis=-1) > 0)
        image, _, _ = splat(image, sp.position, sp.geom_normal, contrib, ok)

        # continue the subpath (adjoint transport: the glass eta^2 radiance
        # factor flips for importance transport; tracked via bs.eta)
        u, st2 = srng.next_floats(st, 3)
        bs = bsdf_sample(mat, wo_local, u)
        new_dir = smath.to_world(bs.wi, ns)
        thr = bs.f * smath.safe_div(jnp.abs(bs.wi[..., 2]), bs.pdf_fwd)[..., None]
        # adjoint correction for refraction: importance transport carries
        # eta^2 relative to radiance transport (path.hlsli:67-98 adjoint)
        adj = jnp.where(bs.eta > 0, bs.eta * bs.eta, 1.0)
        adj = adj * adjoint_ns_factor(sp.geom_normal, ns, -direction, new_dir)
        thr = thr * adj[..., None]
        beta = beta * jnp.where(alive[..., None], thr, 1.0)
        alive = alive & (bs.pdf_fwd > 1e-12) & (jnp.max(beta, axis=-1) > 0)
        offset_sign = jnp.sign(bs.wi[..., 2:3])
        origin = jnp.where(
            alive[..., None],
            intersect.ray_offset(sp.position, sp.geom_normal * offset_sign),
            origin,
        )
        direction = jnp.where(alive[..., None], new_dir, direction)

        # Russian roulette on the light path
        u_rr, st2 = srng.next_float(st2)
        p_cont = jnp.clip(smath.max3(beta), cfg.rr_min_beta, 1.0)
        survive = u_rr < p_cont
        beta = jnp.where(survive[..., None], beta / p_cont[..., None], beta)
        alive = alive & survive
        return (image, origin, direction, beta, st2, alive), None

    carry = (image, origin, direction, beta, st, alive)
    carry, _ = lax.scan(bounce, carry, None, length=cfg.max_bounces + 1)
    return carry[0].reshape(cfg.height, cfg.width, 3)


def trace_emission_only(scene: SceneData, view, cfg: RenderConfig, seed):
    """Camera rays that accumulate ONLY directly-visible emission + env —
    the t=1 strategy light tracing cannot produce (reference: the view path
    contributes emission before any connection, path.hlsli:847-894)."""
    trace_closest, _ = _trace_fns(scene, cfg)
    px, py = scamera.pixel_grid(cfg.width, cfg.height)
    st = srng.rng_init(px, py, seed)
    u, st = srng.next_floats(st, 2)
    origin, direction = scamera.generate_rays(
        view, px, py, u, cfg.width, cfg.height
    )
    hit = trace_closest(origin, direction)
    sp = make_shading_point(scene.geo, hit.tri, hit.bary, direction)
    mat = load_material(scene.materials, sp.material)
    rad = jnp.where(
        (~hit.hit)[..., None],
        slights.eval_environment(scene, direction),
        jnp.where(
            (sp.front_face & (sp.light >= 0))[..., None], mat.emission, 0.0
        ),
    )
    return rad.reshape(cfg.height, cfg.width, 3)


from functools import partial


@partial(jax.jit, static_argnums=(2,))
def render_lt(scene: SceneData, view, cfg: RenderConfig, seed):
    """Complete light-traced image: splats + directly-visible emission.
    cfg is a static jit key (NOT wrapped per call: a per-call ``jax.jit``
    closure would recompile every sample)."""
    return trace_light(scene, view, cfg, seed) + trace_emission_only(
        scene, view, cfg, seed
    )


def render_lt_progressive(scene, view, cfg, spp: int, seed0=0):
    """All spp light-trace samples in ONE compiled launch (lax.scan over
    seeds, like integrator.render_path_batched): per-sample dispatch
    amortizes away; accumulation order matches the sequential loop."""
    return _render_lt_batched(scene, view, cfg, spp, seed0)


@partial(jax.jit, static_argnums=(2, 3))
def _render_lt_batched(scene, view, cfg, spp: int, seed0=0):
    def sample(acc, seed):
        return acc + render_lt(scene, view, cfg, seed), None

    acc0 = jnp.zeros((cfg.height, cfg.width, 3), jnp.float32)
    seeds = seed0 + jnp.arange(spp, dtype=jnp.int32)
    acc, _ = jax.lax.scan(sample, acc0, seeds)
    return acc / spp
