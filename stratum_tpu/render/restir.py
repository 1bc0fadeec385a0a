"""ReSTIR direct illumination: RIS candidates + temporal reservoir reuse.

TPU-native analog of the reference's reservoir NEE with history reuse
(``connect_light_reservoir`` with RIS + prev-frame spatial reuse,
src/Shaders/common/path.hlsli:367-487; NEEReservoir records, bdpt.h:158-167;
flags eNEEReservoirs / eNEEReservoirReuse). The reference reuses through a
world-space hash grid; here the per-pixel screen-space buffer is the
temporal carrier (static-camera reuse v1 — on camera moves RenderSession
resets the buffer exactly like the reference resets on accumulation reset).

Per frame:
  1. first-hit shading points at jittered pixel positions;
  2. M initial light candidates stream into a fresh reservoir with target
     p_hat = luminance(unshadowed contribution, full BSDF);
  3. the previous frame's reservoir merges in (history M clamped to
     ``history_limit`` x M, the standard ReSTIR bias/vigor tradeoff — the
     reference caps reservoir M the same way);
  4. one visibility ray shades the winner:
     L = contrib/p_hat * W * V  (+ direct emission / environment).

This pass renders DIRECT lighting; progressive PT supplies indirect light
(RenderSession composes them when ``restir`` is on).
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from stratum_tpu.core import math as smath
from stratum_tpu.core import reservoir as sres
from stratum_tpu.core import rng as srng
from stratum_tpu.ops import intersect
from stratum_tpu.render import camera as scamera
from stratum_tpu.render import lights as slights
from stratum_tpu.render.integrator import RenderConfig, _bsdf_fns, _trace_fns
from stratum_tpu.render.shading import (
    apply_textures,
    load_material,
    make_shading_point,
)

_RESTIR_STREAM = np.uint32(0xC0FFEE11)


class RestirState(NamedTuple):
    """Per-pixel reservoirs carried across frames."""

    light_pos: jnp.ndarray  # [N,3]
    light_normal: jnp.ndarray  # [N,3]
    light_radiance: jnp.ndarray  # [N,3]
    is_env: jnp.ndarray  # bool [N]
    target_pdf: jnp.ndarray  # [N]
    total_weight: jnp.ndarray  # [N]
    m: jnp.ndarray  # [N]


def init_restir(num_pixels: int) -> RestirState:
    z3 = jnp.zeros((num_pixels, 3), jnp.float32)
    z = jnp.zeros((num_pixels,), jnp.float32)
    return RestirState(z3, z3, z3, jnp.zeros((num_pixels,), bool), z, z, z)


def restir_di(
    scene, view, cfg: RenderConfig, state: RestirState, seed,
    candidates: int = 4, history_limit: float = 20.0,
):
    """One ReSTIR DI frame. Returns (new_state, direct_radiance [H,W,3])."""
    bsdf_eval, _ = _bsdf_fns(cfg)
    trace_closest, trace_occluded = _trace_fns(scene, cfg)
    geo = scene.geo
    px, py = scamera.pixel_grid(cfg.width, cfg.height)
    st = srng.rng_init(
        px, py, _RESTIR_STREAM + jnp.asarray(seed, jnp.uint32)
    )
    u, st = srng.next_floats(st, 2)
    origin, direction = scamera.generate_rays(
        view, px, py, u, cfg.width, cfg.height
    )
    n = origin.shape[0]
    hit = trace_closest(origin, direction)
    sp = make_shading_point(geo, hit.tri, hit.bary, direction)
    mat = load_material(scene.materials, sp.material)
    if scene.textures.resolution > 1:
        mat = apply_textures(
            mat, scene.materials, scene.textures, sp.material, sp.uv
        )
    wo_local = smath.to_local(-direction, sp.shading_normal)

    def unshadowed(lpos, lnormal, lrad, is_env):
        to_l = jnp.where(is_env[..., None], lpos, lpos - sp.position)
        dist = jnp.where(is_env, intersect.T_MAX * 0.5, smath.length(to_l))
        wi = jnp.where(
            is_env[..., None], lpos,
            to_l / jnp.maximum(dist, 1e-20)[..., None],
        )
        cos_l = jnp.where(
            is_env, 1.0, jnp.maximum(smath.dot(-wi, lnormal), 0.0)
        )
        ev = bsdf_eval(mat, wo_local, smath.to_local(wi, sp.shading_normal))
        g = jnp.where(is_env, 1.0, smath.safe_div(cos_l, dist * dist))
        contrib = (
            ev.f * lrad * (jnp.abs(smath.dot(wi, sp.shading_normal)) * g)[..., None]
        )
        contrib = jnp.where((cos_l > 0)[..., None], contrib, 0.0)
        return contrib, wi, dist

    # -- initial candidates (RIS) -------------------------------------------
    payload0 = dict(
        pos=jnp.zeros((n, 3)), nrm=jnp.zeros((n, 3)),
        rad=jnp.zeros((n, 3)), env=jnp.zeros((n,), bool),
    )
    res = sres.init_reservoir(payload0, n)
    for _m in range(candidates):
        u, st = srng.next_floats(st, 4)
        ls = slights.sample_light(scene, u[..., 0], u[..., 1], u[..., 2])
        contrib, _, _ = unshadowed(
            ls.position, ls.normal, ls.radiance, ls.is_env
        )
        # candidates are drawn with pdf_area; RIS weight = p_hat / pdf
        p_hat = smath.luminance(contrib)
        w = smath.safe_div(p_hat, ls.pdf_area)
        res = sres.update(
            res,
            dict(pos=ls.position, nrm=ls.normal, rad=ls.radiance,
                 env=ls.is_env),
            p_hat, w, u[..., 3],
        )

    # -- temporal merge (prev frame's reservoir at the same pixel) ----------
    # ReSTIR temporal math: the previous sample re-enters with weight
    # w = p_hat_new * W_prev * M_clamped, where W_prev is the stored
    # contribution weight and p_hat_new re-evaluates the sample's target at
    # the CURRENT surface (jittered subpixel -> slightly different point)
    m_clamped = jnp.minimum(state.m, history_limit * candidates)
    w_prev_contrib = smath.safe_div(
        state.total_weight,
        state.m * jnp.maximum(state.target_pdf, 1e-20),
    )  # stored W_prev
    prev_contrib, _, _ = unshadowed(
        state.light_pos, state.light_normal, state.light_radiance,
        state.is_env,
    )
    p_hat_prev = smath.luminance(prev_contrib)
    w_prev = p_hat_prev * w_prev_contrib * m_clamped
    u_merge, st = srng.next_float(st)
    total = res.total_weight + w_prev
    keep_prev = (u_merge * jnp.maximum(total, 1e-20)) < w_prev
    merged_sample = sres._tree_select(
        keep_prev,
        dict(pos=state.light_pos, nrm=state.light_normal,
             rad=state.light_radiance, env=state.is_env),
        res.sample,
    )
    merged = sres.Reservoir(
        sample=merged_sample,
        target_pdf=jnp.where(keep_prev, p_hat_prev, res.target_pdf),
        total_weight=total,
        m=res.m + m_clamped,
    )

    # -- shade the winner ----------------------------------------------------
    contrib, wi, dist = unshadowed(
        merged.sample["pos"], merged.sample["nrm"], merged.sample["rad"],
        merged.sample["env"],
    )
    w_big = sres.contribution_weight(merged)
    shadow_o = intersect.ray_offset(sp.position, sp.geom_normal)
    occluded = trace_occluded(shadow_o, wi, dist)
    ok = hit.hit & ~occluded & (merged.target_pdf > 0)
    direct = jnp.where(
        ok[..., None],
        smath.safe_div(contrib, merged.target_pdf[..., None]) *
        (merged.target_pdf * w_big)[..., None],
        0.0,
    )
    # emission + environment
    direct = direct + jnp.where(
        (~hit.hit)[..., None],
        slights.eval_environment(scene, direction),
        jnp.where(
            (sp.front_face & (sp.light >= 0))[..., None], mat.emission, 0.0
        ),
    )
    new_state = RestirState(
        light_pos=merged.sample["pos"],
        light_normal=merged.sample["nrm"],
        light_radiance=merged.sample["rad"],
        is_env=merged.sample["env"],
        target_pdf=merged.target_pdf,
        total_weight=merged.total_weight,
        m=merged.m,
    )
    return new_state, direct.reshape(cfg.height, cfg.width, 3)


@partial(jax.jit, static_argnums=(2, 5, 6))
def restir_di_jit(scene, view, cfg, state, seed, candidates=4,
                  history_limit=20.0):
    return restir_di(scene, view, cfg, state, seed, candidates, history_limit)
