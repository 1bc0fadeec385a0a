"""ReSTIR direct illumination: RIS + temporal + spatial reservoir reuse.

TPU-native analog of the reference's reservoir NEE with history reuse
(``connect_light_reservoir`` with RIS + prev-frame spatial reuse,
src/Shaders/common/path.hlsli:367-487; NEEReservoir records, bdpt.h:158-167;
flags eNEEReservoirs / eNEEReservoirReuse). The reference reuses through a
world-space hash grid; here temporal reuse is carried by the per-pixel
buffer **reprojected through camera motion** (gather at the prev-frame
pixel of each first hit) and spatial reuse queries the sort-rebuilt
world-space hash grid (ops/hashgrid.py) for same-cell neighbors.

Per frame:
  1. first-hit shading points at jittered pixel positions;
  2. M initial light candidates stream into a fresh reservoir with target
     p_hat = luminance(unshadowed contribution, full BSDF);
  3. the previous frame's reservoir — fetched at this hit's PREVIOUS-view
     pixel when ``prev_view`` is given — merges in (history M clamped to
     ``history_limit`` x M, the standard ReSTIR bias/vigor tradeoff — the
     reference caps reservoir M the same way);
  4. ``spatial_taps`` random same-cell neighbors merge in through the
     world-space hash grid (target re-evaluated at the receiver);
  5. one visibility ray shades the winner:
     L = contrib/p_hat * W * V  (+ direct emission / environment).

This pass renders DIRECT lighting; RenderSession composes it with an
indirect-only progressive PT pass when ``use_restir`` is on, and the CLI
exposes it as ``--integrator=restir``.
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


def _pack_state(s: RestirState) -> jnp.ndarray:
    """[N,16] single-row packing so neighbor/history fetches cost ONE gather
    (XLA gathers ~5ns/row; 7 separate fetches would 7x that)."""
    return jnp.concatenate(
        [
            s.light_pos, s.light_normal, s.light_radiance,
            s.is_env.astype(jnp.float32)[:, None],
            s.target_pdf[:, None], s.total_weight[:, None], s.m[:, None],
            jnp.zeros((s.m.shape[0], 3), jnp.float32),
        ],
        axis=-1,
    )


def _unpack_state(p: jnp.ndarray) -> RestirState:
    return RestirState(
        light_pos=p[:, 0:3],
        light_normal=p[:, 3:6],
        light_radiance=p[:, 6:9],
        is_env=p[:, 9] > 0.5,
        target_pdf=p[:, 10],
        total_weight=p[:, 11],
        m=p[:, 12],
    )


def restir_di(
    scene, view, cfg: RenderConfig, state: RestirState, seed,
    candidates: int = 4, history_limit: float = 20.0,
    prev_view=None, spatial_taps: int = 0, hash_jitter: bool = False,
):
    """One ReSTIR DI frame. Returns (new_state, direct_radiance [H,W,3]).

    ``prev_view``: the view ``state`` was rendered with; when given, history
    is fetched at each first hit's pixel in that view (temporal
    reprojection; reference: prev-frame hashgrid lookups keyed by world
    position, path.hlsli:432-487). ``spatial_taps`` > 0 additionally merges
    that many random same-cell neighbors via the world-space hash grid."""
    px, py = scamera.pixel_grid(cfg.width, cfg.height)
    hist_packed = _pack_state(state) if prev_view is not None else None
    new_state, direct = _restir_flat(
        scene, view, cfg, state, hist_packed, px, py, seed,
        candidates, history_limit, prev_view, spatial_taps, hash_jitter,
    )
    return new_state, direct.reshape(cfg.height, cfg.width, 3)


def _restir_flat(
    scene, view, cfg: RenderConfig, state: RestirState, hist_packed,
    px, py, seed, candidates: int, history_limit: float,
    prev_view, spatial_taps: int, hash_jitter: bool = False,
):
    """Flat-core ReSTIR DI over an arbitrary pixel subset (``px``/``py``
    absolute coords, ``state`` rows aligned with those lanes). Shared by the
    full-frame wrapper and the sharded tiles: temporal reprojection reads
    ``hist_packed`` — the FULL-FRAME packed reservoir table (a reprojected
    hit's previous pixel can land in any tile, so the sharded caller
    all-gathers its rows first) — while the no-motion path and spatial
    reuse stay lane-local. Returns (new_state rows, direct rows [n,3])."""
    bsdf_eval, _ = _bsdf_fns(cfg)
    trace_closest, trace_occluded = _trace_fns(scene, cfg)
    geo = scene.geo
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

    # -- temporal merge (prev frame's reservoir, reprojected) ---------------
    # ReSTIR temporal math: the previous sample re-enters with weight
    # w = p_hat_new * W_prev * M_clamped, where W_prev is the stored
    # contribution weight and p_hat_new re-evaluates the sample's target at
    # the CURRENT surface (jittered subpixel -> slightly different point)
    if prev_view is not None:
        # fetch history at this hit's pixel in the PREVIOUS view: reuse
        # survives camera motion (reference: world-keyed hashgrid lookups)
        pix, inside, _ = scamera.sensor_importance(
            prev_view, sp.position, cfg.width, cfg.height
        )
        pxi = jnp.clip(pix[..., 0].astype(jnp.int32), 0, cfg.width - 1)
        pyi = jnp.clip(pix[..., 1].astype(jnp.int32), 0, cfg.height - 1)
        hist_row = hist_packed[pyi * cfg.width + pxi]
        hist = _unpack_state(hist_row)
        hist_ok = inside & hit.hit
        hist = hist._replace(m=jnp.where(hist_ok, hist.m, 0.0))
    else:
        hist = state

    def merge_in(res, other: RestirState, u_merge, m_cap):
        """Stream another reservoir's kept sample into ``res`` with weight
        p_hat_here * W_other * M_other (the standard reuse merge)."""
        m_other = jnp.minimum(other.m, m_cap)
        w_contrib = smath.safe_div(
            other.total_weight,
            other.m * jnp.maximum(other.target_pdf, 1e-20),
        )  # stored W
        contrib_o, _, _ = unshadowed(
            other.light_pos, other.light_normal, other.light_radiance,
            other.is_env,
        )
        p_hat_o = smath.luminance(contrib_o)
        w_o = p_hat_o * w_contrib * m_other
        total = res.total_weight + w_o
        keep = (u_merge * jnp.maximum(total, 1e-20)) < w_o
        sample = sres._tree_select(
            keep,
            dict(pos=other.light_pos, nrm=other.light_normal,
                 rad=other.light_radiance, env=other.is_env),
            res.sample,
        )
        return sres.Reservoir(
            sample=sample,
            target_pdf=jnp.where(keep, p_hat_o, res.target_pdf),
            total_weight=total,
            m=res.m + m_other,
        )

    u_merge, st = srng.next_float(st)
    merged = merge_in(res, hist, u_merge, history_limit * candidates)

    # -- spatial reuse: same-cell neighbors via the world hash grid ---------
    # (reference: connect_light_reservoir's prev-frame spatial taps,
    # path.hlsli:432-487; the grid is ops/hashgrid.py's sort-rebuilt form)
    if spatial_taps > 0:
        from stratum_tpu.ops import hashgrid as shg

        cam_pos = view.camera_to_world[:, 3]
        cell = shg.cell_size_for(cam_pos, sp.position, 2.0e-3)
        grid = shg.build_hashgrid(sp.position, cell)
        qpos = sp.position
        if hash_jitter:
            # tangent-plane cell jitter (reference eHashGridJitter,
            # path.hlsli:405-439: cell_size * u * (t cos phi + b sin phi))
            # — decorrelates cell-boundary artifacts by letting taps reach
            # across the quantization edge
            uj, st = srng.next_floats(st, 2)
            t_b, b_b = smath.make_orthonormal(sp.geom_normal)
            phi = uj[..., 1] * (2.0 * jnp.pi)
            qpos = sp.position + (
                cell
                * uj[..., 0:1]
                * (t_b * jnp.cos(phi)[:, None] + b_b * jnp.sin(phi)[:, None])
            )
        ids, valid = shg.query(grid, qpos, max_results=8)
        packed = _pack_state(
            RestirState(
                light_pos=merged.sample["pos"],
                light_normal=merged.sample["nrm"],
                light_radiance=merged.sample["rad"],
                is_env=merged.sample["env"],
                target_pdf=merged.target_pdf,
                total_weight=merged.total_weight,
                m=merged.m,
            )
        )
        for _t in range(spatial_taps):
            u, st = srng.next_floats(st, 2)
            n_valid = jnp.sum(valid, axis=-1)
            pick = jnp.minimum(
                (u[..., 0] * n_valid).astype(jnp.int32),
                jnp.maximum(n_valid - 1, 0),
            )
            nid = jnp.take_along_axis(ids, pick[:, None], axis=-1)[:, 0]
            ok = (n_valid > 0) & (nid >= 0) & (nid != jnp.arange(n)) & hit.hit
            nb = _unpack_state(packed[jnp.maximum(nid, 0)])
            nb = nb._replace(m=jnp.where(ok, nb.m, 0.0))
            merged = merge_in(
                merged, nb, u[..., 1], history_limit * candidates
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
    return new_state, direct


@partial(jax.jit, static_argnums=(2, 5, 6, 8, 9))
def restir_di_jit(scene, view, cfg, state, seed, candidates=4,
                  history_limit=20.0, prev_view=None, spatial_taps=0,
                  hash_jitter=False):
    return restir_di(
        scene, view, cfg, state, seed, candidates, history_limit,
        prev_view, spatial_taps, hash_jitter,
    )
