"""Bidirectional path tracing: all (s,t) connection strategies with MIS.

TPU-native analog of the reference's BDPT renderer — the camera/light
subpath walks of ``sample_visibility``/``sample_photons``
(src/Shaders/kernels/renderers/bdpt.hlsl:103-300), the s-t connections
``connect_light_vertex``/``connect_light_subpath``
(src/Shaders/common/path.hlsli:617-822), camera splats ``connect_view``
(536-616) and the recursive MIS quantities (``connection_dVC``,
path.hlsli:31-38).

Architectural translation: the reference interleaves connections inside a
megakernel using running recursive MIS terms packed into 64B PathVertex
records (Shaders/bdpt.h:107-156). Here both subpaths are materialized as
dense SoA vertex arrays [N, depth] (the wavefront analog of the light
vertex cache), and the MIS weight for every strategy is computed by the
classic forward/reverse area-pdf ratio loop over stored vertices (Veach's
formulation; identical math to the reference's recursion, but evaluated
with static loops over the bounded depth — XLA-friendly control flow).

Strategies: s=0 (camera path hits the emitter), s=1 (NEE), s>=2 x t>=2
(subpath connections), t=1 (light tracing splats). Environment lighting is
carried by exactly two estimators — BSDF escape and env NEE (a light
subpath cannot start at infinity) — combined with the pairwise power
heuristic, which therefore partitions unity; area lights participate in
every strategy. Subpath walks apply Russian roulette from cfg.rr_depth
(path.hlsli:828-845).
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from stratum_tpu.core import math as smath
from stratum_tpu.core import rng as srng
from stratum_tpu.ops import intersect
from stratum_tpu.render import camera as scamera
from stratum_tpu.render import lights as slights
from stratum_tpu.render.integrator import (
    RenderConfig,
    _bsdf_fns,
    _trace_fns,
    mis_power_heuristic,
)
from stratum_tpu.render.shading import (
    apply_textures,
    load_material,
    make_shading_point,
)
from stratum_tpu.scene.schema import SceneData

_LIGHT_STREAM = np.uint32(0x9E3779B9)


class VertexArrays(NamedTuple):
    """One subpath's vertices as SoA arrays [N, D] (slot 0 = first surface
    vertex; the endpoint — camera or light sample — is kept separately)."""

    position: jnp.ndarray  # [N,D,3]
    ns: jnp.ndarray  # [N,D,3] shading normal (toward arrival side)
    ng: jnp.ndarray  # [N,D,3] geometric normal (same orientation)
    wo: jnp.ndarray  # [N,D,3] unit dir toward the PREVIOUS vertex
    beta: jnp.ndarray  # [N,D,3] throughput UP TO this vertex
    pdf_fwd: jnp.ndarray  # [N,D] area pdf of generating this vertex
    pdf_rev: jnp.ndarray  # [N,D] area pdf of the reverse construction
    material: jnp.ndarray  # [N,D] material row
    uv: jnp.ndarray  # [N,D,2]
    front: jnp.ndarray  # [N,D] bool front-face (for eta)
    light_row: jnp.ndarray  # [N,D] light index if on an emitter else -1
    valid: jnp.ndarray  # [N,D] bool


def _mat_at(scene, cfg, material, uv, front):
    mat = load_material(scene.materials, material)
    if scene.textures.resolution > 1:
        mat = apply_textures(mat, scene.materials, scene.textures, material, uv)
    return mat._replace(
        eta=jnp.where(front, mat.eta, 1.0 / jnp.maximum(mat.eta, 1e-6))
    )


def _to_area(pdf_w, from_pos, to_pos, to_ng):
    """Solid-angle pdf at ``from`` -> area pdf at ``to``
    (pdfWtoA, reference common.h:197-203)."""
    d = to_pos - from_pos
    dist2 = smath.length_squared(d)
    cos_t = jnp.abs(smath.dot(smath.normalize(d), to_ng))
    return pdf_w * smath.safe_div(cos_t, dist2)


class EscapeRecord(NamedTuple):
    """Rays that left the scene during a subpath walk, per step: step i
    escaped while tracing toward vertex i (path length = i recorded
    vertices + the environment). Feeds the env-light strategies."""

    mask: jnp.ndarray  # bool [N, D]
    direction: jnp.ndarray  # [N, D, 3]
    beta: jnp.ndarray  # [N, D, 3] throughput up to the escape
    pdf_w: jnp.ndarray  # [N, D] solid-angle pdf of the escape direction


def random_walk(scene, cfg, st, origin, direction, beta0, pdf_dir_w, depth):
    """Generalized subpath walk (reference: the shared ``next_vertex`` loop,
    path.hlsli:954-1075). Records ``depth`` surface vertices plus escape
    events (for env-light strategies), with Russian roulette from
    ``cfg.rr_depth`` (path.hlsli:828-845; RR compensation is folded into
    beta and deliberately NOT into the stored MIS pdfs — any weights
    computed consistently from the stored arrays still partition unity).
    ``pdf_dir_w`` is the solid-angle pdf of the initial direction."""
    bsdf_eval, bsdf_sample = _bsdf_fns(cfg)
    trace_closest, _ = _trace_fns(scene, cfg)
    geo = scene.geo
    n = origin.shape[0]

    def empty(shape, dtype=jnp.float32, fill=0):
        return jnp.full((n, depth) + shape, fill, dtype)

    va = VertexArrays(
        position=empty((3,)),
        ns=empty((3,)),
        ng=empty((3,)),
        wo=empty((3,)),
        beta=empty((3,)),
        pdf_fwd=empty(()),
        pdf_rev=empty(()),
        material=empty((), jnp.int32, -1),
        uv=empty((2,)),
        front=empty((), bool, False),
        light_row=empty((), jnp.int32, -1),
        valid=empty((), bool, False),
    )
    esc = EscapeRecord(
        mask=empty((), bool, False),
        direction=empty((3,)),
        beta=empty((3,)),
        pdf_w=empty(()),
    )

    def body(i, carry):
        (va, esc, origin, direction, beta, pdf_dir_w, prev_pos, prev_ng, st,
         alive, _endpoint_rev) = carry
        hit = trace_closest(origin, direction)
        sp = make_shading_point(geo, hit.tri, hit.bary, direction)
        escaped = alive & ~hit.hit
        esc = EscapeRecord(
            mask=esc.mask.at[:, i].set(escaped),
            direction=esc.direction.at[:, i].set(
                jnp.where(escaped[:, None], direction, 0.0)
            ),
            beta=esc.beta.at[:, i].set(
                jnp.where(escaped[:, None], beta, 0.0)
            ),
            pdf_w=esc.pdf_w.at[:, i].set(
                jnp.where(escaped, pdf_dir_w, 0.0)
            ),
        )
        alive = alive & hit.hit
        pdf_fwd = _to_area(pdf_dir_w, prev_pos, sp.position, sp.geom_normal)
        mat = _mat_at(scene, cfg, sp.material, sp.uv, sp.front_face)
        wo_local = smath.to_local(-direction, sp.shading_normal)
        u, st = srng.next_floats(st, 3)
        bs = bsdf_sample(mat, wo_local, u)
        # write vertex i
        def w(arr, val):
            return arr.at[:, i].set(jnp.where(
                alive.reshape((n,) + (1,) * (val.ndim - 1)), val, arr[:, i]
            ))
        va = VertexArrays(
            position=w(va.position, sp.position),
            ns=w(va.ns, sp.shading_normal),
            ng=w(va.ng, sp.geom_normal),
            wo=w(va.wo, -direction),
            beta=w(va.beta, beta),
            pdf_fwd=w(va.pdf_fwd, pdf_fwd),
            pdf_rev=va.pdf_rev,
            material=w(va.material, sp.material),
            uv=w(va.uv, sp.uv),
            front=w(va.front, sp.front_face),
            light_row=w(va.light_row, sp.light),
            valid=va.valid.at[:, i].set(va.valid[:, i] | alive),
        )
        # reverse pdf of the PREVIOUS vertex (bsdf pdf back along the path);
        # for i == 0 the previous vertex is the subpath endpoint
        # (camera / light sample) — capture its rev separately
        rev_area = _to_area(bs.pdf_rev, sp.position, prev_pos, prev_ng)
        va = va._replace(
            pdf_rev=lax.cond(
                i > 0,
                lambda pr: pr.at[:, jnp.maximum(i - 1, 0)].set(
                    jnp.where(alive, rev_area, pr[:, jnp.maximum(i - 1, 0)])
                ),
                lambda pr: pr,
                va.pdf_rev,
            )
        )
        endpoint_rev = jnp.where(
            (i == 0) & alive, rev_area, carry[10]
        )
        # continue
        new_dir = smath.to_world(bs.wi, sp.shading_normal)
        thr = bs.f * smath.safe_div(jnp.abs(bs.wi[..., 2]), bs.pdf_fwd)[..., None]
        beta = beta * jnp.where(alive[..., None], thr, 1.0)
        alive_next = alive & (bs.pdf_fwd > 1e-12) & (jnp.max(beta, axis=-1) > 0)
        # Russian roulette inside the subpath walk (path.hlsli:828-845)
        u_rr, st = srng.next_float(st)
        p_cont = jnp.clip(smath.max3(beta), cfg.rr_min_beta, 1.0)
        do_rr = i >= cfg.rr_depth
        survive = ~do_rr | (u_rr < p_cont)
        beta = jnp.where(
            (do_rr & survive)[..., None], beta / p_cont[..., None], beta
        )
        alive_next = alive_next & survive
        offset_sign = jnp.sign(bs.wi[..., 2:3])
        origin = jnp.where(
            alive_next[..., None],
            intersect.ray_offset(sp.position, sp.geom_normal * offset_sign),
            origin,
        )
        direction = jnp.where(alive_next[..., None], new_dir, direction)
        return (
            va, esc, origin, direction, beta, bs.pdf_fwd,
            sp.position, sp.geom_normal, st, alive_next, endpoint_rev,
        )

    carry = (
        va, esc, origin, direction, beta0, pdf_dir_w,
        origin, jnp.zeros_like(origin), st, jnp.ones((n,), bool),
        jnp.zeros((n,), jnp.float32),
    )
    carry = lax.fori_loop(0, depth, body, carry)
    # vertices, escapes, rng state, endpoint rev
    return carry[0], carry[1], carry[8], carry[10]


# ---------------------------------------------------------------------------
# MIS weight: forward/reverse ratio loops over stored vertices
# ---------------------------------------------------------------------------

def _remap0(x):
    return jnp.where(x > 0, x, 1.0)


def _slot(arr, i):
    """arr[:, i] with traced scalar i (clamped)."""
    return jnp.take_along_axis(
        arr, jnp.full((arr.shape[0], 1), i, jnp.int32), axis=1
    )[:, 0]


def mis_weight_arrays(z_fwd, z_rev, y_fwd, y_rev, tsurf: int, s: int):
    """Power-heuristic MIS weight for strategy (s, t) with t = tsurf + 1
    camera vertices (tsurf stored surface vertices + the pinhole), given
    forward/reverse AREA pdfs WITH the connection-specific overrides
    already substituted at the endpoint slots.

    z arrays [N, >=tsurf]: slot j = camera surface vertex z_{j+1}.
    y arrays [N, >=s]: slot 0 = the point on the light (y0), slot j = y_j.

    Walking the split toward the camera enumerates strategies
    (s+1, t-1) ... (s+t-1, 1) — slot tsurf-1 down to 0 (t'=0 is impossible
    for a pinhole); walking toward the light enumerates (s-1, t+1) ...
    (0, s+t) — slot s-1 down to 0. Static python loops over bounded depth
    (the dense analog of the reference's dVC recursion, path.hlsli:31-38).
    """
    n = z_fwd.shape[0]
    sum_ri = jnp.zeros((n,), jnp.float32)
    ri = jnp.ones((n,), jnp.float32)
    for j in range(tsurf - 1, -1, -1):
        ri = ri * smath.safe_div(_remap0(z_rev[:, j]), _remap0(z_fwd[:, j]))
        sum_ri = sum_ri + ri * ri
    ri = jnp.ones((n,), jnp.float32)
    for j in range(s - 1, -1, -1):
        ri = ri * smath.safe_div(_remap0(y_rev[:, j]), _remap0(y_fwd[:, j]))
        sum_ri = sum_ri + ri * ri
    return 1.0 / (1.0 + sum_ri)


def mis_weight_arrays_dynamic(z_fwd, z_rev, y_fwd, y_rev, tsurf: int, s_var,
                              d_max: int):
    """As :func:`mis_weight_arrays` but with a PER-LANE light-prefix length
    ``s_var`` (traced int [N]) — needed by LVC connections where each lane
    picked a light vertex at a different depth. The light-side recursion
    walks slots d_max-1..0 with a mask activating at slot s_var-1, which
    reproduces the static loop for every lane's own s."""
    n = z_fwd.shape[0]
    sum_ri = jnp.zeros((n,), jnp.float32)
    ri = jnp.ones((n,), jnp.float32)
    for j in range(tsurf - 1, -1, -1):
        ri = ri * smath.safe_div(_remap0(z_rev[:, j]), _remap0(z_fwd[:, j]))
        sum_ri = sum_ri + ri * ri
    ri = jnp.ones((n,), jnp.float32)
    for j in range(d_max - 1, -1, -1):
        active = j <= s_var - 1
        ratio = smath.safe_div(_remap0(y_rev[:, j]), _remap0(y_fwd[:, j]))
        ri = jnp.where(active, ri * ratio, ri)
        sum_ri = sum_ri + jnp.where(active, ri * ri, 0.0)
    return 1.0 / (1.0 + sum_ri)


# ---------------------------------------------------------------------------
# full BDPT integrator
# ---------------------------------------------------------------------------

def _camera_dir_pdf_w(view, direction, width, height):
    """Solid-angle pdf of the pixel-uniform camera ray through ``direction``
    (= the pinhole importance We; see render/lighttrace.py)."""
    fwd = view.camera_to_world[:, 2]
    cos_c = jnp.maximum(smath.dot(direction, fwd), 1e-6)
    a_plane = view.projection.sensor_area
    return (width * height) / (a_plane * cos_c ** 3)


def _cam_factor(view, position, width, height):
    """We * cos_c / d^2 for a point connection to the pinhole."""
    p_cam = jnp.einsum(
        "ij,nj->ni", view.world_to_camera[:, :3], position
    ) + view.world_to_camera[:, 3]
    dist2 = smath.length_squared(p_cam)
    cos_c = jnp.abs(p_cam[..., 2]) / jnp.maximum(jnp.sqrt(dist2), 1e-20)
    a_plane = view.projection.sensor_area
    we = (width * height) / jnp.maximum(a_plane * cos_c ** 3, 1e-20)
    return smath.safe_div(we * cos_c, dist2)


def _batched_occlusion(trace_occluded, rays):
    """ONE occlusion wave over a list of (origin, wi, dist) ray sets
    (r5, BDPT attribution: the per-strategy occlusion waves were +754 ms
    of the 1400 ms paired BDPT sample — each tiny wave pays the tracer's
    full per-wave candidate prep). Occlusion is per-ray pure, so the
    batched booleans are identical to the per-wave ones; callers keep
    their accumulation order, so images are bit-identical."""
    o = jnp.concatenate([r[0] for r in rays], axis=0)
    w = jnp.concatenate([r[1] for r in rays], axis=0)
    t = jnp.concatenate([r[2] for r in rays], axis=0)
    occ = trace_occluded(o, w, t)
    outs = []
    off = 0
    for r in rays:
        m = r[2].shape[0]
        outs.append(lax.dynamic_slice_in_dim(occ, off, m))
        off += m
    return outs


def _connect_paired(scene, cfg, z, radiance, depth,
                    yc_pos, yc_ns, yc_ng, yc_wo, yc_beta, yc_fwd, yc_rev,
                    yc_mat, yc_uvs, yc_front, yc_valid,
                    bsdf_eval, trace_occluded, zslot_mat):
    """Deterministic all-pairs s>=2 x t>=2 connections (reference:
    connect_light_subpath, path.hlsli:801-822): every camera vertex
    connects to every vertex of ITS OWN paired light subpath. All
    depth^2 strategies' shadow rays ride ONE batched occlusion wave."""
    occ_rays = []
    terms = []
    for j in range(depth):  # camera endpoint z_{j+1}
        mat_z = zslot_mat(j)
        wo_z_local = smath.to_local(z.wo[:, j], z.ns[:, j])
        for k in range(1, depth + 1):  # light endpoint = combined slot k
            s = k + 1
            d_zy = yc_pos[:, k] - z.position[:, j]
            dist = smath.length(d_zy)
            wi = d_zy / jnp.maximum(dist, 1e-20)[:, None]
            cos_z = jnp.abs(smath.dot(wi, z.ns[:, j]))
            cos_y = jnp.abs(smath.dot(-wi, yc_ns[:, k]))
            g = smath.safe_div(cos_z * cos_y, dist * dist)
            ev_z = bsdf_eval(mat_z, wo_z_local, smath.to_local(wi, z.ns[:, j]))
            mat_y = _mat_at(
                scene, cfg, yc_mat[:, k], yc_uvs[:, k], yc_front[:, k]
            )
            wo_y_local = smath.to_local(yc_wo[:, k], yc_ns[:, k])
            ev_y = bsdf_eval(
                mat_y, wo_y_local, smath.to_local(-wi, yc_ns[:, k])
            )
            contrib = z.beta[:, j] * ev_z.f * ev_y.f * yc_beta[:, k] * g[:, None]
            cand = (
                z.valid[:, j] & yc_valid[:, k]
                & (jnp.max(contrib, axis=-1) > 0)
            )
            occ_rays.append((
                intersect.ray_offset(z.position[:, j], z.ng[:, j]), wi,
                jnp.where(cand, dist, 0.0),
            ))
            # overrides — camera side
            z_rev = z.pdf_rev.at[:, j].set(
                _to_area(
                    ev_y.pdf_fwd, yc_pos[:, k], z.position[:, j], z.ng[:, j]
                )
            )
            if j >= 1:
                z_rev = z_rev.at[:, j - 1].set(
                    _to_area(
                        ev_z.pdf_rev, z.position[:, j],
                        z.position[:, j - 1], z.ng[:, j - 1],
                    )
                )
            # overrides — light side
            y_rev = yc_rev.at[:, k].set(
                _to_area(
                    ev_z.pdf_fwd, z.position[:, j], yc_pos[:, k], yc_ng[:, k]
                )
            )
            y_rev = y_rev.at[:, k - 1].set(
                _to_area(
                    ev_y.pdf_rev, yc_pos[:, k],
                    yc_pos[:, k - 1], yc_ng[:, k - 1],
                )
            )
            w = mis_weight_arrays(
                z.pdf_fwd, z_rev, yc_fwd[:, : k + 1], y_rev[:, : k + 1],
                j + 1, s,
            )
            terms.append((cand, contrib * w[:, None]))
    occs = _batched_occlusion(trace_occluded, occ_rays)
    for (cand, term), occ in zip(terms, occs):
        radiance = radiance + jnp.where(
            (cand & ~occ)[:, None], term, 0.0
        )
    return radiance


def _connect_lvc(scene, cfg, st, z, radiance, depth,
                 yc_pos, yc_ns, yc_ng, yc_wo, yc_beta, yc_fwd, yc_rev,
                 yc_mat, yc_uvs, yc_front, yc_valid,
                 bsdf_eval, trace_occluded, zslot_mat,
                 prev_lvc=None, cam_pos=None):
    """Light-vertex-cache connections with reservoir resampling (reference:
    connect_lvc, path.hlsli:682-822): every camera vertex draws
    cfg.lvc_connections candidates uniformly from the POOLED cache of ALL
    lanes' light vertices, streams them through a reservoir weighted by the
    unshadowed contribution, and pays ONE shadow ray for the winner. The
    winner's RIS weight total/(R * p_hat) times the per-lane dynamic MIS
    weight keeps the estimator unbiased: cache cells are iid replicas of
    the paired connections, selected with probability 1/(N*depth)."""
    from stratum_tpu.core import reservoir as sres

    n = z.position.shape[0]
    d1 = depth + 1
    f_pdf = 21
    # one-gather cache rows: vertex fields + this lane's full pdf prefixes
    # and the PREVIOUS vertex (for the k-1 MIS override)
    prev_pos = jnp.concatenate(
        [jnp.zeros((n, 1, 3), jnp.float32), yc_pos[:, :-1]], axis=1
    )
    prev_ng = jnp.concatenate(
        [jnp.zeros((n, 1, 3), jnp.float32), yc_ng[:, :-1]], axis=1
    )
    cache = jnp.concatenate(
        [
            yc_pos, yc_ns, yc_ng, yc_wo, yc_beta,            # 0:15
            yc_mat[..., None].astype(jnp.float32),           # 15
            yc_uvs,                                          # 16:18
            yc_front[..., None].astype(jnp.float32),         # 18
            yc_valid[..., None].astype(jnp.float32),         # 19
            jnp.broadcast_to(
                jnp.arange(d1, dtype=jnp.float32)[None, :, None], (n, d1, 1)
            ),                                               # 20 = slot k
            jnp.broadcast_to(yc_fwd[:, None, :], (n, d1, d1)),
            jnp.broadcast_to(yc_rev[:, None, :], (n, d1, d1)),
            prev_pos, prev_ng,                               # +6
        ],
        axis=-1,
    ).reshape(n * d1, f_pdf + 2 * d1 + 6)

    n_cells = n * depth  # slots 1..depth participate (slot 0 is NEE's s=1)

    # cross-frame reservoir reuse (reference eLVCReservoirReuse,
    # path.hlsli:724-770): the previous frame's per-(lane, slot) winning
    # reservoirs, keyed by a world-space hash grid over their camera-vertex
    # positions, merge in as extra candidates re-targeted at this frame's
    # vertices. Standard ReSTIR temporal semantics (M-capped history).
    prev_grid = None
    if prev_lvc is not None:
        from stratum_tpu.ops import hashgrid as shg

        cell_sz = shg.cell_size_for(
            cam_pos, prev_lvc["pos"], 2.0e-3
        )
        prev_grid = shg.build_hashgrid(prev_lvc["pos"], cell_sz)
    new_pos = []
    new_packed = []
    lvc_rays = []
    lvc_terms = []

    for j in range(depth):
        mat_z = zslot_mat(j)
        z_j = z.position[:, j]
        ns_j = z.ns[:, j]
        ng_j = z.ng[:, j]
        wo_z_local = smath.to_local(z.wo[:, j], ns_j)

        def eval_cand(row, z_j=z_j, ns_j=ns_j, mat_z=mat_z,
                      wo_z_local=wo_z_local, j=j):
            """Re-target a cache row at this frame's camera vertex:
            unshadowed contribution + the four connection pdfs."""
            pos_y = row[:, 0:3]
            ns_y = row[:, 3:6]
            wo_y = row[:, 9:12]
            beta_y = row[:, 12:15]
            mat_row_y = row[:, 15].astype(jnp.int32)
            uv_y = row[:, 16:18]
            front_y = row[:, 18] > 0.5
            valid_y = row[:, 19] > 0.5
            d_zy = pos_y - z_j
            dist = smath.length(d_zy)
            wi = d_zy / jnp.maximum(dist, 1e-20)[:, None]
            cos_z = jnp.abs(smath.dot(wi, ns_j))
            cos_y = jnp.abs(smath.dot(-wi, ns_y))
            g = smath.safe_div(cos_z * cos_y, dist * dist)
            ev_z = bsdf_eval(mat_z, wo_z_local, smath.to_local(wi, ns_j))
            mat_y = _mat_at(scene, cfg, mat_row_y, uv_y, front_y)
            ev_y = bsdf_eval(
                mat_y, smath.to_local(wo_y, ns_y), smath.to_local(-wi, ns_y)
            )
            contrib = z.beta[:, j] * ev_z.f * ev_y.f * beta_y * g[:, None]
            contrib = jnp.where(
                (valid_y & z.valid[:, j])[:, None], contrib, 0.0
            )
            p_hat = smath.luminance(contrib)
            cand = dict(
                contrib=contrib, wi=wi, dist=dist,
                pdf4=jnp.stack(
                    [ev_y.pdf_fwd, ev_z.pdf_rev, ev_z.pdf_fwd, ev_y.pdf_rev],
                    axis=-1,
                ),
                row=row,
            )
            return cand, p_hat

        payload0 = dict(
            contrib=jnp.zeros((n, 3), jnp.float32),
            wi=jnp.zeros((n, 3), jnp.float32),
            dist=jnp.zeros((n,), jnp.float32),
            pdf4=jnp.zeros((n, 4), jnp.float32),
            row=jnp.zeros((n, cache.shape[1]), jnp.float32),
        )
        res = sres.init_reservoir(payload0, n)
        for _r in range(cfg.lvc_connections):
            u, st = srng.next_floats(st, 2)
            cell = jnp.minimum(
                (u[..., 0] * n_cells).astype(jnp.int32), n_cells - 1
            )
            lane = cell // depth
            slot = cell - lane * depth + 1  # 1..depth
            cand, p_hat = eval_cand(cache[lane * d1 + slot])
            # RIS weight p_hat / p_select. Each lane owes the SUM over its
            # own depth strategies; lanes are iid replicas, so drawing from
            # the pooled n*depth cells has per-lane selection mass
            # p_select = 1/depth (the lane dimension averages out).
            res = sres.update(res, cand, p_hat, p_hat * depth, u[..., 1])

        if prev_grid is not None:
            from stratum_tpu.ops import hashgrid as shg

            u, st = srng.next_floats(st, 2)
            ids, valid_q = shg.query(prev_grid, z_j, max_results=4)
            n_valid = jnp.sum(valid_q, axis=-1)
            pick = jnp.minimum(
                (u[..., 0] * n_valid).astype(jnp.int32),
                jnp.maximum(n_valid - 1, 0),
            )
            pid = jnp.take_along_axis(ids, pick[:, None], axis=-1)[:, 0]
            ok = (n_valid > 0) & (pid >= 0) & z.valid[:, j]
            prow = prev_lvc["packed"][jnp.maximum(pid, 0)]
            cw = cache.shape[1]
            cand, p_hat = eval_cand(prow[:, :cw])
            # merge with weight p_hat_here * W_prev * M_prev (the standard
            # re-target merge; see restir.merge_in). History M capped at
            # lvc_connections x LVC_HISTORY_LIMIT like ReSTIR temporal.
            w_prev = prow[:, cw]          # stored contribution weight W
            m_prev = jnp.minimum(
                prow[:, cw + 1], cfg.lvc_connections * LVC_HISTORY_LIMIT
            )
            m_prev = jnp.where(ok, m_prev, 0.0)
            w_o = p_hat * w_prev * m_prev
            total = res.total_weight + w_o
            keep = (u[..., 1] * jnp.maximum(total, 1e-20)) < w_o
            res = sres.Reservoir(
                sample=sres._tree_select(keep, cand, res.sample),
                target_pdf=jnp.where(keep, p_hat, res.target_pdf),
                total_weight=total,
                m=res.m + m_prev,
            )

        kept = res.sample
        if prev_lvc is not None or cam_pos is not None:
            # record this frame's winners for the next frame's grid: the
            # winner's cache row + [W, M] at this camera vertex's position
            w_now = smath.safe_div(
                res.total_weight,
                res.m * jnp.maximum(res.target_pdf, 1e-20),
            )
            new_pos.append(z_j)
            new_packed.append(
                jnp.concatenate(
                    [kept["row"], w_now[:, None], res.m[:, None]], axis=-1
                )
            )
        row = kept["row"]
        wi = kept["wi"]
        dist = kept["dist"]
        pos_y = row[:, 0:3]
        ng_y = row[:, 6:9]
        k_w = row[:, 20].astype(jnp.int32)
        y_fwd_row = row[:, f_pdf : f_pdf + d1]
        y_rev_row = row[:, f_pdf + d1 : f_pdf + 2 * d1]
        ppos = row[:, f_pdf + 2 * d1 : f_pdf + 2 * d1 + 3]
        png_ = row[:, f_pdf + 2 * d1 + 3 : f_pdf + 2 * d1 + 6]
        evy_fwd, evz_rev, evz_fwd, evy_rev = (
            kept["pdf4"][:, 0], kept["pdf4"][:, 1],
            kept["pdf4"][:, 2], kept["pdf4"][:, 3],
        )
        # overrides — camera side (same as the paired connection)
        z_rev = z.pdf_rev.at[:, j].set(
            _to_area(evy_fwd, pos_y, z_j, ng_j)
        )
        if j >= 1:
            z_rev = z_rev.at[:, j - 1].set(
                _to_area(
                    evz_rev, z_j, z.position[:, j - 1], z.ng[:, j - 1]
                )
            )
        # overrides — light side at the winner's (variable) slots k, k-1
        iota = jnp.arange(d1, dtype=jnp.int32)[None, :]
        ov_k = _to_area(evz_fwd, z_j, pos_y, ng_y)
        ov_km1 = _to_area(evy_rev, pos_y, ppos, png_)
        y_rev = jnp.where(iota == k_w[:, None], ov_k[:, None], y_rev_row)
        y_rev = jnp.where(
            iota == (k_w - 1)[:, None], ov_km1[:, None], y_rev
        )
        w_mis = mis_weight_arrays_dynamic(
            z.pdf_fwd, z_rev, y_fwd_row, y_rev, j + 1, k_w + 1, d1
        )
        w_ris = smath.safe_div(
            res.total_weight, res.m * jnp.maximum(res.target_pdf, 1e-20)
        )
        cand = res.target_pdf > 0
        lvc_rays.append((
            intersect.ray_offset(z_j, ng_j), wi,
            jnp.where(cand, dist, 0.0),
        ))
        lvc_terms.append(
            (cand, kept["contrib"] * (w_ris * w_mis)[:, None])
        )
    # winners' shadow rays for every camera depth in ONE occlusion wave
    # (see _batched_occlusion)
    for (cand, term), occ in zip(
        lvc_terms, _batched_occlusion(trace_occluded, lvc_rays)
    ):
        radiance = radiance + jnp.where(
            (cand & ~occ)[:, None], term, 0.0
        )
    new_lvc = None
    if new_pos:
        new_lvc = dict(
            pos=jnp.concatenate(new_pos, axis=0),
            packed=jnp.concatenate(new_packed, axis=0),
        )
    return radiance, st, new_lvc


def _stage_cut(n, num_pix, *deps):
    """Stage-cut return for tools/profile_bdpt_stages.py: a tiny reduction
    depending on everything computed so far, broadcast into the real output
    shapes, so XLA DCEs the rest of the estimator and wall-clock deltas
    attribute stages (same trick as ops/binned._binned_trace)."""
    acc = jnp.float32(0)
    for x in deps:
        if x is None:
            continue
        acc = acc + jnp.sum(x.astype(jnp.float32)) * jnp.float32(1e-30)
    return (
        jnp.zeros((n, 3), jnp.float32) + acc,
        jnp.zeros((num_pix, 3), jnp.float32),
    )


def trace_bdpt(scene: SceneData, view, cfg: RenderConfig, seed,
               px=None, py=None, lane0=0, num_light_paths=None,
               prev_lvc=None, want_lvc_state=False, stage=None):
    """One bidirectional sample per pixel. Returns (per-pixel radiance
    [N,3] from strategies with t>=2, splat image [num_pix,3] from t=1).

    ``px``/``py`` default to the full pixel grid; a sharded caller passes
    its tile plus ``lane0`` (global index of its first lane) so light-path
    RNG streams stay globally unique — the splat image is then psum'd over
    the mesh (parallel/mesh.py).

    ``stage`` (profiling only, tools/profile_bdpt_stages.py): cut the
    computation after "camwalk" / "lightwalk" / "s0" (emitter + env hits) /
    "s1" (NEE) / "connect" (s>=2 strategies) and return a DCE-proof
    reduction in the real output shapes."""
    bsdf_eval, _ = _bsdf_fns(cfg)
    trace_closest, trace_occluded = _trace_fns(scene, cfg)
    geo = scene.geo
    width, height = cfg.width, cfg.height
    num_pix = width * height
    depth = cfg.max_bounces + 1  # surface vertices per subpath

    # ---- camera subpath ---------------------------------------------------
    if px is None:
        px, py = scamera.pixel_grid(width, height)
    st = srng.rng_init(px, py, seed)
    u, st = srng.next_floats(st, 2)
    origin, direction = scamera.generate_rays(view, px, py, u, width, height)
    n = origin.shape[0]
    pdf_cam_w = _camera_dir_pdf_w(view, direction, width, height)
    z, z_esc, st, _ = random_walk(
        scene, cfg, st, origin, direction,
        jnp.ones((n, 3), jnp.float32), pdf_cam_w, depth,
    )
    if stage == "camwalk":
        return _stage_cut(
            n, num_pix, z.position, z.beta, z.pdf_fwd, z.pdf_rev,
            z.valid, z_esc.beta,
        )

    # ---- light subpath ----------------------------------------------------
    # the light-start pdf folds the env/area selection probability so every
    # strategy's MIS quantities use the true NEE sampling pdfs (the env
    # branch of NEE rides the pairwise-MIS env strategies below)
    p_area_sel = jnp.where(
        scene.lights.num_lights > 0, 1.0 - scene.lights.env_probability, 0.0
    )
    stl = srng.rng_init(
        lane0 + jnp.arange(n, dtype=jnp.uint32), _LIGHT_STREAM, seed
    )
    u, stl = srng.next_floats(stl, 3)
    ls = slights.sample_area_light(scene, u[..., 0], u[..., 1], u[..., 2])
    ls = ls._replace(pdf_area=ls.pdf_area * p_area_sel)
    u, stl = srng.next_floats(stl, 2)
    ldir_local = smath.sample_cos_hemisphere(u[..., 0], u[..., 1])
    ldir = smath.to_world(ldir_local, ls.normal)
    pdf_ldir_w = smath.cosine_hemisphere_pdfW(ldir_local[..., 2])
    has_light = scene.lights.num_lights > 0
    y0_beta = jnp.where(
        has_light,
        ls.radiance * smath.safe_div(1.0, ls.pdf_area)[..., None],
        0.0,
    )
    walk_beta0 = y0_beta * np.pi  # cos/pdf_w of cosine emission = pi
    lorigin = intersect.ray_offset(ls.position, ls.normal)
    yw, _y_esc, stl, y0_rev_from_walk = random_walk(
        scene, cfg, stl, lorigin, ldir, walk_beta0, pdf_ldir_w, depth,
    )
    # combined light arrays: slot 0 = y0 (on the light), slots 1.. = walk
    def prepend(arr0, arr):
        return jnp.concatenate([arr0[:, None], arr], axis=1)
    yc_pos = prepend(ls.position, yw.position)
    yc_ns = prepend(ls.normal, yw.ns)
    yc_ng = prepend(ls.normal, yw.ng)
    yc_wo = prepend(jnp.zeros((n, 3)), yw.wo)
    yc_beta = prepend(y0_beta, yw.beta)
    yc_fwd = prepend(ls.pdf_area, yw.pdf_fwd)
    yc_rev = prepend(y0_rev_from_walk, yw.pdf_rev)
    yc_mat = prepend(jnp.full((n,), -1, jnp.int32), yw.material)
    yc_uvs = prepend(jnp.zeros((n, 2)), yw.uv)
    yc_front = prepend(jnp.ones((n,), bool), yw.front)
    yc_valid = prepend(
        has_light & (ls.pdf_area > 0), yw.valid & has_light
    )

    if stage == "lightwalk":
        return _stage_cut(
            n, num_pix, z.position, z.beta, z.pdf_fwd, z.pdf_rev,
            z.valid, z_esc.beta, yc_pos, yc_beta, yc_fwd, yc_rev,
            yc_valid,
        )

    radiance = jnp.zeros((n, 3), jnp.float32)
    splat = jnp.zeros((num_pix, 3), jnp.float32)
    cam_pos = view.camera_to_world[:, 3]

    def zslot_mat(j):
        return _mat_at(scene, cfg, z.material[:, j], z.uv[:, j], z.front[:, j])

    def emission_dir_pdf_area(light_pos, light_ng, to_pos, to_ng):
        """Area pdf of the cosine emission sampler for direction
        light -> to_pos."""
        d = smath.normalize(to_pos - light_pos)
        pdf_w = smath.cosine_hemisphere_pdfW(smath.dot(d, light_ng))
        return _to_area(pdf_w, light_pos, to_pos, to_ng)

    zero_y = jnp.zeros((n, 1), jnp.float32)

    # ---- strategy s=0: camera path hits an emitter ------------------------
    for j in range(depth):
        on_light = z.valid[:, j] & (z.light_row[:, j] >= 0) & z.front[:, j]
        mat_j = zslot_mat(j)
        le = mat_j.emission
        z_rev = z.pdf_rev.at[:, j].set(
            slights.light_pdf_area(scene, z.light_row[:, j], z.light_row[:, j])
        )
        if j >= 1:
            z_rev = z_rev.at[:, j - 1].set(
                emission_dir_pdf_area(
                    z.position[:, j], z.ng[:, j],
                    z.position[:, j - 1], z.ng[:, j - 1],
                )
            )
        w = mis_weight_arrays(z.pdf_fwd, z_rev, zero_y, zero_y, j + 1, 0)
        radiance = radiance + jnp.where(
            on_light[:, None], z.beta[:, j] * le * w[:, None], 0.0
        )

    # ---- env strategies: escaped camera rays + env NEE ---------------------
    # The light subpath cannot start at infinity, so environment transport
    # rides exactly two estimators (BSDF escape / env NEE) and the pairwise
    # power heuristic partitions unity — the same weights the forward path
    # tracer uses (reference env handling in connect_light/eval_emission,
    # path.hlsli:310-366, 847-894).
    for j in range(depth):
        esc_m = z_esc.mask[:, j]
        esc_dir = z_esc.direction[:, j]
        le, env_pdf = slights.env_eval_and_pdf_w_mis(scene, esc_dir)
        if j == 0:
            w_env = jnp.ones((n,), jnp.float32)
        else:
            w_env = mis_power_heuristic(z_esc.pdf_w[:, j], env_pdf)
        radiance = radiance + jnp.where(
            esc_m[:, None], z_esc.beta[:, j] * le * w_env[:, None], 0.0
        )

    if stage == "s0":
        return radiance + _stage_cut(n, num_pix, yc_beta, yc_valid)[0], splat

    # ---- strategy s=1: NEE from every camera vertex ------------------------
    # env-vs-area split (sample_light); area samples use the full area-MIS
    # machinery, env samples the pairwise env MIS above. All depth NEE
    # shadow waves ride ONE batched occlusion trace (see
    # _batched_occlusion — the per-vertex waves were each paying the
    # tracer's full per-wave prep).
    s1_rays = []
    s1_terms = []
    for j in range(depth):
        u, st = srng.next_floats(st, 3)
        lsj = slights.sample_light(scene, u[..., 0], u[..., 1], u[..., 2])
        to_y = jnp.where(
            lsj.is_env[:, None], lsj.position,
            lsj.position - z.position[:, j],
        )
        dist = jnp.where(
            lsj.is_env, intersect.T_MAX * 0.5, smath.length(to_y)
        )
        wi = jnp.where(
            lsj.is_env[:, None], lsj.position,
            to_y / jnp.maximum(dist, 1e-20)[:, None],
        )
        cos_l = jnp.where(
            lsj.is_env, 1.0, jnp.maximum(smath.dot(-wi, lsj.normal), 0.0)
        )
        cos_z = jnp.abs(smath.dot(wi, z.ns[:, j]))
        mat_j = zslot_mat(j)
        wo_local = smath.to_local(z.wo[:, j], z.ns[:, j])
        wi_local = smath.to_local(wi, z.ns[:, j])
        ev = bsdf_eval(mat_j, wo_local, wi_local)
        # area branch: pdf_area -> contribution with geometry term
        g = smath.safe_div(cos_l * cos_z, dist * dist)
        contrib_area = (
            z.beta[:, j]
            * ev.f
            * lsj.radiance
            * smath.safe_div(g, lsj.pdf_area)[:, None]
        )
        # env branch: pdf is solid-angle already
        contrib_env = (
            z.beta[:, j]
            * ev.f
            * lsj.radiance
            * smath.safe_div(cos_z, lsj.pdf_area)[:, None]
        )
        contrib = jnp.where(lsj.is_env[:, None], contrib_env, contrib_area)
        cand = (
            z.valid[:, j] & (lsj.pdf_area > 0) & (cos_l > 0)
            & (jnp.max(contrib, axis=-1) > 0)
            & (lsj.is_env | has_light)
        )
        s1_rays.append((
            intersect.ray_offset(z.position[:, j], z.ng[:, j]), wi,
            jnp.where(cand, dist, 0.0),
        ))
        # overrides (area branch MIS)
        y_fwd1 = lsj.pdf_area[:, None]
        y_rev1 = _to_area(
            ev.pdf_fwd, z.position[:, j], lsj.position, lsj.normal
        )[:, None]
        z_rev = z.pdf_rev.at[:, j].set(
            emission_dir_pdf_area(
                lsj.position, lsj.normal, z.position[:, j], z.ng[:, j]
            )
        )
        if j >= 1:
            z_rev = z_rev.at[:, j - 1].set(
                _to_area(
                    ev.pdf_rev, z.position[:, j],
                    z.position[:, j - 1], z.ng[:, j - 1],
                )
            )
        w_area = mis_weight_arrays(z.pdf_fwd, z_rev, y_fwd1, y_rev1, j + 1, 1)
        w_env = mis_power_heuristic(lsj.pdf_area, ev.pdf_fwd)
        w = jnp.where(lsj.is_env, w_env, w_area)
        s1_terms.append((cand, contrib * w[:, None]))
    for (cand, term), occ in zip(
        s1_terms, _batched_occlusion(trace_occluded, s1_rays)
    ):
        radiance = radiance + jnp.where(
            (cand & ~occ)[:, None], term, 0.0
        )

    if stage == "s1":
        return radiance + _stage_cut(n, num_pix, yc_beta, yc_valid)[0], splat

    # ---- strategies s>=2, t>=2: subpath connections ------------------------
    new_lvc = None
    if cfg.lvc_connections > 0:
        radiance, st, new_lvc = _connect_lvc(
            scene, cfg, st, z, radiance, depth,
            yc_pos, yc_ns, yc_ng, yc_wo, yc_beta, yc_fwd, yc_rev,
            yc_mat, yc_uvs, yc_front, yc_valid,
            bsdf_eval, trace_occluded, zslot_mat,
            prev_lvc=prev_lvc,
            cam_pos=cam_pos if want_lvc_state else None,
        )
    else:
        radiance = _connect_paired(
            scene, cfg, z, radiance, depth,
            yc_pos, yc_ns, yc_ng, yc_wo, yc_beta, yc_fwd, yc_rev,
            yc_mat, yc_uvs, yc_front, yc_valid,
            bsdf_eval, trace_occluded, zslot_mat,
        )

    if stage == "connect":
        return radiance, splat

    # ---- strategy t=1: splat every light vertex to the camera --------------
    # (all depth+1 visibility waves batched into one occlusion trace)
    sp_rays = []
    sp_terms = []
    for k in range(depth + 1):  # combined slot k, s = k+1
        to_cam = cam_pos - yc_pos[:, k]
        dist = smath.length(to_cam)
        wi = to_cam / jnp.maximum(dist, 1e-20)[:, None]
        if k == 0:
            # the light sample itself: emission toward the camera
            f_y = jnp.ones((n, 3), jnp.float32)
            ok_dir = smath.dot(wi, yc_ns[:, 0]) > 0
            pdf_rev_prev = None
        else:
            mat_y = _mat_at(
                scene, cfg, yc_mat[:, k], yc_uvs[:, k], yc_front[:, k]
            )
            wo_y_local = smath.to_local(yc_wo[:, k], yc_ns[:, k])
            ev_y = bsdf_eval(
                mat_y, wo_y_local, smath.to_local(wi, yc_ns[:, k])
            )
            f_y = ev_y.f
            ok_dir = jnp.ones((n,), bool)
            pdf_rev_prev = ev_y.pdf_rev
        cosy = jnp.abs(smath.dot(wi, yc_ns[:, k]))
        cf = _cam_factor(view, yc_pos[:, k], width, height)
        contrib = yc_beta[:, k] * f_y * (
            cosy * cf / (num_light_paths if num_light_paths else n)
        )[:, None]
        pix, inside, _ = scamera.sensor_importance(
            view, yc_pos[:, k], width, height
        )
        cand = (
            yc_valid[:, k] & ok_dir & inside
            & (jnp.max(contrib, axis=-1) > 0)
        )
        sp_rays.append((
            intersect.ray_offset(yc_pos[:, k], yc_ng[:, k]), wi,
            jnp.where(cand, dist, 0.0),
        ))
        # overrides: the camera generates this vertex
        y_rev = yc_rev.at[:, k].set(
            _to_area(
                _camera_dir_pdf_w(view, -wi, width, height),
                cam_pos, yc_pos[:, k], yc_ng[:, k],
            )
        )
        if k >= 1:
            y_rev = y_rev.at[:, k - 1].set(
                _to_area(
                    pdf_rev_prev, yc_pos[:, k],
                    yc_pos[:, k - 1], yc_ng[:, k - 1],
                )
            )
        w = mis_weight_arrays(
            jnp.zeros((n, 1)), jnp.zeros((n, 1)),
            yc_fwd[:, : k + 1], y_rev[:, : k + 1], 0, k + 1,
        )
        pxi = jnp.clip(pix[..., 0].astype(jnp.int32), 0, width - 1)
        pyi = jnp.clip(pix[..., 1].astype(jnp.int32), 0, height - 1)
        idx = pyi * width + pxi
        sp_terms.append((cand, idx, contrib * w[:, None]))
    for (cand, idx, term), occ in zip(
        sp_terms, _batched_occlusion(trace_occluded, sp_rays)
    ):
        splat = splat.at[idx].add(
            jnp.where((cand & ~occ)[:, None], term, 0.0)
        )

    if want_lvc_state:
        return radiance, splat, new_lvc
    return radiance, splat


@partial(jax.jit, static_argnums=(2,))
def render_bdpt(scene: SceneData, view, cfg: RenderConfig, seed):
    rad, splat = trace_bdpt(scene, view, cfg, seed)
    img = rad.reshape(cfg.height, cfg.width, 3)
    return img + splat.reshape(cfg.height, cfg.width, 3)


# cross-frame LVC reservoir history M-cap, in multiples of
# cfg.lvc_connections (reference eLVCReservoirReuse; the cap bounds the
# temporal correlation exactly like ReSTIR's history_limit)
LVC_HISTORY_LIMIT = 8.0


@partial(jax.jit, static_argnums=(2,))
def render_bdpt_reuse(scene: SceneData, view, cfg: RenderConfig, seed,
                      prev_lvc=None):
    """One BDPT frame with cross-frame LVC reservoir reuse (reference
    eLVCReservoirReuse, path.hlsli:724-770): returns (image, lvc_state);
    feed the state back as ``prev_lvc`` on the next frame. Standard
    ReSTIR temporal semantics — the M-cap (LVC_HISTORY_LIMIT) bounds
    history correlation; a static scene + camera keeps the estimator
    consistent in the mean (test: mean vs no-reuse)."""
    rad, splat, new_lvc = trace_bdpt(
        scene, view, cfg, seed, prev_lvc=prev_lvc, want_lvc_state=True
    )
    img = rad.reshape(cfg.height, cfg.width, 3)
    return img + splat.reshape(cfg.height, cfg.width, 3), new_lvc


# pixels per chunk before the [N, depth] subpath arrays (~1 KB/pixel with
# connection temporaries) threaten a 16G chip; 1080p runs as 8 chunks.
# 1<<19 (4 chunks) measured OOM on the 16G v5e with lvc=4+presample — XLA
# keeps ~20 [chunk,24] HLO-temp copies of the shading gathers alive across
# the connection loop, so the budget is set by temps, not the subpath
# arrays themselves.
CHUNK_PIXELS = 1 << 18


@partial(jax.jit, static_argnums=(2, 7))
def _trace_bdpt_chunk(scene, view, cfg, seed, px, py, lane0, total):
    return trace_bdpt(
        scene, view, cfg, seed, px, py, lane0=lane0, num_light_paths=total
    )


def render_bdpt_chunked(
    scene: SceneData, view, cfg: RenderConfig, seed, chunks: int | None = None
):
    """BDPT with the pixel domain processed in chunks so the per-pixel
    subpath vertex arrays are [chunk, depth] instead of [num_pix, depth] —
    the memory-scaling answer to the reference's in-kernel 64B PathVertex
    streaming (Shaders/bdpt.h:107-156): 1080p BDPT(+LVC) fits a 16G chip
    (unchunked OOMs past ~500K pixels, STATUS r2). Each chunk traces its
    own slice of the light-path budget (globally unique RNG streams via
    lane0) and splats into the shared image; t=1 contributions normalize
    by the TOTAL light-path count, so the summed splat equals the
    unchunked estimator. With LVC, reservoirs resample within the chunk's
    pool — a pool-size (variance) change only, never a bias change."""
    num_pix = cfg.width * cfg.height
    if chunks is None:
        chunks = max(1, -(-num_pix // CHUNK_PIXELS))
    if num_pix % chunks:
        raise ValueError(f"{num_pix} pixels not divisible by {chunks} chunks")
    per = num_pix // chunks
    px, py = scamera.pixel_grid(cfg.width, cfg.height)
    img = jnp.zeros((num_pix, 3), jnp.float32)
    splat = jnp.zeros((num_pix, 3), jnp.float32)
    for c in range(chunks):
        sl = slice(c * per, (c + 1) * per)
        rad_c, splat_c = _trace_bdpt_chunk(
            scene, view, cfg, seed, px[sl], py[sl],
            jnp.asarray(c * per, jnp.uint32), num_pix,
        )
        img = img.at[sl].set(rad_c)
        splat = splat + splat_c
    return (img + splat).reshape(cfg.height, cfg.width, 3)


def render_bdpt_progressive(
    scene, view, cfg: RenderConfig, spp: int, seed0=0, chunks: int | None = None
):
    acc = jnp.zeros((cfg.height, cfg.width, 3), jnp.float32)
    num_pix = cfg.width * cfg.height
    auto = chunks if chunks is not None else -(-num_pix // CHUNK_PIXELS)
    for s in range(spp):
        if auto > 1:
            acc = acc + render_bdpt_chunked(scene, view, cfg, seed0 + s, auto)
        else:
            acc = acc + render_bdpt(scene, view, cfg, seed0 + s)
    return acc / spp
