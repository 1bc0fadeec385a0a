"""Next-event-estimation light sampling.

TPU-native analog of src/Shaders/common/light.hlsli: power-weighted light
selection (light.hlsli:24-35), uniform point-on-triangle sampling
(light.hlsli:122-140), environment-vs-emissive probability split
(light.hlsli:58-66), and the inverse pdf needed for MIS
(``point_on_light_pdf``, light.hlsli:154-174).
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from stratum_tpu.core import math as smath
from stratum_tpu.core.distribution import (
    dist1d_discrete_pdf,
    dist2d_pdf,
    sample_dist1d,
    sample_dist2d,
)
from stratum_tpu.scene.schema import SceneData


class LightSampleRecord(NamedTuple):
    """One NEE candidate per ray (reference: LightSampleRecord,
    light.hlsli:6-22). For env samples ``position`` holds a unit direction
    and ``is_env`` is True; ``pdf_area`` is then a solid-angle pdf."""

    position: jnp.ndarray  # [N,3] point on light (or env direction)
    normal: jnp.ndarray  # [N,3] light-side normal (toward scene)
    radiance: jnp.ndarray  # [N,3] Le
    pdf_area: jnp.ndarray  # [N] area pdf (or solid-angle pdf for env)
    is_env: jnp.ndarray  # bool [N]
    tri: jnp.ndarray  # i32 [N] triangle row sampled (-1 for env)


# environment sampler selection (trace-time global, like
# ops.pallas_trace.MT_MODE): "dist2d" = 2D CDF tables
# (environment.h:48-70); "mip" = hierarchical texel descent over the
# luminance*sin(theta) sum pyramid (sample_texel, bdpt_util.hlsli:85-180)
ENV_SAMPLER = "dist2d"


def _env_mip_meta(scene: SceneData):
    from stratum_tpu.scene.schema import env_mip_dims

    he, we = scene.env.emission.shape[:2]
    dims = env_mip_dims(he, we)  # finest first
    offs = []
    row = 0
    for h, w in dims:
        offs.append(row)
        row += h * w
    return dims, offs


def sample_environment_mip(scene: SceneData, u1, u2):
    """Hierarchical env texel sampling (reference sample_texel,
    bdpt_util.hlsli:85-180): descend the luminance*sin sum pyramid from the
    1x1 root, at each level picking one of the 2x2 children proportional
    to contained energy (4-way split of one uniform scalar, rescaled —
    the reference's rnd.x reuse). pdf is the product of child
    probabilities x finest texel count, over uv."""
    flat = scene.env.lum_mips
    dims, offs = _env_mip_meta(scene)
    n_levels = len(dims)
    u = jnp.asarray(u1)
    cy = jnp.zeros(u.shape, jnp.int32)
    cx = jnp.zeros(u.shape, jnp.int32)
    pdf = jnp.ones(u.shape, jnp.float32)
    for lvl in range(n_levels - 2, -1, -1):
        h, w = dims[lvl]
        ph, pw = dims[lvl + 1]
        cy = cy * (h // ph)
        cx = cx * (w // pw)
        ps = []
        for dy in (0, 1):
            for dx in (0, 1):
                yy = jnp.minimum(cy + dy, h - 1)
                xx = jnp.minimum(cx + dx, w - 1)
                v = flat[offs[lvl] + yy * w + xx]
                # clip out-of-range duplicates in degenerate dims
                ok = ((cy + dy) < h) & ((cx + dx) < w)
                ps.append(jnp.where(ok, v, 0.0))
        total = ps[0] + ps[1] + ps[2] + ps[3]
        degen = total < 1e-12
        probs = [
            jnp.where(degen, 0.25, p / jnp.maximum(total, 1e-12))
            for p in ps
        ]
        # 4-way select with rescale
        sel_y = jnp.zeros_like(cy)
        sel_x = jnp.zeros_like(cx)
        p_sel = probs[0]
        acc = probs[0]
        uu = u
        for j, (dy, dx) in enumerate(((0, 1), (1, 0), (1, 1))):
            take = uu >= acc
            sel_y = jnp.where(take, dy, sel_y)
            sel_x = jnp.where(take, dx, sel_x)
            p_sel = jnp.where(take, probs[j + 1], p_sel)
            acc = acc + probs[j + 1]
        # rescale u within the chosen bin: recompute the exact bin start
        # for the selected child (the reference's rnd.x reuse,
        # bdpt_util.hlsli:118-120)
        starts = [jnp.zeros_like(u)]
        for j in range(3):
            starts.append(starts[-1] + probs[j])
        bin_lo = starts[0]
        for j, (dy, dx) in enumerate(((0, 1), (1, 0), (1, 1))):
            hit_j = (sel_y == dy) & (sel_x == dx)
            bin_lo = jnp.where(hit_j, starts[j + 1], bin_lo)
        u = jnp.clip(
            (u - bin_lo) / jnp.maximum(p_sel, 1e-12), 0.0, 1.0 - 1e-7
        )
        cy = cy + sel_y
        cx = cx + sel_x
        pdf = pdf * jnp.maximum(p_sel, 1e-12)
    h0, w0 = dims[0]
    uv = jnp.stack(
        [
            (cx.astype(jnp.float32) + u) / w0,
            (cy.astype(jnp.float32) + jnp.asarray(u2)) / h0,
        ],
        axis=-1,
    )
    pdf_uv = pdf * (h0 * w0)
    direction = smath.spherical_uv_to_cartesian(uv)
    sin_theta = jnp.sqrt(
        jnp.maximum(1.0 - direction[..., 1] * direction[..., 1], 1e-12)
    )
    pdf_w = pdf_uv / (2.0 * jnp.pi * jnp.pi * sin_theta)
    radiance = eval_environment(scene, direction)
    return direction, radiance, pdf_w


def environment_mip_pdf_uv(scene: SceneData, uv):
    """pdf over uv of :func:`sample_environment_mip` (reference
    sample_texel_pdf, bdpt_util.hlsli:137-180): walk the same pyramid,
    multiplying the probability of the child containing uv."""
    flat = scene.env.lum_mips
    dims, offs = _env_mip_meta(scene)
    n_levels = len(dims)
    pdf = jnp.ones(uv.shape[:-1], jnp.float32)
    for lvl in range(n_levels - 2, -1, -1):
        h, w = dims[lvl]
        y = jnp.clip((uv[..., 1] * h).astype(jnp.int32), 0, h - 1)
        x = jnp.clip((uv[..., 0] * w).astype(jnp.int32), 0, w - 1)
        by = (y // 2) * 2
        bx = (x // 2) * 2
        ps = []
        for dy in (0, 1):
            for dx in (0, 1):
                yy = jnp.minimum(by + dy, h - 1)
                xx = jnp.minimum(bx + dx, w - 1)
                v = flat[offs[lvl] + yy * w + xx]
                ok = ((by + dy) < h) & ((bx + dx) < w)
                ps.append(jnp.where(ok, v, 0.0))
        total = ps[0] + ps[1] + ps[2] + ps[3]
        degen = total < 1e-12
        sel = (jnp.minimum(y - by, 1) << 1) | jnp.minimum(x - bx, 1)
        p_sel = jnp.where(
            sel == 0, ps[0],
            jnp.where(sel == 1, ps[1], jnp.where(sel == 2, ps[2], ps[3])),
        ) / jnp.maximum(total, 1e-12)
        p_sel = jnp.where(degen, 0.25, p_sel)
        pdf = pdf * jnp.maximum(p_sel, 1e-12)
    h0, w0 = dims[0]
    return pdf * (h0 * w0)


def sample_environment(scene: SceneData, u1, u2):
    """Importance-sample the environment map (reference:
    Environment::sample, environment.h:48-70): sample the 2D luminance*sin
    distribution (or the mip descent, per ENV_SAMPLER), map uv ->
    direction, pdf converted to solid angle."""
    if ENV_SAMPLER == "mip":
        return sample_environment_mip(scene, u1, u2)
    uv, pdf_uv = sample_dist2d(scene.env.dist, u1, u2)
    direction = smath.spherical_uv_to_cartesian(uv)
    sin_theta = jnp.sqrt(
        jnp.maximum(1.0 - direction[..., 1] * direction[..., 1], 1e-12)
    )
    pdf_w = pdf_uv / (2.0 * jnp.pi * jnp.pi * sin_theta)
    radiance = eval_environment(scene, direction)
    return direction, radiance, pdf_w


def eval_environment(scene: SceneData, direction):
    """Radiance of the environment in a direction (environment.h ``eval``).
    Nearest-texel fetch; a 1x1 map is a constant environment."""
    h, w = scene.env.emission.shape[:2]
    uv = smath.cartesian_to_spherical_uv(direction)
    x = jnp.clip((uv[..., 0] * w).astype(jnp.int32), 0, w - 1)
    y = jnp.clip((uv[..., 1] * h).astype(jnp.int32), 0, h - 1)
    return scene.env.emission[y, x]


def environment_pdf_w(scene: SceneData, direction):
    """Solid-angle pdf of :func:`sample_environment` for MIS
    (environment.h ``eval_pdf``; mip variant: sample_texel_pdf,
    bdpt_util.hlsli:137-180). Follows ENV_SAMPLER so MIS weights stay
    consistent with whichever sampler generated the NEE candidates."""
    uv = smath.cartesian_to_spherical_uv(direction)
    if ENV_SAMPLER == "mip":
        pdf_uv = environment_mip_pdf_uv(scene, uv)
    else:
        pdf_uv = dist2d_pdf(scene.env.dist, uv)
    sin_theta = jnp.sqrt(
        jnp.maximum(1.0 - direction[..., 1] * direction[..., 1], 1e-12)
    )
    return pdf_uv / (2.0 * jnp.pi * jnp.pi * sin_theta)


def _light_row(lights, li):
    """Light row by index: for few-light scenes (static row count <= 8)
    resolve with unrolled broadcast selects instead of a wave-width row
    gather — gathers cost ~7-11 ns/row at 2M lanes (the cornell NEE fetch
    measured 23 ms/bounce) while a select pass costs ~0.7 ms."""
    L = lights.packed.shape[0]
    if L <= 8:
        row = jnp.broadcast_to(
            lights.packed[0], li.shape + (lights.packed.shape[1],)
        )
        for j in range(1, L):
            row = jnp.where((li == j)[..., None], lights.packed[j], row)
        return row
    return lights.packed[li]


def sample_area_light(scene: SceneData, u_sel, u1, u2) -> LightSampleRecord:
    """Pick an emissive primitive from the power distribution and a uniform
    point on it: uniform-barycentric for triangles (light.hlsli:122-140),
    uniform-sphere for analytic sphere lights (the uniform branch of
    light.hlsli:58-121; the solid-angle cone sampler lives in
    ``sample_sphere_light_cone``). pdf_area = P(light) / area.

    One packed-row gather per sample (see GeometrySoA.packed_tri)."""
    lights = scene.lights
    li, _, _ = sample_dist1d(lights.power_dist, u_sel)
    nl = jnp.maximum(lights.num_lights, 1)
    li = jnp.minimum(li, nl - 1)
    row = _light_row(lights, li)
    p0 = row[..., 0:3]
    e1 = row[..., 3:6]
    e2 = row[..., 6:9]
    b1, b2 = smath.sample_uniform_triangle(u1, u2)
    pos = p0 + e1 * b1[..., None] + e2 * b2[..., None]
    n = smath.normalize(jnp.cross(e1, e2))
    # sphere-light rows (slot 15 flag): p0 = center, slot 3 = radius
    is_sphere = row[..., 15] > 0.5
    sdir = smath.sample_uniform_sphere(u1, u2)
    pos = jnp.where(
        is_sphere[..., None], p0 + sdir * row[..., 3:4], pos
    )
    n = jnp.where(is_sphere[..., None], sdir, n)
    sel_pdf = row[..., 13]
    area = jnp.maximum(row[..., 12], 1e-12)
    radiance = row[..., 9:12]
    return LightSampleRecord(
        position=pos,
        normal=n,
        radiance=radiance,
        pdf_area=sel_pdf / area,
        is_env=jnp.zeros(pos.shape[:-1], bool),
        tri=row[..., 14].astype(jnp.int32),
    )


def sample_light(scene: SceneData, u_sel, u1, u2) -> LightSampleRecord:
    """Environment-vs-area split by ``env_probability`` (light.hlsli:58-66):
    u_sel below the split samples the env (rescaled), else an area light."""
    p_env = scene.lights.env_probability
    pick_env = u_sel < p_env
    u_area = (u_sel - p_env) / jnp.maximum(1.0 - p_env, 1e-6)
    u_env = u_sel / jnp.maximum(p_env, 1e-6)
    area = sample_area_light(scene, jnp.clip(u_area, 0.0, 1.0 - 1e-7), u1, u2)
    env_dir, env_rad, env_pdf = sample_environment(scene, u_env % 1.0, u1)
    has_lights = scene.lights.num_lights > 0
    pick_env = pick_env | ~has_lights
    pe = jnp.where(has_lights, p_env, 1.0)
    return LightSampleRecord(
        position=jnp.where(pick_env[..., None], env_dir, area.position),
        normal=jnp.where(pick_env[..., None], -env_dir, area.normal),
        radiance=jnp.where(pick_env[..., None], env_rad, area.radiance),
        pdf_area=jnp.where(
            pick_env, env_pdf * pe, area.pdf_area * (1.0 - pe)
        ),
        is_env=pick_env,
        tri=jnp.where(pick_env, -1, area.tri),
    )


def light_pdf_area(scene: SceneData, tri, light_row):
    """pdf of having sampled triangle ``tri`` via NEE, in area measure,
    including the env/area split (for MIS against BSDF hits;
    light.hlsli:154-174)."""
    lights = scene.lights
    li = jnp.maximum(light_row, 0)
    row = _light_row(lights, li)  # one gather (or selects) for (area, sel_pdf)
    sel_pdf = row[..., 13]
    area = jnp.maximum(row[..., 12], 1e-12)
    p_area_branch = jnp.where(
        scene.lights.num_lights > 0, 1.0 - lights.env_probability, 0.0
    )
    return jnp.where(light_row >= 0, sel_pdf / area * p_area_branch, 0.0)


def env_pdf_w_mis(scene: SceneData, direction):
    """Solid-angle NEE pdf for an escaped ray direction, including the split
    probability (for MIS when a BSDF ray hits the environment)."""
    p_env = jnp.where(
        scene.lights.num_lights > 0, scene.lights.env_probability, 1.0
    )
    return environment_pdf_w(scene, direction) * p_env


def env_eval_and_pdf_w_mis(scene: SceneData, direction):
    """(radiance, NEE pdf) of an escaped direction through ONE gather of
    the fused [He, We, 4] emission+pdf table (Environment.emission_pdf) —
    the separate eval + pdf path costs three row gathers per bounce on
    every lane. Falls back to the split path under the mip sampler, whose
    pdf is not the dist2d joint."""
    if ENV_SAMPLER == "mip":
        return (
            eval_environment(scene, direction),
            env_pdf_w_mis(scene, direction),
        )
    h, w = scene.env.emission.shape[:2]
    uv = smath.cartesian_to_spherical_uv(direction)
    x = jnp.clip((uv[..., 0] * w).astype(jnp.int32), 0, w - 1)
    y = jnp.clip((uv[..., 1] * h).astype(jnp.int32), 0, h - 1)
    row = scene.env.emission_pdf[y, x]  # the only gather
    sin_theta = jnp.sqrt(
        jnp.maximum(1.0 - direction[..., 1] * direction[..., 1], 1e-12)
    )
    pdf_w = row[..., 3] / (2.0 * jnp.pi * jnp.pi * sin_theta)
    p_env = jnp.where(
        scene.lights.num_lights > 0, scene.lights.env_probability, 1.0
    )
    return row[..., 0:3], pdf_w * p_env


def sample_sphere_light_cone(scene: SceneData, ref_pos, u_sel, u1, u2):
    """Receiver-aware NEE sampling: sphere lights sample the subtended
    SOLID-ANGLE CONE (with the reference's small-angle fallback,
    light.hlsli:58-121) instead of uniform area — the variance win analytic
    sphere lights exist for. Triangle/env rows fall back to the regular
    samplers.

    Returns (LightSampleRecord, pdf_is_w [N] bool): where pdf_is_w is True,
    ``pdf_area`` already holds the solid-angle pdf of the sampled direction
    (like env records).
    """
    base = sample_light(scene, u_sel, u1, u2)
    lights = scene.lights
    # reconstruct which row was picked to test the sphere flag — mirrors
    # sample_light's area-branch remap exactly (raw split probability)
    p_env_raw = lights.env_probability
    u_area = jnp.clip(
        (u_sel - p_env_raw) / jnp.maximum(1.0 - p_env_raw, 1e-6),
        0.0, 1.0 - 1e-7,
    )
    p_env = jnp.where(lights.num_lights > 0, lights.env_probability, 1.0)
    li, _, _ = sample_dist1d(lights.power_dist, u_area)
    li = jnp.minimum(li, jnp.maximum(lights.num_lights, 1) - 1)
    row = lights.packed[li]
    is_sphere = (row[..., 15] > 0.5) & ~base.is_env
    center = row[..., 0:3]
    radius = row[..., 3]
    sel_pdf = row[..., 13]

    to_c = center - ref_pos
    d2 = smath.length_squared(to_c)
    d = jnp.sqrt(jnp.maximum(d2, 1e-20))
    inside = d2 <= radius * radius * 1.0001
    sin2_max = jnp.clip(radius * radius / jnp.maximum(d2, 1e-20), 0.0, 1.0)
    cos_max = smath.safe_sqrt(1.0 - sin2_max)
    # sample a direction in the cone about to_c
    cos_t = 1.0 - u1 * (1.0 - cos_max)
    sin_t = smath.safe_sqrt(1.0 - cos_t * cos_t)
    phi = smath.TWO_PI * u2
    axis = to_c / d[..., None]
    local = jnp.stack(
        [sin_t * jnp.cos(phi), sin_t * jnp.sin(phi), cos_t], axis=-1
    )
    wi = smath.to_world(local, axis)
    # hit point on the sphere along wi (project to the near intersection)
    b = smath.dot(-to_c, wi)
    disc = jnp.maximum(b * b - (d2 - radius * radius), 0.0)
    t_hit = -b - jnp.sqrt(disc)
    pos = ref_pos + wi * t_hit[..., None]
    nrm = smath.normalize(pos - center)
    pdf_w = sel_pdf / jnp.maximum(
        smath.TWO_PI * (1.0 - cos_max), 1e-9
    ) * jnp.where(lights.num_lights > 0, 1.0 - p_env, 0.0)
    use_cone = is_sphere & ~inside & (cos_max < 1.0 - 1e-7)
    rec = LightSampleRecord(
        position=jnp.where(use_cone[..., None], pos, base.position),
        normal=jnp.where(use_cone[..., None], nrm, base.normal),
        radiance=base.radiance,
        pdf_area=jnp.where(use_cone, pdf_w, base.pdf_area),
        is_env=base.is_env,
        tri=base.tri,
    )
    return rec, use_cone


def sphere_cone_pdf_w(scene: SceneData, ref_pos, light_row):
    """Solid-angle pdf of :func:`sample_sphere_light_cone` having produced
    a direction that hits sphere light ``light_row`` from ``ref_pos`` — the
    MIS counterpart used when a BSDF ray hits a sphere emitter
    (point_on_light_pdf, light.hlsli:154-174). Returns (pdf_w, is_sphere)."""
    lights = scene.lights
    li = jnp.maximum(light_row, 0)
    row = lights.packed[li]
    is_sphere = (row[..., 15] > 0.5) & (light_row >= 0)
    center = row[..., 0:3]
    radius = row[..., 3]
    sel_pdf = row[..., 13]
    d2 = smath.length_squared(center - ref_pos)
    sin2_max = jnp.clip(radius * radius / jnp.maximum(d2, 1e-20), 0.0, 1.0)
    cos_max = smath.safe_sqrt(1.0 - sin2_max)
    p_env = jnp.where(lights.num_lights > 0, lights.env_probability, 1.0)
    pdf_w = sel_pdf / jnp.maximum(
        smath.TWO_PI * (1.0 - cos_max), 1e-9
    ) * jnp.where(lights.num_lights > 0, 1.0 - p_env, 0.0)
    usable = is_sphere & (d2 > radius * radius * 1.0001) & (
        cos_max < 1.0 - 1e-7
    )
    return pdf_w, usable
