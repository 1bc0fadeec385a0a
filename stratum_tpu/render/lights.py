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


def sample_environment(scene: SceneData, u1, u2):
    """Importance-sample the environment map (reference:
    Environment::sample, environment.h:48-70): sample the 2D luminance*sin
    distribution, map uv -> direction, pdf converted to solid angle."""
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
    (environment.h ``eval_pdf``)."""
    uv = smath.cartesian_to_spherical_uv(direction)
    pdf_uv = dist2d_pdf(scene.env.dist, uv)
    sin_theta = jnp.sqrt(
        jnp.maximum(1.0 - direction[..., 1] * direction[..., 1], 1e-12)
    )
    return pdf_uv / (2.0 * jnp.pi * jnp.pi * sin_theta)


def sample_area_light(scene: SceneData, u_sel, u1, u2) -> LightSampleRecord:
    """Pick an emissive triangle from the power distribution and a uniform
    point on it. pdf_area = P(light) / area (light.hlsli:122-140).

    One packed-row gather per sample (see GeometrySoA.packed_tri)."""
    lights = scene.lights
    li, _, _ = sample_dist1d(lights.power_dist, u_sel)
    nl = jnp.maximum(lights.num_lights, 1)
    li = jnp.minimum(li, nl - 1)
    row = lights.packed[li]  # the only gather
    p0 = row[..., 0:3]
    e1 = row[..., 3:6]
    e2 = row[..., 6:9]
    b1, b2 = smath.sample_uniform_triangle(u1, u2)
    pos = p0 + e1 * b1[..., None] + e2 * b2[..., None]
    n = smath.normalize(jnp.cross(e1, e2))
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
    row = lights.packed[li]  # one gather for (area, sel_pdf)
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
