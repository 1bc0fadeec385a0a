"""Hierarchical env texel sampling (reference sample_texel /
sample_texel_pdf, Shaders/common/bdpt_util.hlsli:85-180): the mip-descent
sampler must agree with its own pdf, integrate to 1 over solid angle,
concentrate samples where the energy is, and estimate the same env
integral as the 2D-CDF sampler (environment.h:48-70)."""

from types import SimpleNamespace

import jax.numpy as jnp
import numpy as np
import pytest

from stratum_tpu.core.distribution import build_env_dist2d
from stratum_tpu.core import math as smath
from stratum_tpu.render import lights
from stratum_tpu.scene import schema


def _env_scene(img: np.ndarray) -> SimpleNamespace:
    lum = img @ np.asarray([0.2126, 0.7152, 0.0722], np.float32)
    env = schema.make_environment(
        emission=img,
        dist=build_env_dist2d(lum),
        lum_mips=schema.build_env_mips(lum),
    )
    return SimpleNamespace(env=env)


def _random_env(rng, h=8, w=16):
    img = rng.random((h, w, 3)).astype(np.float32) ** 2
    img[2, 5] *= 50.0  # a hot texel so the distribution is non-trivial
    return img


def test_mip_sample_pdf_self_consistent(rng_np):
    scene = _env_scene(_random_env(rng_np))
    n = 20000
    u1 = jnp.asarray(rng_np.random(n), jnp.float32)
    u2 = jnp.asarray(rng_np.random(n), jnp.float32)
    d, rad, pdf = lights.sample_environment_mip(scene, u1, u2)
    uv = smath.cartesian_to_spherical_uv(d)
    pdf_uv = lights.environment_mip_pdf_uv(scene, uv)
    sin_t = jnp.sqrt(jnp.maximum(1 - d[:, 1] ** 2, 1e-12))
    pdf2 = pdf_uv / (2 * jnp.pi * jnp.pi * sin_t)
    np.testing.assert_allclose(
        np.asarray(pdf), np.asarray(pdf2), rtol=1e-3, atol=1e-6
    )


def test_mip_pdf_integrates_to_one(rng_np):
    scene = _env_scene(_random_env(rng_np))
    n = 200000
    # uniform directions on the sphere
    z = 1 - 2 * rng_np.random(n)
    phi = 2 * np.pi * rng_np.random(n)
    r = np.sqrt(np.maximum(1 - z * z, 0))
    d = jnp.asarray(
        np.stack([r * np.cos(phi), z, r * np.sin(phi)], -1), jnp.float32
    )
    uv = smath.cartesian_to_spherical_uv(d)
    pdf_uv = lights.environment_mip_pdf_uv(scene, uv)
    sin_t = jnp.sqrt(jnp.maximum(1 - d[:, 1] ** 2, 1e-12))
    pdf_w = pdf_uv / (2 * jnp.pi * jnp.pi * sin_t)
    integral = float(jnp.mean(pdf_w)) * 4 * np.pi
    assert integral == pytest.approx(1.0, rel=0.02)


def test_mip_concentrates_on_hot_texel(rng_np):
    img = np.full((8, 16, 3), 0.01, np.float32)
    img[3, 7] = 100.0  # one texel carries ~99% of the energy
    scene = _env_scene(img)
    n = 4000
    u1 = jnp.asarray(rng_np.random(n), jnp.float32)
    u2 = jnp.asarray(rng_np.random(n), jnp.float32)
    d, rad, pdf = lights.sample_environment_mip(scene, u1, u2)
    # directions landing in the hot texel
    uv0 = np.asarray(smath.cartesian_to_spherical_uv(d))
    x = (uv0[:, 0] * 16).astype(np.int32)
    y = (uv0[:, 1] * 8).astype(np.int32)
    frac_hot = np.mean((x == 7) & (y == 3))
    assert frac_hot > 0.85


def test_mip_estimator_matches_dist2d(rng_np):
    """Both samplers are unbiased estimators of the same env integral:
    E[luminance(d)/pdf(d)] must agree (and equal the true integral)."""
    img = _random_env(rng_np)
    scene = _env_scene(img)
    n = 200000
    u1 = jnp.asarray(rng_np.random(n), jnp.float32)
    u2 = jnp.asarray(rng_np.random(n), jnp.float32)

    d1, rad1, pdf1 = lights.sample_environment_mip(scene, u1, u2)
    lum1 = rad1 @ jnp.asarray([0.2126, 0.7152, 0.0722])
    est_mip = float(jnp.mean(lum1 / jnp.maximum(pdf1, 1e-12)))

    old = lights.ENV_SAMPLER
    try:
        lights.ENV_SAMPLER = "dist2d"
        d2, rad2, pdf2 = lights.sample_environment(scene, u1, u2)
    finally:
        lights.ENV_SAMPLER = old
    lum2 = rad2 @ jnp.asarray([0.2126, 0.7152, 0.0722])
    est_cdf = float(jnp.mean(lum2 / jnp.maximum(pdf2, 1e-12)))

    # true integral: sum over texels of lum * solid angle of the texel
    h, w = img.shape[:2]
    lum = img @ np.asarray([0.2126, 0.7152, 0.0722], np.float32)
    theta_e = np.pi * np.arange(h + 1) / h
    dmu = (np.cos(theta_e[:-1]) - np.cos(theta_e[1:])) * (2 * np.pi / w)
    truth = float((lum * dmu[:, None]).sum())

    assert est_mip == pytest.approx(truth, rel=0.05)
    assert est_cdf == pytest.approx(truth, rel=0.05)
    assert est_mip == pytest.approx(est_cdf, rel=0.05)


def test_mip_switch_in_sample_light(rng_np):
    """sample_environment honors ENV_SAMPLER and environment_pdf_w follows,
    so MIS weights stay consistent with the active sampler."""
    scene = _env_scene(_random_env(rng_np))
    n = 2000
    u1 = jnp.asarray(rng_np.random(n), jnp.float32)
    u2 = jnp.asarray(rng_np.random(n), jnp.float32)
    old = lights.ENV_SAMPLER
    try:
        lights.ENV_SAMPLER = "mip"
        d, rad, pdf = lights.sample_environment(scene, u1, u2)
        pdf_eval = lights.environment_pdf_w(scene, d)
    finally:
        lights.ENV_SAMPLER = old
    np.testing.assert_allclose(
        np.asarray(pdf), np.asarray(pdf_eval), rtol=1e-3, atol=1e-6
    )


def test_env_fused_eval_pdf_matches_split(rng_np):
    """env_eval_and_pdf_w_mis (one [H,W,4] gather) must agree exactly with
    the separate eval_environment + env_pdf_w_mis path."""
    scene = _env_scene(_random_env(rng_np))
    scene.lights = SimpleNamespace(num_lights=0, env_probability=1.0)
    n = 4096
    d = rng_np.standard_normal((n, 3)).astype(np.float32)
    d = jnp.asarray(d / np.maximum(np.linalg.norm(d, axis=-1, keepdims=True), 1e-9))
    le_f, pdf_f = lights.env_eval_and_pdf_w_mis(scene, d)
    le_s = lights.eval_environment(scene, d)
    pdf_s = lights.env_pdf_w_mis(scene, d)
    np.testing.assert_array_equal(np.asarray(le_f), np.asarray(le_s))
    np.testing.assert_allclose(
        np.asarray(pdf_f), np.asarray(pdf_s), rtol=1e-6, atol=1e-9
    )
