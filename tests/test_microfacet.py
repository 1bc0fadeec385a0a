import jax.numpy as jnp
import numpy as np
import pytest

from stratum_tpu.core import math as smath
from stratum_tpu.core import microfacet as mf


def test_schlick_limits():
    assert float(mf.schlick_fresnel(0.04, 1.0)) == pytest.approx(0.04)
    assert float(mf.schlick_fresnel(0.04, 0.0)) == pytest.approx(1.0)


def test_fresnel_dielectric_normal_incidence():
    eta = 1.5
    f = float(mf.fresnel_dielectric(jnp.asarray(1.0), jnp.asarray(eta)))
    expect = ((eta - 1) / (eta + 1)) ** 2
    assert f == pytest.approx(expect, abs=1e-5)


def test_fresnel_dielectric_tir():
    # from inside glass (eta = 1/1.5) beyond the critical angle
    cos_c = np.sqrt(1 - (1 / 1.5) ** -2) if False else None
    f = float(mf.fresnel_dielectric(jnp.asarray(0.1), jnp.asarray(1 / 1.5)))
    assert f == pytest.approx(1.0)


def test_gtr2_ndf_integrates_to_one(rng_np):
    """Integral of D(h) cos(h) over the hemisphere = 1."""
    for rough in [0.3, 0.6, 1.0]:
        ax, ay = mf.ggx_alpha(jnp.asarray(rough), jnp.asarray(0.0))
        u = rng_np.random((400000, 2)).astype(np.float32)
        d = np.array(smath.sample_uniform_sphere(jnp.asarray(u[:, 0]), jnp.asarray(u[:, 1])))
        d[:, 2] = np.abs(d[:, 2])
        h = jnp.asarray(d)
        D = np.asarray(mf.gtr2_ndf(h, ax, ay))
        integral = np.mean(D * d[:, 2]) * 2 * np.pi
        assert integral == pytest.approx(1.0, abs=0.05), rough


def test_vndf_pdf_integrates_to_one(rng_np):
    """Integral over half-vectors of the VNDF pdf = 1 for a fixed wo."""
    wo = jnp.asarray([0.3, -0.2, 0.93])
    wo = smath.normalize(wo)
    ax, ay = mf.ggx_alpha(jnp.asarray(0.5), jnp.asarray(0.3))
    u = rng_np.random((400000, 2)).astype(np.float32)
    d = np.array(smath.sample_uniform_sphere(jnp.asarray(u[:, 0]), jnp.asarray(u[:, 1])))
    d[:, 2] = np.abs(d[:, 2])
    h = jnp.asarray(d)
    pdf = np.asarray(mf.vndf_pdf(jnp.broadcast_to(wo, h.shape), h, ax, ay))
    integral = np.mean(pdf) * 2 * np.pi
    assert integral == pytest.approx(1.0, abs=0.05)


def test_vndf_sampling_matches_pdf(rng_np):
    """Chi^2-style check: histogram of sampled half-vectors vs pdf."""
    wo = smath.normalize(jnp.asarray([0.4, 0.1, 0.9]))
    ax, ay = mf.ggx_alpha(jnp.asarray(0.6), jnp.asarray(0.0))
    n = 200000
    u = rng_np.random((n, 2)).astype(np.float32)
    h = np.asarray(
        mf.sample_vndf(jnp.broadcast_to(wo, (n, 3)), ax, ay, jnp.asarray(u[:, 0]), jnp.asarray(u[:, 1]))
    )
    assert np.all(h[:, 2] >= 0)
    # mean cos of sampled h under vndf equals integral of pdf*cos: compare MC both ways
    mean_cos_sampled = h[:, 2].mean()
    d = np.array(smath.sample_uniform_sphere(*[jnp.asarray(c) for c in rng_np.random((2, 400000), dtype=np.float64).astype(np.float32)]))
    d[:, 2] = np.abs(d[:, 2])
    pdf = np.asarray(mf.vndf_pdf(jnp.broadcast_to(wo, d.shape), jnp.asarray(d), ax, ay))
    mean_cos_pdf = np.mean(pdf * d[:, 2]) * 2 * np.pi
    assert mean_cos_sampled == pytest.approx(mean_cos_pdf, abs=0.02)


def test_smith_g1_limits():
    ax, ay = mf.ggx_alpha(jnp.asarray(0.001), jnp.asarray(0.0))
    g = float(mf.smith_g1(jnp.asarray([0.0, 0.0, 1.0]), ax, ay))
    assert g == pytest.approx(1.0, abs=1e-3)


def test_reflect_refract():
    n = jnp.asarray([0.0, 0.0, 1.0])
    w = smath.normalize(jnp.asarray([1.0, 0.0, 1.0]))
    r = mf.reflect(w, n)
    np.testing.assert_allclose(np.asarray(r), np.asarray(smath.normalize(jnp.asarray([-1.0, 0.0, 1.0]))), atol=1e-6)
    wt, valid = mf.refract(w, n, jnp.asarray(1.5))
    assert bool(valid)
    # Snell: sin_t = sin_i / eta
    sin_i = np.sqrt(1 - float(smath.dot(w, n)) ** 2)
    sin_t = np.sqrt(1 - float(smath.dot(wt, -n)) ** 2)
    assert sin_t == pytest.approx(sin_i / 1.5, abs=1e-5)


def test_gtr1_sampling_matches_ndf(rng_np):
    alpha = jnp.asarray(0.3)
    n = 200000
    u = rng_np.random((n, 2)).astype(np.float32)
    h = np.asarray(mf.sample_gtr1(alpha, jnp.asarray(u[:, 0]), jnp.asarray(u[:, 1])))
    mean_cos_sampled = h[:, 2].mean()
    # MC estimate of E[cos] under D_gtr1(h)cos(h) measure
    d = np.array(smath.sample_uniform_sphere(*[jnp.asarray(c) for c in rng_np.random((2, 400000)).astype(np.float32)]))
    d[:, 2] = np.abs(d[:, 2])
    pdf = np.asarray(mf.gtr1_ndf(jnp.asarray(d[:, 2]), alpha)) * d[:, 2]
    norm = np.mean(pdf) * 2 * np.pi
    mean_cos_pdf = np.mean(pdf * d[:, 2]) * 2 * np.pi / norm
    assert norm == pytest.approx(1.0, abs=0.05)
    assert mean_cos_sampled == pytest.approx(mean_cos_pdf, abs=0.02)
