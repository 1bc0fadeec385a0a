import jax.numpy as jnp
import numpy as np
import pytest

from stratum_tpu.core import distribution as dist


def test_dist1d_build_normalization():
    d = dist.build_dist1d(np.asarray([1.0, 2.0, 3.0, 2.0], np.float32))
    cdf = np.asarray(d.cdf)
    assert cdf[0] == 0.0 and cdf[-1] == pytest.approx(1.0)
    # mean of pdf over [0,1) domain is 1
    assert np.mean(np.asarray(d.pdf)) == pytest.approx(1.0, abs=1e-5)


def test_dist1d_sampling_histogram(rng_np):
    w = np.asarray([1.0, 0.0, 4.0, 2.0, 1.0], np.float32)
    d = dist.build_dist1d(w)
    u = jnp.asarray(rng_np.random(200000), jnp.float32)
    idx, du, pdf = dist.sample_dist1d(d, u)
    counts = np.bincount(np.asarray(idx), minlength=5) / len(u)
    np.testing.assert_allclose(counts, w / w.sum(), atol=0.005)
    # remapped u stays uniform
    assert abs(float(jnp.mean(du)) - 0.5) < 0.01
    # returned pdf matches cell density
    np.testing.assert_allclose(
        np.asarray(pdf), (w / w.sum() * len(w))[np.asarray(idx)], atol=1e-5
    )


def test_dist1d_zero_weights_uniform():
    d = dist.build_dist1d(np.zeros(8, np.float32))
    u = jnp.linspace(0, 0.999, 1000)
    idx, _, pdf = dist.sample_dist1d(d, u)
    counts = np.bincount(np.asarray(idx), minlength=8)
    assert counts.min() > 100
    np.testing.assert_allclose(np.asarray(pdf), 1.0, atol=1e-5)


def test_dist2d_sampling_matches_weights(rng_np):
    w = rng_np.random((8, 16)).astype(np.float32) ** 2
    d = dist.build_dist2d(w)
    n = 400000
    u1 = jnp.asarray(rng_np.random(n), jnp.float32)
    u2 = jnp.asarray(rng_np.random(n), jnp.float32)
    uv, pdf = dist.sample_dist2d(d, u1, u2)
    uv = np.asarray(uv)
    col = np.clip((uv[:, 0] * 16).astype(int), 0, 15)
    row = np.clip((uv[:, 1] * 8).astype(int), 0, 7)
    hist = np.zeros((8, 16))
    np.add.at(hist, (row, col), 1.0)
    hist /= n
    np.testing.assert_allclose(hist, w / w.sum(), atol=0.004)
    # pdf consistency: sampled pdf equals dist2d_pdf at uv
    pdf2 = dist.dist2d_pdf(d, jnp.asarray(uv))
    np.testing.assert_allclose(np.asarray(pdf), np.asarray(pdf2), rtol=1e-4)


def test_dist2d_pdf_integrates_to_one(rng_np):
    w = rng_np.random((4, 4)).astype(np.float32)
    d = dist.build_dist2d(w)
    uv = jnp.asarray(rng_np.random((100000, 2)), jnp.float32)
    integral = float(jnp.mean(dist.dist2d_pdf(d, uv)))
    assert integral == pytest.approx(1.0, abs=0.02)


def test_env_dist_sin_weighting():
    lum = np.ones((64, 8), np.float32)
    d = dist.build_env_dist2d(lum)
    # marginal pdf should follow sin(theta): peak at the equator row
    pdf = np.asarray(d.marginal.pdf)
    assert pdf[32] > pdf[2]
    assert pdf[32] > pdf[-2]
