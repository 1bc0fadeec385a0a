import jax.numpy as jnp
import numpy as np
import pytest

from stratum_tpu.core import math as smath


def test_normalize_unit_and_zero():
    v = jnp.asarray([[3.0, 4.0, 0.0], [0.0, 0.0, 0.0]])
    n = smath.normalize(v)
    np.testing.assert_allclose(np.asarray(n[0]), [0.6, 0.8, 0.0], atol=1e-6)
    assert np.all(np.isfinite(np.asarray(n[1])))


def test_luminance_white():
    assert float(smath.luminance(jnp.ones(3))) == pytest.approx(1.0, abs=1e-5)


def test_srgb_roundtrip():
    c = jnp.linspace(0.0, 1.0, 64)
    rt = smath.srgb_to_linear(smath.linear_to_srgb(c))
    np.testing.assert_allclose(np.asarray(rt), np.asarray(c), atol=1e-5)


def test_make_orthonormal_frames(rng_np):
    n = rng_np.normal(size=(1000, 3)).astype(np.float32)
    n /= np.linalg.norm(n, axis=-1, keepdims=True)
    t, b = smath.make_orthonormal(jnp.asarray(n))
    t, b = np.asarray(t), np.asarray(b)
    np.testing.assert_allclose(np.abs(np.sum(t * n, -1)), 0, atol=1e-5)
    np.testing.assert_allclose(np.abs(np.sum(b * n, -1)), 0, atol=1e-5)
    np.testing.assert_allclose(np.abs(np.sum(t * b, -1)), 0, atol=1e-5)
    np.testing.assert_allclose(np.linalg.norm(t, axis=-1), 1, atol=1e-5)
    # right-handed: t x b = n
    np.testing.assert_allclose(np.cross(t, b), n, atol=1e-5)


def test_to_local_to_world_roundtrip(rng_np):
    n = rng_np.normal(size=(100, 3)).astype(np.float32)
    n /= np.linalg.norm(n, axis=-1, keepdims=True)
    v = rng_np.normal(size=(100, 3)).astype(np.float32)
    rt = smath.to_world(smath.to_local(jnp.asarray(v), jnp.asarray(n)), jnp.asarray(n))
    np.testing.assert_allclose(np.asarray(rt), v, atol=1e-4)
    # n maps to +z
    loc = np.asarray(smath.to_local(jnp.asarray(n), jnp.asarray(n)))
    np.testing.assert_allclose(loc[:, 2], 1.0, atol=1e-5)


def test_spherical_uv_roundtrip(rng_np):
    v = rng_np.normal(size=(500, 3)).astype(np.float32)
    v /= np.linalg.norm(v, axis=-1, keepdims=True)
    uv = smath.cartesian_to_spherical_uv(jnp.asarray(v))
    v2 = smath.spherical_uv_to_cartesian(uv)
    np.testing.assert_allclose(np.asarray(v2), v, atol=1e-4)


def test_uniform_sphere_sampling_stats(rng_np):
    u = rng_np.random(size=(20000, 2)).astype(np.float32)
    d = np.array(smath.sample_uniform_sphere(jnp.asarray(u[:, 0]), jnp.asarray(u[:, 1])))
    np.testing.assert_allclose(np.linalg.norm(d, axis=-1), 1.0, atol=1e-5)
    # each octant gets ~1/8 of samples
    octant = (d[:, 0] > 0).astype(int) * 4 + (d[:, 1] > 0).astype(int) * 2 + (d[:, 2] > 0)
    counts = np.bincount(octant, minlength=8) / len(d)
    np.testing.assert_allclose(counts, 1 / 8, atol=0.02)


def test_cos_hemisphere_pdf_integrates_to_one(rng_np):
    # Monte Carlo: E_uniform_hemisphere[pdf / uniform_pdf] = 1
    u = rng_np.random(size=(200000, 2)).astype(np.float32)
    d = np.array(smath.sample_uniform_sphere(jnp.asarray(u[:, 0]), jnp.asarray(u[:, 1])))
    d[:, 2] = np.abs(d[:, 2])  # fold to hemisphere; uniform pdf = 1/(2pi)
    pdf = np.asarray(smath.cosine_hemisphere_pdfW(jnp.asarray(d[:, 2])))
    integral = np.mean(pdf * 2 * np.pi)
    assert integral == pytest.approx(1.0, abs=0.02)


def test_cos_hemisphere_sample_matches_pdf(rng_np):
    u = rng_np.random(size=(100000, 2)).astype(np.float32)
    d = np.asarray(smath.sample_cos_hemisphere(jnp.asarray(u[:, 0]), jnp.asarray(u[:, 1])))
    np.testing.assert_allclose(np.linalg.norm(d, axis=-1), 1.0, atol=1e-4)
    assert np.all(d[:, 2] >= 0)
    # E[cos_theta] for cosine-weighted = 2/3
    assert np.mean(d[:, 2]) == pytest.approx(2.0 / 3.0, abs=0.01)


def test_ray_sphere():
    t0, t1 = smath.ray_sphere(
        jnp.asarray([0.0, 0.0, -5.0]), jnp.asarray([0.0, 0.0, 1.0]),
        jnp.asarray([0.0, 0.0, 0.0]), 1.0,
    )
    assert float(t0) == pytest.approx(4.0, abs=1e-4)
    assert float(t1) == pytest.approx(6.0, abs=1e-4)
    # miss
    t0, t1 = smath.ray_sphere(
        jnp.asarray([0.0, 5.0, -5.0]), jnp.asarray([0.0, 0.0, 1.0]),
        jnp.asarray([0.0, 0.0, 0.0]), 1.0,
    )
    assert float(t0) == 0.0 and float(t1) == 0.0


def test_ray_aabb():
    o = jnp.asarray([0.0, 0.0, -5.0])
    inv_d = 1.0 / jnp.asarray([1e-12, 1e-12, 1.0])
    tn, tf = smath.ray_aabb(o, inv_d, jnp.asarray([-1.0, -1.0, -1.0]), jnp.asarray([1.0, 1.0, 1.0]))
    assert float(tn) == pytest.approx(4.0)
    assert float(tf) == pytest.approx(6.0)


def test_spectrum_to_rgb_flat_spectrum_is_whiteish():
    wl = np.asarray([400.0, 700.0], np.float32)
    vals = np.asarray([1.0, 1.0], np.float32)
    rgb = smath.integrate_spectrum_to_rgb(wl, vals)
    assert rgb.shape == (3,)
    assert np.all(rgb > 0.5) and np.all(rgb < 1.5)
