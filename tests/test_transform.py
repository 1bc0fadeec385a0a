import jax.numpy as jnp
import numpy as np
import pytest

from stratum_tpu.core import transform as xf


def _rand_transform(rng):
    # random rotation via QR + random translation and mild scale
    q, _ = np.linalg.qr(rng.normal(size=(3, 3)))
    q *= rng.uniform(0.5, 2.0)
    t = rng.normal(size=3)
    return jnp.asarray(np.concatenate([q, t[:, None]], axis=1), jnp.float32)


def test_inverse_roundtrip(rng_np):
    for _ in range(10):
        m = _rand_transform(rng_np)
        inv = xf.inverse(m)
        p = jnp.asarray(rng_np.normal(size=(50, 3)), jnp.float32)
        rt = xf.transform_point(inv, xf.transform_point(m, p))
        np.testing.assert_allclose(np.asarray(rt), np.asarray(p), atol=1e-3)


def test_compose(rng_np):
    a = _rand_transform(rng_np)
    b = _rand_transform(rng_np)
    p = jnp.asarray(rng_np.normal(size=(20, 3)), jnp.float32)
    lhs = xf.transform_point(xf.compose(a, b), p)
    rhs = xf.transform_point(a, xf.transform_point(b, p))
    np.testing.assert_allclose(np.asarray(lhs), np.asarray(rhs), atol=1e-4)


def test_transform_normal_perpendicular(rng_np):
    m = _rand_transform(rng_np)
    inv = xf.inverse(m)
    # a tangent transformed by m stays perpendicular to normal transformed by inv^T
    n = jnp.asarray([0.0, 1.0, 0.0])
    t = jnp.asarray([1.0, 0.0, 0.0])
    tn = xf.transform_normal(inv, n)
    tt = xf.transform_vector(m, t)
    assert float(jnp.dot(tn, tt)) == pytest.approx(0.0, abs=1e-5)


def test_look_at():
    m = xf.look_at([0.0, 0.0, -5.0], [0.0, 0.0, 0.0])
    # camera-space +z (forward) maps to world +z here
    fwd = xf.transform_vector(m, jnp.asarray([0.0, 0.0, 1.0]))
    np.testing.assert_allclose(np.asarray(fwd), [0, 0, 1], atol=1e-6)
    origin = xf.transform_point(m, jnp.zeros(3))
    np.testing.assert_allclose(np.asarray(origin), [0, 0, -5], atol=1e-6)


def test_perspective_back_project_center_and_fov():
    fovy = np.radians(60.0)
    proj = xf.make_perspective(fovy, aspect=1.0, znear=0.1)
    c = xf.back_project(proj, jnp.asarray([0.0, 0.0]))
    np.testing.assert_allclose(np.asarray(c), [0, 0, 0.1], atol=1e-6)
    # top edge of image: angle from axis should be fovy/2
    top = np.asarray(xf.back_project(proj, jnp.asarray([0.0, 1.0])))
    angle = np.arctan2(top[1], top[2])
    assert angle == pytest.approx(fovy / 2, abs=1e-5)


def test_project_back_project_consistency():
    proj = xf.make_perspective(np.radians(45.0), aspect=1.5, znear=0.01)
    ndc = jnp.asarray([[0.3, -0.7], [-0.9, 0.2]])
    p = xf.back_project(proj, ndc)
    clip = xf.project_point(proj, p)
    ndc2 = np.asarray(clip[..., :2] / clip[..., 3:4])
    np.testing.assert_allclose(ndc2, np.asarray(ndc), atol=1e-5)


def test_reversed_z():
    proj = xf.make_perspective(np.radians(45.0), aspect=1.0, znear=0.1)
    near = xf.project_point(proj, jnp.asarray([0.0, 0.0, 0.1]))
    far = xf.project_point(proj, jnp.asarray([0.0, 0.0, 1000.0]))
    z_near = float(near[2] / near[3])
    z_far = float(far[2] / far[3])
    assert z_near == pytest.approx(1.0, abs=1e-5)
    assert z_far == pytest.approx(0.0, abs=1e-3)
