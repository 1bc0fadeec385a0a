"""LBVH build + traversal tests: the BVH must agree with the brute-force
oracle bit-for-hit (SURVEY.md M2)."""

import jax.numpy as jnp
import numpy as np
import pytest

from stratum_tpu.ops import bvh as sbvh
from stratum_tpu.ops import intersect
from stratum_tpu.scene import builtin, flatten


def _random_tris(rng, n, spread=4.0):
    base = (rng.random((n, 1, 3)) - 0.5) * 2 * spread
    tri = base + (rng.random((n, 3, 3)) - 0.5)
    pos = tri.reshape(-1, 3).astype(np.float32)
    idx = np.arange(3 * n, dtype=np.int32).reshape(n, 3)
    return jnp.asarray(pos), jnp.asarray(idx)


def _random_rays(rng, n, spread=6.0):
    o = ((rng.random((n, 3)) - 0.5) * 2 * spread).astype(np.float32)
    d = rng.standard_normal((n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    return jnp.asarray(o), jnp.asarray(d)


@pytest.mark.parametrize("num_tris", [1, 5, 64, 257])
def test_closest_matches_brute_force(rng_np, num_tris):
    pos, idx = _random_tris(rng_np, num_tris)
    o, d = _random_rays(rng_np, 256)
    bvh = sbvh.build_bvh(pos, idx)
    hb = sbvh.traverse_closest(bvh, o, d)
    hr = intersect.intersect_brute_force(o, d, pos, idx)
    np.testing.assert_array_equal(np.asarray(hb.tri), np.asarray(hr.tri))
    hit = np.asarray(hr.tri) >= 0
    np.testing.assert_allclose(
        np.asarray(hb.t)[hit], np.asarray(hr.t)[hit], rtol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(hb.bary)[hit], np.asarray(hr.bary)[hit], rtol=1e-5, atol=1e-6
    )


def test_occluded_matches_brute_force(rng_np):
    pos, idx = _random_tris(rng_np, 100)
    o, d = _random_rays(rng_np, 512)
    t_max = jnp.asarray((rng_np.random(512) * 10).astype(np.float32))
    bvh = sbvh.build_bvh(pos, idx)
    ob = sbvh.traverse_occluded(bvh, o, d, t_max)
    orf = intersect.occluded_brute_force(o, d, t_max, pos, idx)
    np.testing.assert_array_equal(np.asarray(ob), np.asarray(orf))


def test_padding_triangles_excluded(rng_np):
    """Invalid (padding) triangles must never be hit."""
    pos, idx = _random_tris(rng_np, 32)
    valid = jnp.asarray(np.arange(32) < 20)
    bvh = sbvh.build_bvh(pos, idx, valid)
    o, d = _random_rays(rng_np, 512)
    hb = sbvh.traverse_closest(bvh, o, d)
    tri = np.asarray(hb.tri)
    assert (tri < 20).all()


def test_cornell_render_bvh_equals_brute():
    """Full-pipeline equivalence: direct-lighting Cornell render via BVH is
    identical to the brute-force render (same RNG stream)."""
    from stratum_tpu.render import camera, integrator

    g = builtin.cornell_box()
    scene, _ = flatten.flatten(g.root)
    node, cam = flatten.find_camera(g.root)
    view = camera.make_view(node.to_world(), cam.fovy, 48, 48)
    a = np.asarray(
        integrator.render_direct(
            scene, view, integrator.RenderConfig(48, 48, tracer="bvh"), 3
        )
    )
    b = np.asarray(
        integrator.render_direct(
            scene, view, integrator.RenderConfig(48, 48, tracer="brute"), 3
        )
    )
    np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-6)
    # the MXU tracer agrees to its (looser) arithmetic tolerance
    c = np.asarray(
        integrator.render_direct(
            scene, view, integrator.RenderConfig(48, 48, tracer="mxu"), 3
        )
    )
    mismatch = (np.abs(c - b) > 1e-3 * (1 + np.abs(b))).mean()
    assert mismatch < 0.005, mismatch


def test_morton_codes_order():
    lo = jnp.asarray([[0.0, 0.0, 0.0], [1.0, 1.0, 1.0]])
    codes = np.asarray(sbvh.morton3(lo))
    assert codes[0] == 0
    assert codes[1] == (1 << 30) - 1  # all 30 bits set
