"""MXU (Plucker matmul) intersection vs the exact Moller-Trumbore oracle."""

import jax.numpy as jnp
import numpy as np
import pytest

from stratum_tpu.ops import intersect, mxu
from tests.test_bvh import _random_rays, _random_tris


@pytest.mark.parametrize("num_tris", [5, 64, 300])
def test_mxu_matches_brute(rng_np, num_tris):
    pos, idx = _random_tris(rng_np, num_tris)
    o, d = _random_rays(rng_np, 512)
    feat = mxu.build_tri_features(pos, idx)
    hm = mxu.intersect_mxu(o, d, feat, chunk=128)
    hr = intersect.intersect_brute_force(o, d, pos, idx)
    tb, tr = np.asarray(hm.tri), np.asarray(hr.tri)
    # the Plucker form may flip hit decisions exactly on triangle edges;
    # allow a tiny disagreement rate
    agree = (tb == tr).mean()
    assert agree > 0.99, agree
    both = (tb == tr) & (tr >= 0)
    np.testing.assert_allclose(
        np.asarray(hm.t)[both], np.asarray(hr.t)[both], rtol=2e-4, atol=2e-4
    )
    np.testing.assert_allclose(
        np.asarray(hm.bary)[both],
        np.asarray(hr.bary)[both],
        rtol=1e-3,
        atol=2e-4,
    )


def test_mxu_occluded_matches(rng_np):
    pos, idx = _random_tris(rng_np, 100)
    o, d = _random_rays(rng_np, 512)
    t_max = jnp.asarray((rng_np.random(512) * 10).astype(np.float32))
    feat = mxu.build_tri_features(pos, idx)
    om = np.asarray(mxu.occluded_mxu(o, d, t_max, feat, chunk=64))
    ob = np.asarray(intersect.occluded_brute_force(o, d, t_max, pos, idx))
    assert (om == ob).mean() > 0.995


def test_mxu_cornell_scale_precision(rng_np):
    """Cornell coordinates (~0..555) stress the world-origin-referenced
    triple products; hit t error must stay small relative to scene scale."""
    from stratum_tpu.scene import builtin, flatten

    g = builtin.cornell_box()
    scene, _ = flatten.flatten(g.root)
    geo = scene.geo
    n = 1024
    o = jnp.asarray(
        (rng_np.random((n, 3)) * [555, 555, 555]).astype(np.float32)
    )
    d = rng_np.standard_normal((n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    d = jnp.asarray(d)
    valid = scene.geo.tri_material >= 0
    feat = mxu.build_tri_features(geo.positions, geo.indices, valid)
    hm = mxu.intersect_mxu(o, d, feat)
    hr = intersect.intersect_brute_force(o, d, geo.positions, geo.indices)
    agree = (np.asarray(hm.tri) == np.asarray(hr.tri)).mean()
    assert agree > 0.99, agree  # (misses through the open front agree too)
    both = (np.asarray(hm.tri) == np.asarray(hr.tri)) & (np.asarray(hr.tri) >= 0)
    err = np.abs(np.asarray(hm.t)[both] - np.asarray(hr.t)[both])
    assert err.max() < 0.05, err.max()  # < 0.01% of the 555-unit scale


def test_mxu_padding_excluded(rng_np):
    pos, idx = _random_tris(rng_np, 32)
    valid = jnp.asarray(np.arange(32) < 20)
    feat = mxu.build_tri_features(pos, idx, valid)
    o, d = _random_rays(rng_np, 256)
    hm = mxu.intersect_mxu(o, d, feat)
    assert (np.asarray(hm.tri) < 20).all()
