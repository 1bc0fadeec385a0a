"""Reservoir sampling + RIS NEE tests (reference: reservoir.h semantics,
connect_light_reservoir estimator consistency)."""

import jax.numpy as jnp
import numpy as np
import pytest

from stratum_tpu.core import reservoir as sres


def test_reservoir_selection_probability(rng_np):
    """Streaming candidates with weights w_i keeps candidate i with
    probability w_i / sum(w) (reservoir.h:10-20)."""
    n = 200_000
    weights = [1.0, 3.0, 2.0]
    res = sres.init_reservoir(
        {"v": jnp.zeros((n,), jnp.float32)}, n
    )
    for i, w in enumerate(weights):
        u = jnp.asarray(rng_np.random(n).astype(np.float32))
        res = sres.update(
            res,
            {"v": jnp.full((n,), float(i), jnp.float32)},
            jnp.full((n,), w, jnp.float32),
            jnp.full((n,), w, jnp.float32),
            u,
        )
    kept = np.asarray(res.sample["v"])
    total = sum(weights)
    for i, w in enumerate(weights):
        assert (kept == i).mean() == pytest.approx(w / total, abs=0.01)
    np.testing.assert_allclose(np.asarray(res.total_weight), total)
    np.testing.assert_allclose(np.asarray(res.m), 3.0)


def test_reservoir_contribution_weight():
    n = 4
    res = sres.Reservoir(
        sample={"v": jnp.zeros((n,))},
        target_pdf=jnp.full((n,), 2.0),
        total_weight=jnp.full((n,), 8.0),
        m=jnp.full((n,), 4.0),
    )
    np.testing.assert_allclose(
        np.asarray(sres.contribution_weight(res)), 8.0 / (4.0 * 2.0)
    )


def test_ris_nee_unbiased():
    """RIS NEE (ris_candidates=4) converges to the same image as plain NEE."""
    from stratum_tpu.render import camera, integrator
    from stratum_tpu.scene import builtin, flatten

    g = builtin.cornell_box()
    scene, _ = flatten.flatten(g.root)
    node, cam = flatten.find_camera(g.root)
    view = camera.make_view(node.to_world(), cam.fovy, 32, 32)
    base = dict(width=32, height=32, max_bounces=2, rr_depth=100)
    plain = np.asarray(
        integrator.render_path_progressive(
            scene, view, integrator.RenderConfig(**base), 32
        )
    )
    ris = np.asarray(
        integrator.render_path_progressive(
            scene, view,
            integrator.RenderConfig(**base, ris_candidates=4), 32,
        )
    )
    assert ris.mean() == pytest.approx(plain.mean(), rel=0.05)
    # RIS with 4 candidates reduces direct-light noise at equal spp
    ref = np.asarray(
        integrator.render_path_progressive(
            scene, view, integrator.RenderConfig(**base), 128, seed0=500
        )
    )
    mask = ref.max(axis=-1) < 2.0
    e_plain = ((plain - ref) ** 2)[mask].mean()
    e_ris = ((ris - ref) ** 2)[mask].mean()
    assert e_ris < e_plain * 1.05, (e_ris, e_plain)
