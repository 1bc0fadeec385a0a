"""Adaptive sampling (render/adaptive.py): variance-guided per-pixel
allocation — a capability beyond the reference (uniform spp only)."""

import numpy as np
import pytest

from stratum_tpu.render import adaptive, camera, integrator
from stratum_tpu.scene import builtin, flatten


@pytest.fixture(scope="module")
def setup():
    g = builtin.cornell_box()
    scene, _ = flatten.flatten(g.root)
    node, cam = flatten.find_camera(g.root)
    view = camera.make_view(node.to_world(), cam.fovy, 32, 32)
    cfg = integrator.RenderConfig(width=32, height=32, max_bounces=3)
    return scene, view, cfg


def test_budget_and_counts(setup):
    scene, view, cfg = setup
    img, st = adaptive.render_adaptive(
        scene, view, cfg, 8, pilot=4, frac=0.25, seed0=0
    )
    cnt = np.asarray(st.count)
    assert np.isfinite(np.asarray(img)).all()
    assert cnt.min() >= 4  # pilot coverage
    assert cnt.mean() == pytest.approx(8.0, abs=0.3)  # budget respected
    assert cnt.max() > cnt.min()  # allocation actually varies


def test_mean_consistent_and_rmse_beats_uniform(setup):
    """Equal average budget: adaptive must agree in the mean with uniform
    and land at lower RMSE vs a converged reference (the whole point)."""
    scene, view, cfg = setup
    budget = 16
    ref = np.asarray(
        integrator.render_path_batched(scene, view, cfg, 256, 1000)[0]
    )
    uni = np.asarray(
        integrator.render_path_batched(scene, view, cfg, budget, 0)[0]
    )
    ada, _ = adaptive.render_adaptive(
        scene, view, cfg, budget, pilot=6, frac=0.25, seed0=0
    )
    ada = np.asarray(ada)
    assert ada.mean() == pytest.approx(ref.mean(), rel=0.05)

    def rmse(a):
        return float(np.sqrt(((a - ref) ** 2).mean()))

    assert rmse(ada) < rmse(uni), (rmse(ada), rmse(uni))
