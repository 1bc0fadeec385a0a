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


def test_session_step_adaptive(setup):
    """Session integration: uniform pilot + adaptive rounds; per-pixel
    counts weight the estimate, checkpoint/resume carries the state."""
    from stratum_tpu.render.session import RenderSession

    scene, view, cfg = setup
    s = RenderSession(scene=scene, view=view, cfg=cfg)
    s.step(4)
    img = s.step_adaptive(rounds=8, frac=0.25)
    img = np.asarray(img)
    assert np.isfinite(img).all()
    cnt = np.asarray(s.sample_count)
    assert cnt.min() >= 4 and cnt.max() > cnt.min()
    # mean stays consistent with a uniform render at similar effort
    ref = np.asarray(
        integrator.render_path_batched(scene, view, cfg, 64, 500)[0]
    )
    assert img.mean() == pytest.approx(ref.mean(), rel=0.08)


def test_session_adaptive_checkpoint(setup, tmp_path):
    from stratum_tpu.render.session import RenderSession

    scene, view, cfg = setup
    a = RenderSession(scene=scene, view=view, cfg=cfg)
    a.step(2)
    a.step_adaptive(rounds=2)
    a.save_checkpoint(tmp_path / "ck")
    cont = np.asarray(a.step_adaptive(rounds=2))

    b = RenderSession(scene=scene, view=view, cfg=cfg)
    b.load_checkpoint(tmp_path / "ck")
    resumed = np.asarray(b.step_adaptive(rounds=2))
    np.testing.assert_array_equal(cont, resumed)
