"""Light tracing vs forward path tracing: both are unbiased estimators of
the same image (the reference's estimator cross-check idea,
BDPTDebugMode::ePathLengthContribution — SURVEY.md §4)."""

import numpy as np
import pytest

from stratum_tpu.render import camera, integrator, lighttrace
from stratum_tpu.scene import builtin, flatten


@pytest.fixture(scope="module")
def cornell_small():
    g = builtin.cornell_box(boxes=False)  # empty box: smooth comparison
    scene, _ = flatten.flatten(g.root)
    node, cam = flatten.find_camera(g.root)
    w = h = 32
    view = camera.make_view(node.to_world(), cam.fovy, w, h)
    return scene, view


def test_lt_matches_pt_mean(cornell_small):
    scene, view = cornell_small
    cfg = integrator.RenderConfig(
        width=32, height=32, max_bounces=2, rr_depth=100
    )
    pt = np.asarray(
        integrator.render_path_progressive(scene, view, cfg, 48)
    )
    lt = np.asarray(
        lighttrace.render_lt_progressive(scene, view, cfg, 48)
    )
    # global means agree
    assert lt.mean() == pytest.approx(pt.mean(), rel=0.08), (
        lt.mean(),
        pt.mean(),
    )
    # region means agree (floor, back wall) — catches importance-factor
    # errors that a global mean could hide
    for region in (np.s_[24:30, 8:24], np.s_[10:20, 8:24]):
        a, b = lt[region].mean(), pt[region].mean()
        assert a == pytest.approx(b, rel=0.15), (region, a, b)


def test_lt_direct_emission_visible(cornell_small):
    scene, view = cornell_small
    cfg = integrator.RenderConfig(width=32, height=32, max_bounces=1)
    em = np.asarray(lighttrace.trace_emission_only(scene, view, cfg, 0))
    assert em.max() == pytest.approx(15.0, rel=1e-5)  # the light quad
    lt = np.asarray(lighttrace.render_lt(scene, view, cfg, 0))
    # full LT image = emission + splats (a pixel may carry both)
    assert lt.max() >= 15.0


def test_lt_deterministic(cornell_small):
    scene, view = cornell_small
    cfg = integrator.RenderConfig(width=32, height=32, max_bounces=2)
    a = np.asarray(lighttrace.render_lt(scene, view, cfg, 3))
    b = np.asarray(lighttrace.render_lt(scene, view, cfg, 3))
    np.testing.assert_array_equal(a, b)
