"""Debug views (reference: BDPTDebugMode, bdpt.h:177-193): shape/sanity +
the per-path-length views summing to the full image."""

import numpy as np
import pytest

from stratum_tpu.render import camera, debug, integrator
from stratum_tpu.scene import builtin, flatten


@pytest.fixture(scope="module")
def setup():
    g = builtin.cornell_box()
    scene, _ = flatten.flatten(g.root)
    node, cam = flatten.find_camera(g.root)
    w = h = 24
    view = camera.make_view(node.to_world(), cam.fovy, w, h)
    cfg = integrator.RenderConfig(width=w, height=h, max_bounces=2)
    return scene, view, cfg


@pytest.mark.parametrize(
    "mode", ["albedo", "normal", "depth", "instance", "uv", "env_pdf"]
)
def test_debug_modes_render(setup, mode):
    scene, view, cfg = setup
    img = np.asarray(debug.render_debug(scene, view, cfg, mode))
    assert img.shape == (cfg.height, cfg.width, 3)
    assert np.isfinite(img).all()


def test_path_length_views_sum_to_full(setup):
    """Per-edge-count contribution images sum to the complete render —
    the reference's ePathLengthContribution estimator cross-check."""
    scene, view, cfg = setup
    spp = 8
    full = np.asarray(
        integrator.render_path_progressive(scene, view, cfg, spp)
    )
    total = np.zeros_like(full)
    for edges in range(1, cfg.max_bounces + 3):
        total += np.asarray(
            debug.render_debug(
                scene, view, cfg, f"path_length_{edges}", spp=spp
            )
        )
    np.testing.assert_allclose(total, full, rtol=1e-4, atol=1e-5)


def test_reservoir_weight_view(setup):
    scene, view, cfg = setup
    img = np.asarray(
        debug.render_debug(scene, view, cfg, "reservoir_w", spp=4)
    )
    assert np.isfinite(img).all()
    assert img.max() > 0
