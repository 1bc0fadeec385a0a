"""Denoiser + session tests: SVGF reduces noise without destroying signal,
temporal accumulation gates correctly, checkpoint/resume is exact."""

import numpy as np
import pytest

from stratum_tpu.render import aov, camera, denoise, integrator
from stratum_tpu.render.session import RenderSession
from stratum_tpu.scene import builtin, flatten


@pytest.fixture(scope="module")
def setup():
    g = builtin.cornell_box()
    scene, _ = flatten.flatten(g.root)
    node, cam = flatten.find_camera(g.root)
    w = h = 48
    view = camera.make_view(node.to_world(), cam.fovy, w, h)
    cfg = integrator.RenderConfig(width=w, height=h, max_bounces=3)
    return scene, view, cfg


def test_gbuffer_contents(setup):
    scene, view, cfg = setup
    gb = aov.render_gbuffer(scene, view, view, cfg)
    d = np.asarray(gb.depth)
    assert np.isfinite(d).all()  # closed box: everything hits
    n = np.asarray(gb.normal)
    np.testing.assert_allclose(np.linalg.norm(n, axis=-1), 1.0, atol=1e-4)
    inst = np.asarray(gb.instance)
    assert inst.min() >= 0 and inst.max() >= 5
    # static camera: prev_uv reprojects (approximately) to itself
    uv = np.asarray(gb.prev_uv)
    xs = (uv[..., 0] * cfg.width) - 0.5
    ys = (uv[..., 1] * cfg.height) - 0.5
    gx, gy = np.meshgrid(np.arange(cfg.width), np.arange(cfg.height))
    ok = uv[..., 0] >= 0
    assert np.abs(xs - gx)[ok].max() < 1.0
    assert np.abs(ys - gy)[ok].max() < 1.0


def test_denoise_reduces_noise(setup):
    scene, view, cfg = setup
    gb = aov.render_gbuffer(scene, view, view, cfg)
    noisy = np.asarray(integrator.render_path(scene, view, cfg, 0))
    ref = np.asarray(
        integrator.render_path_progressive(scene, view, cfg, 32)
    )
    state = denoise.init_state(cfg.height, cfg.width)
    state, out = denoise.denoise(state, noisy, gb)
    out = np.asarray(out)
    # clip fireflies out of the comparison (the light quad is 15x brighter)
    mask = ref.max(axis=-1) < 2.0
    err_noisy = ((noisy - ref) ** 2)[mask].mean()
    err_dn = ((out - ref) ** 2)[mask].mean()
    assert err_dn < err_noisy * 0.5, (err_dn, err_noisy)


def test_temporal_accumulation_converges(setup):
    scene, view, cfg = setup
    gb = aov.render_gbuffer(scene, view, view, cfg)
    state = denoise.init_state(cfg.height, cfg.width)
    dcfg = denoise.DenoiseConfig(demodulate_albedo=False)
    for s in range(6):
        img = integrator.render_path(scene, view, cfg, s)
        state, color, var = denoise.temporal_accumulate(state, img, gb, dcfg)
    # history accumulates on static frames
    assert float(np.asarray(state.history).mean()) > 4.0
    # variance shrinks as history grows
    assert float(np.asarray(var).mean()) < 10.0


def test_session_checkpoint_resume(setup, tmp_path):
    scene, view, cfg = setup
    s1 = RenderSession(scene=scene, view=view, cfg=cfg)
    s1.step(3)
    s1.save_checkpoint(tmp_path / "ckpt")
    img_continue = np.asarray(s1.step(2))

    s2 = RenderSession(scene=scene, view=view, cfg=cfg)
    s2.load_checkpoint(tmp_path / "ckpt")
    img_resumed = np.asarray(s2.step(2))
    np.testing.assert_array_equal(img_continue, img_resumed)


def test_session_view_change_resets(setup):
    scene, view, cfg = setup
    s = RenderSession(scene=scene, view=view, cfg=cfg)
    s.step(2)
    assert s.spp == 2
    view2 = camera.look_at_view(
        (278, 273, -700), (278, 273, 0), np.radians(38), cfg.width, cfg.height
    )
    s.set_view(view2)
    assert s.spp == 0
    s.step(1)
    assert s.spp == 1
