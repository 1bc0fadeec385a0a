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


def test_filter_kernel_variants(setup):
    """All FilterKernelType analogs (filter_type.h:8-16) run and reduce
    noise; patterns differ from each other."""
    scene, view, cfg = setup
    gb = aov.render_gbuffer(scene, view, view, cfg)
    noisy = np.asarray(integrator.render_path(scene, view, cfg, 0))
    outs = {}
    for ft in ("atrous", "box3", "box5", "subsampled",
               "box3_subsampled", "box5_subsampled"):
        state = denoise.init_state(cfg.height, cfg.width)
        dcfg = denoise.DenoiseConfig(filter_type=ft)
        _, out = denoise.denoise(state, noisy, gb, dcfg)
        out = np.asarray(out)
        assert np.isfinite(out).all(), ft
        outs[ft] = out
    # distinct tap patterns produce distinct results
    assert np.abs(outs["atrous"] - outs["box3"]).max() > 1e-6
    assert np.abs(outs["box5"] - outs["subsampled"]).max() > 1e-6


def test_history_tap_writeback(setup):
    """cfg.history_tap writes iteration-N filtered color back into the
    temporal history (reference: copy_rgb, atrous.hlsl:264-271)."""
    scene, view, cfg = setup
    gb = aov.render_gbuffer(scene, view, view, cfg)
    noisy = np.asarray(integrator.render_path(scene, view, cfg, 0))
    s0 = denoise.init_state(cfg.height, cfg.width)
    base_cfg = denoise.DenoiseConfig()
    tap_cfg = denoise.DenoiseConfig(history_tap=1)
    s_base, out_base = denoise.denoise(s0, noisy, gb, base_cfg)
    s_tap, out_tap = denoise.denoise(s0, noisy, gb, tap_cfg)
    # the displayed output is identical (tap only affects NEXT frame)...
    np.testing.assert_allclose(
        np.asarray(out_base), np.asarray(out_tap), atol=1e-6
    )
    # ...but the stored history color is the (smoother) filtered image
    assert np.abs(
        np.asarray(s_tap.color) - np.asarray(s_base.color)
    ).max() > 1e-5
    # moments and history count stay untouched (AccumColor.w semantics)
    np.testing.assert_array_equal(
        np.asarray(s_tap.moments), np.asarray(s_base.moments)
    )
    np.testing.assert_array_equal(
        np.asarray(s_tap.history), np.asarray(s_base.history)
    )


def test_denoiser_debug_modes(setup):
    """DenoiserDebugMode analogs (denoiser.h:10-16) return color-mapped
    visualizations in [0,1]."""
    scene, view, cfg = setup
    gb = aov.render_gbuffer(scene, view, view, cfg)
    noisy = np.asarray(integrator.render_path(scene, view, cfg, 0))
    for mode in ("sample_count", "variance", "weight_sum"):
        state = denoise.init_state(cfg.height, cfg.width)
        dcfg = denoise.DenoiseConfig(debug_mode=mode)
        _, dbg = denoise.denoise(state, noisy, gb, dcfg)
        dbg = np.asarray(dbg)
        assert dbg.shape == (cfg.height, cfg.width, 3), mode
        assert np.isfinite(dbg).all(), mode
        assert dbg.min() >= -1e-3 and dbg.max() <= 1.1, mode


def test_moving_camera_reprojection(setup):
    """Session frames along a real camera path: reprojection hit-rate stays
    high and disoccluded pixels restart their history (no ghosting)
    (reference: temporal gates, temporal_accumulation.hlsl:80-99; the
    static-camera tests never exercise a moving prev_view)."""
    scene, _, cfg = setup
    from stratum_tpu.render.session import RenderSession

    def view_at(t):
        # dolly sideways through the cornell box (box spans ~[0,552])
        eye = (278.0 + 40.0 * t, 273.0, -780.0)
        return camera.look_at_view(
            eye, (278.0, 273.0, 279.6), 0.686, cfg.width, cfg.height,
        )

    sess = RenderSession(scene=scene, view=view_at(0.0), cfg=cfg, denoise=True)
    sess.frame()
    hists = []
    for k in range(1, 4):
        sess.set_view(view_at(float(k)))
        out = sess.frame()
        assert np.isfinite(np.asarray(out)).all()
        # reprojection diagnostics at the new view
        dcfg = denoise.DenoiseConfig()
        _, _, _, aux = denoise.temporal_accumulate(
            denoise.DenoiseState(*[np.asarray(x) for x in sess.denoise_state]),
            np.asarray(out), sess.gbuffer(), dcfg, with_aux=True,
        )
        hists.append(np.asarray(sess.denoise_state.history))
    # most pixels carry history across a 40-unit dolly (hit-rate > 90%)
    h_last = hists[-1]
    assert (h_last > 1.5).mean() > 0.90, (h_last > 1.5).mean()
    # history grew over the path for tracked pixels
    assert h_last.max() > 2.5


def test_session_batched_step_matches_sequential(setup):
    """step(3) takes the one-launch batched path; it must agree with three
    sequential step(1) calls (same seeds, fusion-level rounding only)."""
    scene, view, cfg = setup
    a = RenderSession(scene=scene, view=view, cfg=cfg)
    img_a = np.asarray(a.step(3))
    b = RenderSession(scene=scene, view=view, cfg=cfg)
    for _ in range(3):
        img_b = b.step(1)
    np.testing.assert_allclose(img_a, np.asarray(img_b), rtol=1e-5, atol=1e-7)
    assert a.spp == b.spp == 3


def test_session_lane_step_matches_sequential(setup):
    """step(4) with spp_lanes=2 renders two 2-lane groups
    (integrator.render_path_lanes); same seeds as four sequential
    step(1) calls, so the accumulations must agree."""
    scene, view, cfg = setup
    a = RenderSession(scene=scene, view=view, cfg=cfg, spp_lanes=2)
    img_a = np.asarray(a.step(4))
    b = RenderSession(scene=scene, view=view, cfg=cfg)
    for _ in range(4):
        img_b = b.step(1)
    np.testing.assert_allclose(img_a, np.asarray(img_b), rtol=1e-5, atol=1e-7)
    assert a.spp == b.spp == 4
