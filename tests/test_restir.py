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
