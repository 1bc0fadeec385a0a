"""Full BDPT vs the forward path tracer: independent unbiased estimators of
the same image (SURVEY.md §4 estimator-consistency strategy). Any MIS weight
error shows up as a systematic brightness shift."""

import numpy as np
import pytest

from stratum_tpu.render import bdpt, camera, integrator
from stratum_tpu.scene import builtin, flatten


@pytest.fixture(scope="module")
def cornell_empty():
    g = builtin.cornell_box(boxes=False)
    scene, _ = flatten.flatten(g.root)
    node, cam = flatten.find_camera(g.root)
    w = h = 32
    view = camera.make_view(node.to_world(), cam.fovy, w, h)
    return scene, view


def test_bdpt_matches_pt(cornell_empty):
    scene, view = cornell_empty
    cfg = integrator.RenderConfig(
        width=32, height=32, max_bounces=2, rr_depth=100
    )
    pt = np.asarray(integrator.render_path_progressive(scene, view, cfg, 24))
    bd = np.asarray(bdpt.render_bdpt_progressive(scene, view, cfg, 24))
    assert bd.mean() == pytest.approx(pt.mean(), rel=0.05)
    for region in (np.s_[24:30, 8:24], np.s_[10:20, 8:24]):
        assert bd[region].mean() == pytest.approx(
            pt[region].mean(), rel=0.12
        )


@pytest.mark.slow
def test_bdpt_lower_variance_indirect(cornell_empty):
    """BDPT's extra strategies must not blow up variance; on the mostly
    diffuse box its per-pixel variance at equal spp should be comparable or
    better in indirect regions (ceiling away from the light)."""
    scene, view = cornell_empty
    cfg = integrator.RenderConfig(
        width=32, height=32, max_bounces=3, rr_depth=100
    )
    ref = np.asarray(integrator.render_path_progressive(scene, view, cfg, 64))
    pt1 = np.asarray(integrator.render_path(scene, view, cfg, 101))
    bd1 = np.asarray(bdpt.render_bdpt(scene, view, cfg, 101))
    region = np.s_[1:6, 2:12]  # ceiling corner, indirect-dominated
    err_pt = ((pt1 - ref) ** 2)[region].mean()
    err_bd = ((bd1 - ref) ** 2)[region].mean()
    assert err_bd < err_pt * 4.0  # sanity bound, not a strict win


def test_bdpt_deterministic(cornell_empty):
    scene, view = cornell_empty
    cfg = integrator.RenderConfig(width=32, height=32, max_bounces=2)
    a = np.asarray(bdpt.render_bdpt(scene, view, cfg, 9))
    b = np.asarray(bdpt.render_bdpt(scene, view, cfg, 9))
    np.testing.assert_array_equal(a, b)
    assert np.isfinite(a).all()


def test_mis_weights_partition_of_unity(cornell_empty):
    """For a fixed path, the MIS weights of all strategies must sum to 1:
    verified analytically for the 2-vertex family (s=0,t=2) vs (s=1,t=1)."""
    import jax.numpy as jnp

    from stratum_tpu.render.bdpt import mis_weight_arrays

    n = 4
    rng = np.random.default_rng(0)
    p_cam = jnp.asarray(rng.random(n).astype(np.float32) + 0.1)
    p_light = jnp.asarray(rng.random(n).astype(np.float32) + 0.1)
    # strategy (s=0, t=2): camera slot z1 with fwd=p_cam, rev=p_light
    w0 = mis_weight_arrays(
        p_cam[:, None], p_light[:, None], jnp.zeros((n, 1)), jnp.zeros((n, 1)),
        1, 0,
    )
    # strategy (s=1, t=1): light slot y0 with fwd=p_light, rev=p_cam
    w1 = mis_weight_arrays(
        jnp.zeros((n, 1)), jnp.zeros((n, 1)), p_light[:, None], p_cam[:, None],
        0, 1,
    )
    np.testing.assert_allclose(np.asarray(w0 + w1), 1.0, rtol=1e-5)


def test_bdpt_matches_pt_env_lit():
    """Estimator consistency on an ENVIRONMENT-lit scene: the env strategies
    (BSDF escape + env NEE with pairwise MIS) must agree with the forward
    path tracer (VERDICT r1 item 6; reference: env branches of
    connect_light/eval_emission, path.hlsli:310-366, 847-894)."""
    import numpy as np

    from stratum_tpu.scene.graph import EnvironmentComponent

    g = builtin.cornell_box(boxes=False, light_scale=0.5)
    env = g.root.add_child("env")
    env.make_component(
        EnvironmentComponent(color=np.asarray([0.6, 0.7, 0.9], np.float32))
    )
    # open the box a little: remove the back wall so env light enters
    for n in list(g.root.children):
        if n.name == "back":
            n.components.clear()
    scene, _ = flatten.flatten(g.root)
    node, cam = flatten.find_camera(g.root)
    w = h = 32
    view = camera.make_view(node.to_world(), cam.fovy, w, h)
    cfg = integrator.RenderConfig(
        width=w, height=h, max_bounces=2, rr_depth=100
    )
    spp = 24
    pt = np.asarray(integrator.render_path_progressive(scene, view, cfg, spp))
    bd = np.asarray(bdpt.render_bdpt_progressive(scene, view, cfg, spp))
    assert np.isfinite(bd).all()
    assert bd.mean() == pytest.approx(pt.mean(), rel=0.05), (
        bd.mean(), pt.mean()
    )


def test_bdpt_rr_unbiased(cornell_empty):
    """Russian roulette inside the subpath walks keeps the estimator mean
    (beta compensation is exact; MIS weights still partition unity)."""
    scene, view = cornell_empty
    cfg_rr = integrator.RenderConfig(
        width=32, height=32, max_bounces=3, rr_depth=1, rr_min_beta=0.3
    )
    cfg_no = integrator.RenderConfig(
        width=32, height=32, max_bounces=3, rr_depth=100
    )
    spp = 32
    with_rr = np.asarray(
        bdpt.render_bdpt_progressive(scene, view, cfg_rr, spp)
    )
    without = np.asarray(
        bdpt.render_bdpt_progressive(scene, view, cfg_no, spp)
    )
    assert with_rr.mean() == pytest.approx(without.mean(), rel=0.06), (
        with_rr.mean(), without.mean()
    )


def test_lvc_matches_paired(cornell_empty):
    """LVC reservoir connections (reference: connect_lvc,
    path.hlsli:682-822) estimate the same image as the deterministic
    paired connections: cache cells are iid replicas, RIS + dynamic MIS
    keep the mean."""
    scene, view = cornell_empty
    cfg_pair = integrator.RenderConfig(
        width=32, height=32, max_bounces=2, rr_depth=100
    )
    cfg_lvc = integrator.RenderConfig(
        width=32, height=32, max_bounces=2, rr_depth=100, lvc_connections=4
    )
    spp = 24
    paired = np.asarray(
        bdpt.render_bdpt_progressive(scene, view, cfg_pair, spp)
    )
    lvc = np.asarray(bdpt.render_bdpt_progressive(scene, view, cfg_lvc, spp))
    assert np.isfinite(lvc).all()
    assert lvc.mean() == pytest.approx(paired.mean(), rel=0.06), (
        lvc.mean(), paired.mean()
    )


def test_lvc_cross_frame_reuse_mean(cornell_empty):
    """Cross-frame LVC reservoir reuse (reference eLVCReservoirReuse,
    path.hlsli:724-770): merging the previous frame's hash-grid-keyed
    winning reservoirs keeps the progressive mean on a static scene
    (standard M-capped ReSTIR temporal semantics)."""
    scene, view = cornell_empty
    cfg = integrator.RenderConfig(
        width=32, height=32, max_bounces=2, rr_depth=100, lvc_connections=4
    )
    spp = 24
    base = np.asarray(bdpt.render_bdpt_progressive(scene, view, cfg, spp))
    acc = None
    state = None
    for s in range(spp):
        img, state = bdpt.render_bdpt_reuse(scene, view, cfg, s, state)
        img = np.asarray(img)
        acc = img if acc is None else acc + img
    reuse = acc / spp
    assert np.isfinite(reuse).all()
    assert reuse.mean() == pytest.approx(base.mean(), rel=0.06), (
        reuse.mean(), base.mean()
    )


def test_bdpt_chunked_matches_unchunked():
    """Chunked subpath storage (render_bdpt_chunked) reproduces the
    unchunked estimator: camera streams are pixel-keyed and light streams
    are global-lane-keyed, so every sampling decision is identical; only
    splat-accumulation order may reassociate."""
    g = builtin.cornell_box()
    scene, _ = flatten.flatten(g.root)
    node, cam = flatten.find_camera(g.root)
    w, h = 32, 16
    view = camera.make_view(node.to_world(), cam.fovy, w, h)
    cfg = integrator.RenderConfig(width=w, height=h, max_bounces=2)
    full = np.asarray(bdpt.render_bdpt(scene, view, cfg, 3))
    chunked = np.asarray(bdpt.render_bdpt_chunked(scene, view, cfg, 3, 4))
    np.testing.assert_allclose(chunked, full, rtol=1e-4, atol=1e-6)
    a = full.reshape(-1, 3)
    b = chunked.reshape(-1, 3)
    frac_exact = (a == b).all(axis=-1).mean()
    assert frac_exact > 0.9, frac_exact
