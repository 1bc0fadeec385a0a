"""Multi-chip sharding tests on the 8-device virtual CPU mesh: the sharded
render must match the single-chip render (SURVEY.md §4 multi-chip test
strategy). The pixel-keyed counter RNG makes every sampling decision
identical; the only permitted deviation is float reassociation noise from
XLA compiling different tile shapes (observed <=5e-7 absolute)."""

import jax
import numpy as np
import pytest

from stratum_tpu.parallel import mesh as pmesh
from stratum_tpu.render import camera, integrator
from stratum_tpu.scene import builtin, flatten


def test_sharded_render_bit_identical():
    g = builtin.cornell_box()
    scene, _ = flatten.flatten(g.root)
    node, cam = flatten.find_camera(g.root)
    w, h = 64, 32
    view = camera.make_view(node.to_world(), cam.fovy, w, h)
    cfg = integrator.RenderConfig(width=w, height=h, max_bounces=3)
    single = np.asarray(integrator.render_path(scene, view, cfg, 5))

    assert len(jax.devices()) == 8, "conftest must provide 8 virtual devices"
    m = pmesh.make_mesh()
    sharded = np.asarray(pmesh.render_path_sharded(scene, view, cfg, 5, m))
    a = single.reshape(-1, 3)
    b = sharded.reshape(-1, 3)
    np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-6)
    # the overwhelming majority of pixels are bitwise identical — only
    # reassociated accumulations differ
    frac_exact = (a == b).all(axis=-1).mean()
    assert frac_exact > 0.9, frac_exact


def test_sharded_progressive():
    g = builtin.cornell_box()
    scene, _ = flatten.flatten(g.root)
    node, cam = flatten.find_camera(g.root)
    w = h = 32
    view = camera.make_view(node.to_world(), cam.fovy, w, h)
    cfg = integrator.RenderConfig(width=w, height=h, max_bounces=2)
    m = pmesh.make_mesh()
    img = np.asarray(
        pmesh.render_path_progressive_sharded(scene, view, cfg, 2, m)
    )
    ref = np.asarray(
        integrator.render_path_progressive(scene, view, cfg, 2)
    )
    np.testing.assert_allclose(img, ref, rtol=1e-4, atol=1e-6)


def test_sharded_lt_matches_unsharded():
    """Light tracing sharded over the mesh (partial splat images psum'd
    over the ICI) equals the single-device estimator run: lane0 offsets
    keep every light path's RNG stream globally identical."""
    from stratum_tpu.render import lighttrace as slt

    g = builtin.cornell_box(boxes=False)
    scene, _ = flatten.flatten(g.root)
    node, cam = flatten.find_camera(g.root)
    w = h = 32
    view = camera.make_view(node.to_world(), cam.fovy, w, h)
    cfg = integrator.RenderConfig(width=w, height=h, max_bounces=2)
    single = np.asarray(slt.render_lt(scene, view, cfg, 3))
    m = pmesh.make_mesh()
    sharded = np.asarray(pmesh.render_lt_sharded(scene, view, cfg, 3, m))
    np.testing.assert_allclose(sharded, single, rtol=1e-4, atol=1e-6)


@pytest.mark.slow
def test_sharded_bdpt_matches_unsharded():
    """BDPT sharded (pixels + light paths; t=1 splats psum'd) equals the
    single-device run."""
    from stratum_tpu.render import bdpt as sbdpt

    g = builtin.cornell_box(boxes=False)
    scene, _ = flatten.flatten(g.root)
    node, cam = flatten.find_camera(g.root)
    w = h = 16
    view = camera.make_view(node.to_world(), cam.fovy, w, h)
    cfg = integrator.RenderConfig(
        width=w, height=h, max_bounces=1, rr_depth=100
    )
    single = np.asarray(sbdpt.render_bdpt(scene, view, cfg, 3))
    m = pmesh.make_mesh()
    sharded = np.asarray(pmesh.render_bdpt_sharded(scene, view, cfg, 3, m))
    np.testing.assert_allclose(sharded, single, rtol=1e-4, atol=1e-6)


def test_sharded_presample_coherent_bit_identical():
    """Presampled-tile NEE and block-coherent tile groups shard identically:
    the tile is seed-keyed (device-independent) and granules are keyed by
    their first lane's absolute pixel coords, so per-device tiles that are
    a multiple of coherent_block draw the same groups."""
    g = builtin.cornell_box()
    scene, _ = flatten.flatten(g.root)
    node, cam = flatten.find_camera(g.root)
    w, h = 64, 32
    view = camera.make_view(node.to_world(), cam.fovy, w, h)
    cfg = integrator.RenderConfig(
        width=w, height=h, max_bounces=3, presample_lights=256,
        coherent_tiles=16, coherent_block=128,
    )
    single = np.asarray(integrator.render_path(scene, view, cfg, 5))
    m = pmesh.make_mesh()
    sharded = np.asarray(pmesh.render_path_sharded(scene, view, cfg, 5, m))
    a = single.reshape(-1, 3)
    b = sharded.reshape(-1, 3)
    np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-6)
    frac_exact = (a == b).all(axis=-1).mean()
    assert frac_exact > 0.9, frac_exact


def test_sharded_lane_batch_matches_unsharded():
    """Lane-batched sampling sharded over the mesh == the unsharded
    lane-batched render: lanes are (pixel, seed)-keyed, granules are
    absolute-coord keyed, so per-device tiles that are a multiple of
    coherent_block draw identical samples; only XLA fusion-level
    reassociation (different reduction splits at different shard shapes)
    separates the images."""
    g = builtin.cornell_box()
    scene, _ = flatten.flatten(g.root)
    node, cam = flatten.find_camera(g.root)
    w, h = 64, 32
    view = camera.make_view(node.to_world(), cam.fovy, w, h)
    cfg = integrator.RenderConfig(
        width=w, height=h, max_bounces=3, presample_lights=256,
        coherent_tiles=16, coherent_block=128,
    )
    single, n_single = integrator.render_path_lanes(scene, view, cfg, 2, 7)
    m = pmesh.make_mesh()
    sharded, n_sharded = pmesh.render_path_lanes_sharded(
        scene, view, cfg, 2, 7, m
    )
    a = np.asarray(single).reshape(-1, 3)
    b = np.asarray(sharded).reshape(-1, 3)
    np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-6)
    frac_exact = (a == b).all(axis=-1).mean()
    assert frac_exact > 0.75, frac_exact
    assert int(np.asarray(n_single)) == int(np.asarray(n_sharded))


def test_sharded_session_frame():
    """Full session frame (render + G-buffer + SVGF) sharded over the mesh
    matches the single-device frame (VERDICT r2: sharded end-to-end)."""
    from stratum_tpu.render import aov, denoise

    g = builtin.cornell_box()
    scene, _ = flatten.flatten(g.root)
    node, cam = flatten.find_camera(g.root)
    w, h = 64, 32
    view = camera.make_view(node.to_world(), cam.fovy, w, h)
    cfg = integrator.RenderConfig(width=w, height=h, max_bounces=2)
    dcfg = denoise.DenoiseConfig()
    m = pmesh.make_mesh()

    # single
    rad = integrator.render_path(scene, view, cfg, 3)
    gb = aov.render_gbuffer(scene, view, view, cfg)
    st = denoise.init_state(h, w)
    st1, img1 = denoise.denoise(st, rad, gb, dcfg)

    # sharded
    gb_s = pmesh.render_gbuffer_sharded(scene, view, view, cfg, m)
    np.testing.assert_allclose(
        np.asarray(gb.depth), np.asarray(gb_s.depth), rtol=1e-5, atol=1e-6
    )
    np.testing.assert_array_equal(
        np.asarray(gb.instance), np.asarray(gb_s.instance)
    )
    st2, img2 = pmesh.session_frame_sharded(
        scene, view, view, cfg, dcfg, denoise.init_state(h, w), 3, m
    )
    np.testing.assert_allclose(
        np.asarray(img1), np.asarray(img2), rtol=1e-4, atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(st1.color), np.asarray(st2.color), rtol=1e-4, atol=1e-5
    )


def test_sharded_kron_sampler_bit_identical():
    """The Kronecker lattice sampler (rng.QMC='kron') is keyed by
    (pixel, dim, sample) only — sharding must not change a sample. Fresh
    jits per mode (QMC is a trace-time global)."""
    from stratum_tpu.core import rng as srng

    g = builtin.cornell_box()
    scene, _ = flatten.flatten(g.root)
    node, cam = flatten.find_camera(g.root)
    w, h = 64, 32
    view = camera.make_view(node.to_world(), cam.fovy, w, h)
    cfg = integrator.RenderConfig(width=w, height=h, max_bounces=3)
    m = pmesh.make_mesh()
    srng.QMC = "kron"
    try:
        single_f = jax.jit(
            lambda sc, v, s: integrator.render_path.__wrapped__(sc, v, cfg, s)
        )
        single = np.asarray(single_f(scene, view, 5))
        # render_path_sharded is not top-level jitted: each call re-traces,
        # so the QMC global is honored directly
        sharded = np.asarray(
            pmesh.render_path_sharded(scene, view, cfg, 5, m)
        )
    finally:
        srng.QMC = "rand"
    a = single.reshape(-1, 3)
    b = sharded.reshape(-1, 3)
    np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-6)
    frac_exact = (a == b).all(axis=-1).mean()
    assert frac_exact > 0.9, frac_exact


def test_sharded_restir_temporal_bit_identical():
    """ReSTIR DI sharded (reservoir rows on tiles) must equal the
    single-chip estimator ACROSS a temporal reprojection step where the
    camera moves — prev-frame pixels land in other devices' tiles, so the
    all-gathered history table is load-bearing here."""
    from stratum_tpu.render import restir as srestir

    g = builtin.cornell_box()
    scene, _ = flatten.flatten(g.root)
    node, cam = flatten.find_camera(g.root)
    w, h = 64, 32
    view0 = camera.make_view(node.to_world(), cam.fovy, w, h)
    moved = node.to_world().copy()
    moved[0, 3] += 0.08  # slide the camera: reprojection crosses tiles
    view1 = camera.make_view(moved, cam.fovy, w, h)
    cfg = integrator.RenderConfig(width=w, height=h, max_bounces=1)
    m = pmesh.make_mesh()

    st0 = srestir.init_restir(w * h)
    st1, img1 = srestir.restir_di(scene, view0, cfg, st0, 3)
    st2, img2 = srestir.restir_di(
        scene, view1, cfg, st1, 4, prev_view=view0
    )

    sst1, simg1 = pmesh.restir_di_sharded(scene, view0, cfg, st0, 3, m)
    sst2, simg2 = pmesh.restir_di_sharded(
        scene, view1, cfg, sst1, 4, m, prev_view=view0
    )
    np.testing.assert_allclose(
        np.asarray(simg1), np.asarray(img1), rtol=1e-4, atol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(simg2), np.asarray(img2), rtol=1e-4, atol=1e-6
    )
    for a, b in zip(sst2, st2):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-6
        )
    # history actually flowed: frame-2 reservoirs carry merged M > frame 1
    assert float(np.asarray(sst2.m).max()) > float(np.asarray(sst1.m).max())


def test_sharded_restir_spatial_taps_runs():
    """spatial_taps > 0 shards the hash grid per tile — a valid estimator
    but not bit-identical; assert it runs and stays finite/close in mean."""
    from stratum_tpu.render import restir as srestir

    g = builtin.cornell_box()
    scene, _ = flatten.flatten(g.root)
    node, cam = flatten.find_camera(g.root)
    w, h = 64, 32
    view = camera.make_view(node.to_world(), cam.fovy, w, h)
    cfg = integrator.RenderConfig(width=w, height=h, max_bounces=1)
    m = pmesh.make_mesh()
    st0 = srestir.init_restir(w * h)
    _, img = srestir.restir_di(scene, view, cfg, st0, 7, spatial_taps=2)
    _, simg = pmesh.restir_di_sharded(
        scene, view, cfg, st0, 7, m, spatial_taps=2
    )
    a, b = np.asarray(img), np.asarray(simg)
    assert np.isfinite(b).all()
    assert abs(a.mean() - b.mean()) / max(a.mean(), 1e-9) < 0.15


def test_sharded_adaptive_bit_identical():
    """Adaptive sampling sharded (replicated state, sharded top-L trace)
    equals the single-chip render bit-for-bit down to reassociation."""
    from stratum_tpu.render import adaptive as sadaptive

    g = builtin.cornell_box()
    scene, _ = flatten.flatten(g.root)
    node, cam = flatten.find_camera(g.root)
    w, h = 32, 16  # n=512; L = n*frac = 128 divides 8 devices
    view = camera.make_view(node.to_world(), cam.fovy, w, h)
    cfg = integrator.RenderConfig(width=w, height=h, max_bounces=2)
    m = pmesh.make_mesh()
    img, st = sadaptive.render_adaptive(
        scene, view, cfg, 3.0, pilot=2, frac=0.25, seed0=11
    )
    simg, sst = pmesh.render_adaptive_sharded(
        scene, view, cfg, 3.0, m, pilot=2, frac=0.25, seed0=11
    )
    np.testing.assert_allclose(
        np.asarray(simg), np.asarray(img), rtol=1e-4, atol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(sst.count), np.asarray(st.count), atol=0
    )
