"""Integrator correctness tests.

The reference has no automated tests; these encode its *manual* oracles
(SURVEY.md §4): golden facts about the Cornell box, energy conservation
(white furnace), determinism of the counter-based RNG, and estimator
consistency (NEE vs BSDF-sampling vs MIS converge to the same mean — the
``BDPTDebugMode::ePathLengthContribution`` cross-check idea)."""

import dataclasses

import numpy as np
import pytest

from stratum_tpu.render import camera, integrator
from stratum_tpu.scene import builtin, flatten


@pytest.fixture(scope="module")
def cornell():
    g = builtin.cornell_box()
    scene, stats = flatten.flatten(g.root)
    node, cam = flatten.find_camera(g.root)
    return scene, node.to_world(), cam.fovy


def _render_direct(cornell, w=64, h=64, spp=4, **kw):
    scene, c2w, fovy = cornell
    view = camera.make_view(c2w, fovy, w, h)
    cfg = integrator.RenderConfig(width=w, height=h, **kw)
    return np.asarray(
        integrator.render_direct_progressive(scene, view, cfg, spp)
    )


def test_direct_cornell_walls(cornell):
    img = _render_direct(cornell, spp=8)
    left = img[20:45, 2:7].mean(axis=(0, 1))
    right = img[20:45, -7:-2].mean(axis=(0, 1))
    assert left[0] > 2.0 * left[1], f"left wall should be red: {left}"
    assert right[1] > 2.0 * right[0], f"right wall should be green: {right}"
    # light emits 15
    assert img.max() == pytest.approx(15.0, rel=1e-5)
    # floor in shadow of boxes is darker than open floor
    assert img.mean() > 0.01


def test_direct_deterministic(cornell):
    scene, c2w, fovy = cornell
    view = camera.make_view(c2w, fovy, 32, 32)
    cfg = integrator.RenderConfig(width=32, height=32)
    a = np.asarray(integrator.render_direct(scene, view, cfg, 7))
    b = np.asarray(integrator.render_direct(scene, view, cfg, 7))
    np.testing.assert_array_equal(a, b)
    c = np.asarray(integrator.render_direct(scene, view, cfg, 8))
    assert np.any(a != c)


def test_furnace_single_bounce():
    """A diffuse sphere in a constant environment: direct illumination gives
    L = albedo * Le on the sphere, Le off it."""
    g = builtin.furnace(albedo=0.6, radiance=0.5)
    scene, _ = flatten.flatten(g.root)
    node, cam = flatten.find_camera(g.root)
    view = camera.make_view(node.to_world(), cam.fovy, 48, 48)
    cfg = integrator.RenderConfig(width=48, height=48, max_bounces=1)
    img = np.asarray(
        integrator.render_path_progressive(scene, view, cfg, spp=64)
    )
    corner = img[:4, :4].mean()
    center = img[20:28, 20:28].mean()
    np.testing.assert_allclose(corner, 0.5, rtol=1e-3)
    np.testing.assert_allclose(center, 0.3, rtol=0.08)


def test_path_estimator_consistency(cornell):
    """NEE-only, BSDF-only, and MIS estimators agree in the mean
    (reference cross-check: path.hlsli:16-29 path_weight strategies)."""
    scene, c2w, fovy = cornell
    w = h = 32
    view = camera.make_view(c2w, fovy, w, h)
    imgs = {}
    for name, (nee, mis) in {
        "bsdf": (False, False),
        "nee": (True, False),
        "mis": (True, True),
    }.items():
        cfg = integrator.RenderConfig(
            width=w, height=h, max_bounces=3, use_nee=nee, use_mis=mis,
            rr_depth=100,
        )
        imgs[name] = np.asarray(
            integrator.render_path_progressive(scene, view, cfg, spp=48)
        )
    m_bsdf = imgs["bsdf"].mean()
    m_nee = imgs["nee"].mean()
    m_mis = imgs["mis"].mean()
    assert m_nee == pytest.approx(m_mis, rel=0.05)
    assert m_bsdf == pytest.approx(m_mis, rel=0.15)  # bsdf-only is noisy


def test_path_brighter_than_direct(cornell):
    """GI adds energy: path-traced mean > direct-only mean."""
    scene, c2w, fovy = cornell
    view = camera.make_view(c2w, fovy, 32, 32)
    cfg = integrator.RenderConfig(width=32, height=32, max_bounces=4)
    p = np.asarray(integrator.render_path_progressive(scene, view, cfg, 8))
    d = _render_direct(cornell, 32, 32, spp=8)
    assert p.mean() > d.mean() * 1.1


def test_wavefront_sorting_bit_identical(cornell):
    """Re-sorting the wavefront each bounce (stream-compaction analog) must
    not change a single bit: the RNG is keyed by pixel, not lane. (With
    deferred shadows OFF — the deferred wave's scatter-add order changes
    under sorting, which only reassociates float sums; covered below.)"""
    scene, c2w, fovy = cornell
    view = camera.make_view(c2w, fovy, 32, 32)
    a = np.asarray(
        integrator.render_path(
            scene, view,
            integrator.RenderConfig(
                32, 32, max_bounces=3, sort_rays=False, defer_shadows=False
            ), 7,
        )
    )
    b = np.asarray(
        integrator.render_path(
            scene, view,
            integrator.RenderConfig(
                32, 32, max_bounces=3, sort_rays=True, defer_shadows=False
            ), 7,
        )
    )
    np.testing.assert_array_equal(a, b)


def test_unrolled_bounce_scan_bit_identical(cornell):
    """cfg.unroll_bounces only changes lax.scan's unroll factor — the
    bounce body and iteration order are untouched, so images must match
    bit for bit."""
    scene, c2w, fovy = cornell
    view = camera.make_view(c2w, fovy, 32, 32)
    imgs = [
        np.asarray(
            integrator.render_path(
                scene, view,
                integrator.RenderConfig(
                    32, 32, max_bounces=3, unroll_bounces=ur
                ), 5,
            )
        )
        for ur in (1, 2, 4)
    ]
    np.testing.assert_array_equal(imgs[0], imgs[1])
    np.testing.assert_array_equal(imgs[0], imgs[2])


def test_slim_carry_bit_identical(cornell):
    """cfg.slim_carry replaces the carried uint32[N,4] RNG state with a
    scalar dim counter rebuilt from the pixel grid each bounce (and drops
    the untextured cone column) — the RNG dims consumed per bounce are
    lane-uniform by construction, so images must match bit for bit,
    including through the deferred-shadow + sorted path and the lanes
    batch (per-lane seed arrays)."""
    scene, c2w, fovy = cornell
    view = camera.make_view(c2w, fovy, 32, 32)
    for kw in (
        dict(max_bounces=3),
        dict(max_bounces=3, sort_rays=True, defer_shadows=True,
             bsdf="disney"),
    ):
        a = np.asarray(
            integrator.render_path(
                scene, view, integrator.RenderConfig(32, 32, **kw), 7
            )
        )
        b = np.asarray(
            integrator.render_path(
                scene, view,
                integrator.RenderConfig(32, 32, slim_carry=True, **kw), 7,
            )
        )
        np.testing.assert_array_equal(a, b)
    cfg = integrator.RenderConfig(32, 32, max_bounces=2)
    la, _ = integrator.render_path_lanes(scene, view, cfg, 2, 3)
    lb, _ = integrator.render_path_lanes(
        scene, view, dataclasses.replace(cfg, slim_carry=True), 2, 3
    )
    np.testing.assert_array_equal(np.asarray(la), np.asarray(lb))


def test_deferred_shadows_match_inline(cornell):
    """The deferred one-wave shadow pass (reference: eDeferShadowRays +
    trace_shadows, bdpt.hlsl:304-326) computes the same image as inline
    per-bounce shadow rays — identical samples, only the trace order and
    float summation order differ."""
    scene, c2w, fovy = cornell
    view = camera.make_view(c2w, fovy, 32, 32)
    inline = np.asarray(
        integrator.render_path(
            scene, view,
            integrator.RenderConfig(
                32, 32, max_bounces=3, defer_shadows=False
            ), 7,
        )
    )
    deferred = np.asarray(
        integrator.render_path(
            scene, view,
            integrator.RenderConfig(
                32, 32, max_bounces=3, defer_shadows=True
            ), 7,
        )
    )
    np.testing.assert_allclose(deferred, inline, rtol=1e-5, atol=1e-6)
    sorted_def = np.asarray(
        integrator.render_path(
            scene, view,
            integrator.RenderConfig(
                32, 32, max_bounces=3, defer_shadows=True, sort_rays=True
            ), 7,
        )
    )
    np.testing.assert_allclose(sorted_def, inline, rtol=1e-4, atol=1e-5)


def test_presampled_lights_consistent(cornell):
    """NEE through the presampled light tile (reference: presample_lights,
    bdpt.hlsl:86-99) converges to the same mean as per-lane sampling."""
    scene, c2w, fovy = cornell
    view = camera.make_view(c2w, fovy, 32, 32)
    spp = 48
    base_cfg = integrator.RenderConfig(32, 32, max_bounces=2)
    tile_cfg = integrator.RenderConfig(
        32, 32, max_bounces=2, presample_lights=256
    )
    base = np.asarray(
        integrator.render_path_progressive(scene, view, base_cfg, spp)
    )
    tiled = np.asarray(
        integrator.render_path_progressive(scene, view, tile_cfg, spp)
    )
    assert np.isfinite(tiled).all()
    assert tiled.mean() == pytest.approx(base.mean(), rel=0.05), (
        tiled.mean(), base.mean()
    )


def test_coherent_tiles_consistent(cornell):
    """Block-coherent NEE tile groups (reference: eCoherentSampling wave
    sampling, path.hlsli:316-318, 378-387) keep each tile row at pdf 1/T,
    so the mean matches per-lane tile sampling; only cross-lane correlation
    changes."""
    scene, c2w, fovy = cornell
    view = camera.make_view(c2w, fovy, 32, 32)
    spp = 64
    base_cfg = integrator.RenderConfig(
        32, 32, max_bounces=2, presample_lights=256
    )
    coh_cfg = integrator.RenderConfig(
        32, 32, max_bounces=2, presample_lights=256,
        coherent_tiles=16, coherent_block=128,
    )
    base = np.asarray(
        integrator.render_path_progressive(scene, view, base_cfg, spp)
    )
    coh = np.asarray(
        integrator.render_path_progressive(scene, view, coh_cfg, spp)
    )
    assert np.isfinite(coh).all()
    assert coh.mean() == pytest.approx(base.mean(), rel=0.05), (
        coh.mean(), base.mean()
    )


def test_pixel_pick(cornell):
    """pick() returns first-hit instance/prim/depth for query pixels
    (reference: VisibilityInfo pixel pick, Node/BDPT.cpp:360-371)."""
    from stratum_tpu.render import aov as saov

    scene, c2w, fovy = cornell
    view = camera.make_view(c2w, fovy, 64, 64)
    cfg = integrator.RenderConfig(64, 64)
    r = saov.pick(scene, view, cfg, [32, 0], [32, 0])
    # center pixel hits geometry; result fields agree with a full trace
    assert int(r.instance[0]) >= 0
    assert int(r.prim[0]) >= 0
    assert np.isfinite(float(r.depth[0]))
    # depth matches the G-buffer's depth at that pixel
    gb = saov.render_gbuffer(scene, view, view, cfg)
    assert float(r.depth[0]) == pytest.approx(
        float(gb.depth[32, 32]), rel=1e-5
    )
    assert int(r.instance[0]) == int(gb.instance[32, 32])


def test_wave_compaction_non_binding():
    """Caps that never bind only reorder lanes: the compacting unrolled
    loop (wave_caps, BASELINE config 5 stream compaction) must reproduce
    the scan path exactly — every lane's RNG stream is pixel-keyed and its
    radiance scatters into its own pixel once."""
    g = builtin.furnace(albedo=0.6, radiance=0.5)
    scene, _ = flatten.flatten(g.root)
    node, cam = flatten.find_camera(g.root)
    view = camera.make_view(node.to_world(), cam.fovy, 32, 32)
    base = np.asarray(
        integrator.render_path(
            scene, view,
            integrator.RenderConfig(32, 32, max_bounces=3), 7,
        )
    )
    # rays escape to the env at every bounce; by bounce 2 well under half
    # the wave is alive, so a 0.75 cap compacts without ever binding
    capped = np.asarray(
        integrator.render_path(
            scene, view,
            integrator.RenderConfig(
                32, 32, max_bounces=3,
                wave_caps=(1.0, 1.0, 0.75, 0.75),
            ), 7,
        )
    )
    np.testing.assert_allclose(capped, base, rtol=1e-5, atol=1e-7)


def test_wave_compaction_binding_unbiased(cornell):
    """When more lanes are alive than the cap, a uniform random subset
    survives with the n_alive/cap splitting weight — the estimator mean
    must match the uncapped one (RR-style unbiasedness)."""
    scene, c2w, fovy = cornell
    view = camera.make_view(c2w, fovy, 32, 32)
    spp = 64
    base = np.asarray(
        integrator.render_path_progressive(
            scene, view,
            integrator.RenderConfig(32, 32, max_bounces=3), spp,
        )
    )
    # cornell is a closed box: nearly every lane survives each bounce, so
    # a 0.5 cap at bounce 2+ genuinely terminates ~half the alive lanes
    capped = np.asarray(
        integrator.render_path_progressive(
            scene, view,
            integrator.RenderConfig(
                32, 32, max_bounces=3,
                wave_caps=(1.0, 1.0, 0.5, 0.5),
            ), spp,
        )
    )
    assert np.isfinite(capped).all()
    assert capped.mean() == pytest.approx(base.mean(), rel=0.05), (
        capped.mean(), base.mean()
    )


def test_batched_spp_matches_sequential(cornell):
    """render_path_batched (one launch, lax.scan over seeds) must equal the
    sequential per-sample average: same per-sample program, same sequential
    accumulation — only XLA fusion-level rounding may differ (~1 ulp)."""
    scene, c2w, fovy = cornell
    view = camera.make_view(c2w, fovy, 32, 32)
    cfg = integrator.RenderConfig(width=32, height=32, max_bounces=3)
    seq = np.asarray(integrator.render_path_progressive(scene, view, cfg, 3, seed0=5))
    bat, n_rays = integrator.render_path_batched(scene, view, cfg, 3, 5)
    np.testing.assert_allclose(seq, np.asarray(bat), rtol=1e-5, atol=1e-7)
    # ray count = sum of the per-sample counts
    total = 0
    for s in range(5, 8):
        _, c = integrator.render_path_with_counts(scene, view, cfg, s)
        total += int(np.asarray(c))
    assert int(np.asarray(n_rays)) == total


def test_lane_batched_spp_matches_sequential(cornell):
    """render_path_lanes (all spp as extra wavefront lanes) must equal the
    sequential per-sample average: the RNG is keyed by (pixel, seed, dim),
    so lane (s, p) computes exactly the single-sample estimator for pixel p
    with seed s — on the dense MXU path the result is lane-order
    independent (per-ray reductions only)."""
    scene, c2w, fovy = cornell
    view = camera.make_view(c2w, fovy, 32, 32)
    cfg = integrator.RenderConfig(width=32, height=32, max_bounces=3)
    seq = np.asarray(
        integrator.render_path_progressive(scene, view, cfg, 3, seed0=5)
    )
    lan, n_rays = integrator.render_path_lanes(scene, view, cfg, 3, 5)
    np.testing.assert_allclose(seq, np.asarray(lan), rtol=1e-5, atol=1e-7)
    total = 0
    for s in range(5, 8):
        _, c = integrator.render_path_with_counts(scene, view, cfg, s)
        total += int(np.asarray(c))
    assert int(np.asarray(n_rays)) == total


def test_lane_batched_spp_packet_presample(cornell):
    """Lane batching through the BVH packet tracer with presampled +
    coherent NEE: block composition changes (spp x lanes sort together),
    so hits are identical but visit-order float reassociation may differ;
    with presampling the batch shares sample 0's light tile, so compare
    against the same-tile expectation at a loose statistical tolerance."""
    scene, c2w, fovy = cornell
    view = camera.make_view(c2w, fovy, 32, 32)
    cfg = integrator.RenderConfig(
        width=32, height=32, max_bounces=3, tracer="packet",
        presample_lights=256, coherent_tiles=16, coherent_block=128,
    )
    lan, _ = integrator.render_path_lanes(scene, view, cfg, 4, 3)
    lan = np.asarray(lan)
    assert np.isfinite(lan).all()
    seq = np.asarray(
        integrator.render_path_progressive(scene, view, cfg, 16, seed0=100)
    )
    # unbiasedness: batch mean tracks an independent 16-spp estimate
    assert lan.mean() == pytest.approx(seq.mean(), rel=0.15), (
        lan.mean(), seq.mean()
    )


def test_shadow_ray_rr_unbiased(cornell):
    """Shadow-ray Russian roulette (cfg.shadow_rr): survivors carry 1/p so
    the mean must match the un-rouletted estimator; the traced shadow-ray
    count must actually drop."""
    scene, c2w, fovy = cornell
    view = camera.make_view(c2w, fovy, 32, 32)
    spp = 64
    cfg0 = integrator.RenderConfig(32, 32, max_bounces=3)
    cfg1 = integrator.RenderConfig(32, 32, max_bounces=3, shadow_rr=1.0)
    base = np.asarray(
        integrator.render_path_progressive(scene, view, cfg0, spp)
    )
    rr = np.asarray(
        integrator.render_path_progressive(scene, view, cfg1, spp)
    )
    assert np.isfinite(rr).all()
    assert rr.mean() == pytest.approx(base.mean(), rel=0.05), (
        rr.mean(), base.mean()
    )
    _, n0 = integrator.render_path_with_counts(scene, view, cfg0, 0)
    _, n1 = integrator.render_path_with_counts(scene, view, cfg1, 0)
    assert int(np.asarray(n1)) < int(np.asarray(n0))


def test_firefly_clamp(cornell):
    """clamp_indirect: off is bit-identical at a huge threshold, a tiny
    threshold strictly reduces indirect energy, direct light untouched."""
    scene, c2w, fovy = cornell
    view = camera.make_view(c2w, fovy, 32, 32)
    base_cfg = integrator.RenderConfig(32, 32, max_bounces=4)
    base = np.asarray(integrator.render_path(scene, view, base_cfg, 3))
    import dataclasses
    huge = np.asarray(integrator.render_path(
        scene, view, dataclasses.replace(base_cfg, clamp_indirect=1e9), 3))
    np.testing.assert_array_equal(base, huge)
    tiny = np.asarray(integrator.render_path(
        scene, view, dataclasses.replace(base_cfg, clamp_indirect=0.01), 3))
    assert np.isfinite(tiny).all()
    assert tiny.mean() < base.mean()
    # pure direct light (depth-0 NEE + camera-visible emission) is
    # untouched by the indirect clamp
    d_cfg = dataclasses.replace(base_cfg, max_bounces=0, clamp_indirect=0.01)
    d_base = np.asarray(integrator.render_path(
        scene, view, dataclasses.replace(d_cfg, clamp_indirect=0.0), 3))
    d_clamp = np.asarray(integrator.render_path(scene, view, d_cfg, 3))
    np.testing.assert_allclose(d_clamp, d_base, rtol=1e-6)


def test_fused_payload_matches_classic(cornell):
    """The fused slot-payload path (SceneData.slot_payload: ONE gather of
    shading row + MT coeffs + tri + material row by the winning slot) must
    reproduce the classic per-table gathers exactly: same hits from the
    tracer, and identical ShadingPoint / MaterialSample from the payload
    rows as from make_shading_point / load_material."""
    import jax.numpy as jnp

    from stratum_tpu.ops import pallas_trace
    from stratum_tpu.render.shading import (
        load_material,
        make_shading_point,
        material_from_row,
        shading_point_from_row,
    )

    scene, c2w, fovy = cornell
    view = camera.make_view(c2w, fovy, 24, 24)
    px, py = camera.pixel_grid(24, 24)
    u = jnp.full((24 * 24, 2), 0.5, jnp.float32)
    o, d = camera.generate_rays(view, px, py, u, 24, 24)
    fat = scene.fat_bvh
    feat = pallas_trace.pack_leaf_features(fat)
    h0 = pallas_trace.pallas_closest(fat, feat, o, d, block=256,
                                     interpret=True)
    h1 = pallas_trace.finalize_hit(
        scene.slot_payload, o, d,
        pallas_trace.pallas_closest(fat, feat, o, d, block=256,
                                    interpret=True,
                                    slot_payload=scene.slot_payload),
    )
    np.testing.assert_array_equal(np.asarray(h0.tri), np.asarray(h1.tri))
    np.testing.assert_array_equal(np.asarray(h0.t), np.asarray(h1.t))
    np.testing.assert_array_equal(np.asarray(h0.bary), np.asarray(h1.bary))
    assert h0.payload is None and h1.payload is not None

    sp0 = make_shading_point(scene.geo, h1.tri, h1.bary, d)
    sp1 = shading_point_from_row(h1.payload[:, 0:32], h1.tri, h1.bary, d)
    for a, b in zip(sp0, sp1):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    m0 = load_material(scene.materials, sp0.material)
    hitm = np.asarray(h1.tri) >= 0
    m1 = material_from_row(h1.payload[:, 64:88])
    for a, b in zip(m0, m1):
        np.testing.assert_array_equal(
            np.asarray(a)[hitm], np.asarray(b)[hitm]
        )
