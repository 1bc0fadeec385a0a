"""Participating-media tests: delta tracking against analytic homogeneous
solutions (reference: medium.hlsli delta_track / HG sampling)."""

import jax.numpy as jnp
import numpy as np
import pytest

import stratum_tpu.core.rng as srng
from stratum_tpu.core import math as smath
from stratum_tpu.render import medium as smedium


def _homogeneous(sigma=2.0, g=0.0, albedo=1.0):
    d = np.full((4, 4, 4), sigma, np.float32)
    return smedium.build_media(
        [
            dict(
                density=d,
                box_lo=(0, 0, 0),
                box_hi=(1, 1, 1),
                albedo=np.full(3, albedo, np.float32),
                g=g,
            )
        ]
    )


def test_free_flight_distribution():
    """In a homogeneous medium the scatter distance is Exp(sigma)."""
    sigma = 2.0
    media = _homogeneous(sigma)
    n = 100_000
    o = jnp.broadcast_to(jnp.asarray([0.5, 0.5, 0.0]), (n, 3))
    d = jnp.broadcast_to(jnp.asarray([0.0, 0.0, 1.0]), (n, 3))
    st = srng.rng_init(jnp.arange(n, dtype=jnp.uint32), 1, 0)
    t_max = jnp.full((n,), 1.0, jnp.float32)
    t, slot, w, st = smedium.sample_free_flight(media, o, d, t_max, st)
    t = np.asarray(t)
    scattered = np.isfinite(t)
    # P(scatter within L) = 1 - exp(-sigma L)
    expect = 1.0 - np.exp(-sigma * 1.0)
    assert scattered.mean() == pytest.approx(expect, abs=0.01)
    # conditional distance distribution: mean of truncated exponential
    ts = t[scattered]
    mean_expect = 1.0 / sigma - 1.0 * np.exp(-sigma) / (1 - np.exp(-sigma))
    assert ts.mean() == pytest.approx(mean_expect, rel=0.03)


def test_transmittance_analytic():
    sigma = 1.5
    media = _homogeneous(sigma)
    n = 50_000
    o = jnp.broadcast_to(jnp.asarray([0.5, 0.5, -0.5]), (n, 3))
    d = jnp.broadcast_to(jnp.asarray([0.0, 0.0, 1.0]), (n, 3))
    st = srng.rng_init(jnp.arange(n, dtype=jnp.uint32), 2, 0)
    t_max = jnp.full((n,), 3.0, jnp.float32)  # crosses the full unit box
    tr, st = smedium.transmittance(media, o, d, t_max, st)
    assert float(jnp.mean(tr)) == pytest.approx(np.exp(-sigma), rel=0.02)


def test_hg_phase_normalization(rng_np):
    """Integral of HG over the sphere = 1, and sampling is consistent."""
    n = 200_000
    for g in (0.0, 0.4, -0.6):
        u = rng_np.random((n, 2)).astype(np.float32)
        wi = smath.sample_uniform_sphere(jnp.asarray(u[:, 0]), jnp.asarray(u[:, 1]))
        wo = jnp.broadcast_to(jnp.asarray([0.0, 0.0, 1.0]), (n, 3))
        ph = smedium.hg_phase(g, smath.dot(-wo, wi))
        integral = float(jnp.mean(ph) * 4 * np.pi)
        assert integral == pytest.approx(1.0, rel=0.02), (g, integral)
        # sampled directions reproduce the phase mean cosine = g
        wi_s, pdf = smedium.sample_hg(
            jnp.full((n,), g), wo,
            jnp.asarray(u[:, 0]), jnp.asarray(u[:, 1]),
        )
        mean_cos = float(jnp.mean(smath.dot(-wo, wi_s)))
        assert mean_cos == pytest.approx(g, abs=0.02), (g, mean_cos)


def test_hg_sampled_density_matches_pdf(rng_np):
    """The histogram of sampled cos(theta) must match the returned pdf —
    this is the sample/eval consistency the reference's medium.hlsli pair
    has (catches sign-convention mismatches MIS depends on)."""
    n = 400_000
    for g in (0.7, -0.5, 0.2):
        u = rng_np.random((n, 2)).astype(np.float32)
        wo = jnp.broadcast_to(jnp.asarray([0.0, 0.0, 1.0]), (n, 3))
        wi, pdf = smedium.sample_hg(
            jnp.full((n,), g), wo, jnp.asarray(u[:, 0]), jnp.asarray(u[:, 1])
        )
        cos_t = np.asarray(smath.dot(-wo, wi))
        pdf = np.asarray(pdf)
        edges = np.linspace(-1.0, 1.0, 41)
        hist, _ = np.histogram(cos_t, bins=edges)
        # density over cos: p(c) = 2*pi*phase (azimuthal integral)
        centers = 0.5 * (edges[:-1] + edges[1:])
        expect = (
            2.0 * np.pi
            * np.asarray(smedium.hg_phase(g, jnp.asarray(centers)))
            * (edges[1] - edges[0])
            * n
        )
        mask = expect > 200  # enough mass for a stable ratio
        ratio = hist[mask] / expect[mask]
        assert np.all(np.abs(ratio - 1.0) < 0.15), (g, ratio)
        # and the returned pdf equals the phase value at the sampled angle
        ph = np.asarray(smedium.hg_phase(g, jnp.asarray(cos_t)))
        assert np.allclose(pdf, ph, rtol=2e-3, atol=1e-6)


@pytest.mark.slow
def test_medium_nee_vs_bsdf_only():
    """Estimator consistency in fog: NEE-on and NEE-off renders of the foggy
    Cornell must converge to the same mean (the medium vertex now gets a
    phase-function NEE connection; reference: next_vertex medium dispatch,
    path.hlsli:1047-1075)."""
    from stratum_tpu.render import camera, integrator
    from stratum_tpu.scene import builtin, flatten
    from stratum_tpu.scene.graph import MediumComponent

    g = builtin.cornell_box(boxes=False)
    fog = g.root.add_child("fog")
    fog.make_component(
        MediumComponent(
            density=np.full((4, 4, 4), 0.003, np.float32),
            box_lo=np.asarray([0, 0, 0], np.float32),
            box_hi=np.asarray([555, 555, 555], np.float32),
            albedo=np.full(3, 0.8, np.float32),
            g=0.4,
        )
    )
    scene, _ = flatten.flatten(g.root)
    node, cam = flatten.find_camera(g.root)
    view = camera.make_view(node.to_world(), cam.fovy, 24, 24)
    spp = 48
    cfg_nee = integrator.RenderConfig(width=24, height=24, max_bounces=3)
    cfg_off = integrator.RenderConfig(
        width=24, height=24, max_bounces=3, use_nee=False
    )
    img_nee = np.asarray(
        integrator.render_path_progressive(scene, view, cfg_nee, spp)
    )
    img_off = np.asarray(
        integrator.render_path_progressive(scene, view, cfg_off, spp)
    )
    assert np.isfinite(img_nee).all() and np.isfinite(img_off).all()
    # means agree within Monte Carlo noise of the BSDF-only estimator
    assert img_nee.mean() == pytest.approx(img_off.mean(), rel=0.15)


def test_foggy_cornell_renders():
    """End-to-end: a fog box in the Cornell box produces a finite image that
    is dimmer on the walls (extinction) and glows near the light."""
    from stratum_tpu.render import camera, integrator
    from stratum_tpu.scene import builtin, flatten
    from stratum_tpu.scene.graph import MediumComponent

    g = builtin.cornell_box(boxes=False)
    fog = g.root.add_child("fog")
    fog.make_component(
        MediumComponent(
            density=np.full((8, 8, 8), 0.0015, np.float32),
            box_lo=np.asarray([0, 0, 0], np.float32),
            box_hi=np.asarray([555, 555, 555], np.float32),
            albedo=np.full(3, 0.9, np.float32),
        )
    )
    scene, _ = flatten.flatten(g.root)
    assert float(scene.media.majorant[0]) > 0
    node, cam = flatten.find_camera(g.root)
    view = camera.make_view(node.to_world(), cam.fovy, 32, 32)
    cfg = integrator.RenderConfig(width=32, height=32, max_bounces=3)
    img = np.asarray(integrator.render_path_progressive(scene, view, cfg, 8))
    assert np.isfinite(img).all()
    assert img.mean() > 0.01
    # clear render for comparison
    g2 = builtin.cornell_box(boxes=False)
    scene2, _ = flatten.flatten(g2.root)
    clear = np.asarray(
        integrator.render_path_progressive(scene2, view, cfg, 8)
    )
    # fog scatters light: image differs meaningfully from the clear one
    assert np.abs(img - clear).mean() > 0.002


def test_build_media_adaptive_resolution():
    """Brick resolution adapts to the source grid (GRID_RES..MAX_RES) and
    downsampling box-averages instead of strided subsampling (VERDICT r2:
    hi-res volumes aliased at fixed 64^3)."""
    from stratum_tpu.render import medium as smedium

    hi = np.zeros((200, 200, 200), np.float32)
    hi[::2] = 1.0  # stride pattern that a subsample would alias to 0 or 1
    media = smedium.build_media(
        [dict(density=hi, box_lo=(0, 0, 0), box_hi=(1, 1, 1))]
    )
    r = media.density.shape[1]
    assert r == smedium.MAX_RES, r
    d = np.asarray(media.density[0], np.float32)
    # box filter preserves the 0.5 mean; a strided subsample gives 0 or 1
    assert abs(d.mean() - 0.5) < 0.02, d.mean()
    # small grids keep the default resolution
    media2 = smedium.build_media(
        [dict(density=np.ones((8, 8, 8), np.float32),
              box_lo=(0, 0, 0), box_hi=(1, 1, 1))]
    )
    assert media2.density.shape[1] == smedium.GRID_RES
    # 8 slots (reference gVolumeCount, scene.h:27)
    assert media2.density.shape[0] == 8
