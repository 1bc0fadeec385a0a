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


@pytest.mark.slow
def test_lt_matches_pt_on_smooth_normals():
    """LT == PT on a scene with interpolated (shading != geometric) normals:
    requires the shading-normal adjoint factor on the light walk and the
    terminator softening on the camera walk to agree (path.hlsli:67-98;
    Veach 5.17). A tessellated-sphere scene exercises ns != ng everywhere."""
    import numpy as np

    from stratum_tpu.render import camera, integrator, lighttrace
    from stratum_tpu.scene import builtin, flatten

    g = builtin.material_spheres(stacks=10, slices=20)
    # drop the glass sphere (delta-ish transport converges too slowly for
    # a cheap consistency test) by making it diffuse
    from stratum_tpu.scene.graph import EnvironmentComponent, SpherePrimitive

    for n, prim in g.root.find_in_descendants(SpherePrimitive):
        if n.name == "sphere_2":
            prim.material.transmission = 0.0
            prim.material.roughness = 0.6
    # drop the environment: light tracing emits from area lights only
    # (like the reference's sample_photons), so env-lit transport is not
    # part of the LT estimator
    for n, _env in list(g.root.find_in_descendants(EnvironmentComponent)):
        n.components.clear()
    scene, _ = flatten.flatten(g.root)
    node, cam = flatten.find_camera(g.root)
    w = h = 40
    view = camera.make_view(node.to_world(), cam.fovy, w, h)
    cfg = integrator.RenderConfig(
        width=w, height=h, max_bounces=3, bsdf="disney"
    )
    spp = 40
    pt = np.asarray(
        integrator.render_path_progressive(scene, view, cfg, spp)
    )
    lt = np.asarray(
        lighttrace.render_lt_progressive(scene, view, cfg, spp)
    )
    assert np.isfinite(lt).all()
    # means agree (bidirectional estimators of the same measurement)
    assert abs(lt.mean() - pt.mean()) / pt.mean() < 0.12, (
        lt.mean(), pt.mean()
    )


def test_terminator_softening_no_hard_edge():
    """The terminator factor is 1 when ns == ng and rolls off smoothly."""
    import jax.numpy as jnp
    import numpy as np

    from stratum_tpu.render.shading import shadow_terminator_factor

    n = jnp.asarray([[0.0, 0.0, 1.0]])
    # identical normals: exactly 1 for any wi above the horizon
    for z in (0.9, 0.5, 0.1):
        wi = jnp.asarray([[np.sqrt(1 - z * z), 0.0, z]])
        f = float(shadow_terminator_factor(n, n, wi)[0])
        assert f == pytest.approx(1.0, abs=1e-5), (z, f)
    # tilted shading normal: factor decreases toward the horizon, stays
    # in [0, 1], and is continuous (no hard clip)
    ns = jnp.asarray([[np.sin(0.3), 0.0, np.cos(0.3)]])
    vals = []
    for z in np.linspace(0.05, 0.9, 12):
        wi = jnp.asarray([[-np.sqrt(1 - z * z), 0.0, z]])
        vals.append(float(shadow_terminator_factor(n, ns, wi)[0]))
    vals = np.asarray(vals)
    assert ((vals >= 0) & (vals <= 1)).all()
    assert (np.diff(vals) > -1e-6).all()  # monotone away from the horizon
