"""Analytic spheres: exact hits, first-class sphere lights, cone sampling
(reference: procedural spheres intersection.hlsli:105-117 + solid-angle
cone light sampling light.hlsli:58-121; VERDICT r1 item 7)."""

import numpy as np
import pytest

from stratum_tpu.render import camera, integrator
from stratum_tpu.scene import builtin, flatten
from stratum_tpu.scene.graph import (
    MeshPrimitive,
    NodeGraph,
    SpherePrimitive,
    TransformComponent,
)
from stratum_tpu.scene.material import Material


def test_analytic_hit_exact():
    """Hit distance of the analytic tracer equals the quadratic solution."""
    import jax.numpy as jnp

    from stratum_tpu.ops import spheres as sspheres

    center = jnp.asarray([[0.0, 0.0, 5.0], [2.0, 0.0, 9.0]], jnp.float32)
    radius = jnp.asarray([1.0, 0.5], jnp.float32)
    o = jnp.zeros((3, 3), jnp.float32)
    to_c = np.asarray([2.0, 0.0, 9.0]) / np.sqrt(85.0)
    d = jnp.asarray(
        [[0, 0, 1.0], to_c, [0, 1.0, 0]], jnp.float32
    )
    t, sid, uv = sspheres.intersect_spheres(center, radius, o, d)
    assert float(t[0]) == pytest.approx(4.0, abs=1e-5)
    assert int(sid[0]) == 0
    # second ray aims at the second sphere's center: |c| - r
    assert float(t[1]) == pytest.approx(np.sqrt(85.0) - 0.5, rel=1e-5)
    assert int(sid[1]) == 1
    assert int(sid[2]) == -1  # miss


def test_furnace_analytic_energy():
    """White furnace with an ANALYTIC sphere: exact albedo*env at the
    sphere, env elsewhere — no tessellation bias."""
    g = builtin.furnace()
    for _n, prim in g.root.find_in_descendants(SpherePrimitive):
        prim.analytic = True
    scene, _ = flatten.flatten(g.root)
    assert scene.spheres.num_spheres == 1
    node, cam = flatten.find_camera(g.root)
    view = camera.make_view(node.to_world(), cam.fovy, 48, 48)
    cfg = integrator.RenderConfig(
        width=48, height=48, max_bounces=8, rr_depth=99
    )
    img = np.asarray(integrator.render_path_progressive(scene, view, cfg, 32))
    assert img[0, 0, 0] == pytest.approx(0.5, abs=1e-5)  # env exact
    # sphere pixels: geometric series limit = albedo * env = 0.4
    assert img[20:28, 20:28].mean() == pytest.approx(0.4, abs=0.01)


def _sphere_light_box(analytic: bool, stacks=24, slices=48):
    """A gray box lit by a single emissive sphere."""
    g = NodeGraph()
    s = 10.0
    pos = np.asarray(
        [[-s, 0, -s], [-s, 0, s], [s, 0, s], [s, 0, -s]], np.float32
    )
    idx = np.asarray([[0, 1, 2], [0, 2, 3]], np.int32)
    floor = g.root.add_child("floor")
    floor.make_component(
        MeshPrimitive(
            positions=pos, indices=idx,
            material=Material(base_color=np.full(3, 0.6, np.float32)),
        )
    )
    lamp = g.root.add_child("lamp")
    t = np.eye(3, 4, dtype=np.float32)
    t[:, 3] = (0.0, 4.0, 0.0)
    lamp.make_component(TransformComponent(matrix=t))
    lamp.make_component(
        SpherePrimitive(
            radius=0.5,
            material=Material(
                base_color=np.zeros(3, np.float32),
                emission=np.full(3, 40.0, np.float32),
            ),
            analytic=analytic,
            stacks=stacks,
            slices=slices,
        )
    )
    from stratum_tpu.core import transform as xform
    from stratum_tpu.scene.graph import CameraComponent

    cam = g.root.add_child("camera")
    c2w = np.asarray(xform.look_at((0.0, 3.0, -8.0), (0.0, 1.0, 0.0)))
    cam.make_component(TransformComponent(matrix=c2w))
    cam.make_component(CameraComponent(fovy=np.radians(45.0)))
    return g


def test_sphere_light_matches_tessellated():
    """Analytic sphere light converges to the same image as the finely
    tessellated version (VERDICT item 7 'tessellation -> infinity')."""
    w = h = 32
    spp = 64
    imgs = {}
    for analytic in (False, True):
        g = _sphere_light_box(analytic, stacks=48, slices=96)
        scene, _ = flatten.flatten(g.root)
        node, cam = flatten.find_camera(g.root)
        view = camera.make_view(node.to_world(), cam.fovy, w, h)
        cfg = integrator.RenderConfig(width=w, height=h, max_bounces=2)
        imgs[analytic] = np.asarray(
            integrator.render_path_progressive(scene, view, cfg, spp)
        )
    a, t = imgs[True], imgs[False]
    mask = t.max(axis=-1) < 5.0  # exclude the emitter disk itself
    assert a[mask].mean() == pytest.approx(t[mask].mean(), rel=0.05), (
        a[mask].mean(), t[mask].mean()
    )


def test_cone_sampling_beats_area_variance():
    """Solid-angle cone sampling of the sphere light has lower variance
    than uniform-area sampling of the tessellated equivalent at equal spp
    (VERDICT item 7 'beats it in variance')."""
    w = h = 32
    # high-spp analytic reference
    g = _sphere_light_box(True)
    scene_a, _ = flatten.flatten(g.root)
    node, cam = flatten.find_camera(g.root)
    view = camera.make_view(node.to_world(), cam.fovy, w, h)
    cfg = integrator.RenderConfig(width=w, height=h, max_bounces=2)
    ref = np.asarray(
        integrator.render_path_progressive(scene_a, view, cfg, 128)
    )
    g2 = _sphere_light_box(False)
    scene_t, _ = flatten.flatten(g2.root)
    one_a = np.asarray(integrator.render_path(scene_a, view, cfg, 777))
    one_t = np.asarray(integrator.render_path(scene_t, view, cfg, 777))
    mask = ref.max(axis=-1) < 5.0
    err_a = ((one_a - ref) ** 2)[mask].mean()
    err_t = ((one_t - ref) ** 2)[mask].mean()
    assert err_a < err_t * 0.7, (err_a, err_t)


def test_sphere_shadow():
    """An analytic sphere occludes shadow rays (any-hit path)."""
    g = _sphere_light_box(True)
    # blocker sphere between floor center and the lamp
    blk = g.root.add_child("blocker")
    t = np.eye(3, 4, dtype=np.float32)
    t[:, 3] = (0.0, 2.0, 0.0)
    blk.make_component(TransformComponent(matrix=t))
    blk.make_component(
        SpherePrimitive(
            radius=0.6,
            material=Material(base_color=np.full(3, 0.2, np.float32)),
            analytic=True,
        )
    )
    scene, _ = flatten.flatten(g.root)
    node, cam = flatten.find_camera(g.root)
    w = h = 32
    view = camera.make_view(node.to_world(), cam.fovy, w, h)
    cfg = integrator.RenderConfig(width=w, height=h, max_bounces=1)
    img = np.asarray(integrator.render_path_progressive(scene, view, cfg, 24))
    g0 = _sphere_light_box(True)
    scene0, _ = flatten.flatten(g0.root)
    img0 = np.asarray(
        integrator.render_path_progressive(scene0, view, cfg, 24)
    )
    # the blocker casts a shadow: some floor pixels darken to <30% while
    # the rest of the image stays comparable
    lum = img.mean(axis=-1)
    lum0 = img0.mean(axis=-1)
    lit = lum0 > 0.05
    ratio = lum[lit] / lum0[lit]
    assert ratio.min() < 0.3, ratio.min()
    assert (ratio < 0.6).sum() >= 5  # a real shadow region, not one pixel
