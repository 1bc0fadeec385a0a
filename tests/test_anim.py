"""Animation tick + object motion vectors (reference: Scene.cpp:302-311
animation tick; 398-427 motion transforms -> prev-UV reprojection)."""

import numpy as np
import pytest

from stratum_tpu.render import aov, camera, integrator
from stratum_tpu.scene import builtin, flatten
from stratum_tpu.scene.graph import AnimationComponent


def _animated_cornell():
    g = builtin.cornell_box(boxes=True)
    for n in g.root.descendants():
        if n.name == "tall_box":
            m0 = np.eye(3, 4, dtype=np.float32)
            m0[:, 3] = (265, 0, 296)
            m1 = m0.copy()
            m1[:, 3] = (165, 0, 296)  # slides 100 units in x over 1s
            n.components.clear()
            n.make_component(
                AnimationComponent(
                    times=np.asarray([0.0, 1.0], np.float32),
                    matrices=np.stack([m0, m1]),
                )
            )
            from stratum_tpu.scene.graph import MeshPrimitive
            from stratum_tpu.scene.material import Material

            from stratum_tpu.scene.builtin import _box

            pos, idx = _box((0, 0, 0), (165, 330, 165))
            n.make_component(
                MeshPrimitive(
                    positions=pos, indices=idx,
                    material=Material(
                        base_color=np.full(3, 0.73, np.float32)
                    ),
                )
            )
    return g


def test_animation_tick_moves_geometry():
    g = _animated_cornell()
    s0, _ = flatten.flatten(g.root, time=0.0)
    s1, _ = flatten.flatten(g.root, time=1.0)
    p0 = np.asarray(s0.geo.positions)
    p1 = np.asarray(s1.geo.positions)
    moved = np.abs(p0 - p1).max()
    assert moved == pytest.approx(100.0, abs=1e-3), moved
    # halfway interpolates linearly
    sh, _ = flatten.flatten(g.root, time=0.5)
    ph = np.asarray(sh.geo.positions)
    assert np.abs((p0 - ph)).max() == pytest.approx(50.0, abs=1e-3)


def test_motion_vectors_feed_prev_uv():
    """prev_uv of pixels on the animated box reflects OBJECT motion even
    with a static camera; static walls report their own pixel."""
    g = _animated_cornell()
    scene, _ = flatten.flatten(g.root, time=0.5, prev_time=0.4)
    node, cam = flatten.find_camera(g.root)
    w = h = 48
    view = camera.make_view(node.to_world(), cam.fovy, w, h)
    cfg = integrator.RenderConfig(width=w, height=h)
    gbuf = aov.render_gbuffer(scene, view, view, cfg)
    prev_uv = np.asarray(gbuf.prev_uv)
    inst = np.asarray(gbuf.instance)
    cur_uv = np.stack(
        np.meshgrid(
            (np.arange(w) + 0.5) / w, (np.arange(h) + 0.5) / h
        ),
        axis=-1,
    )
    names = flatten.flatten(g.root, time=0.5)[1].instance_names
    box_id = names.index("tall_box")
    on_box = inst == box_id
    assert on_box.sum() > 20
    dx = prev_uv[..., 0] - cur_uv[..., 0]
    # the box moves toward -x over time, so its previous position is at
    # LARGER x: prev_uv.x > uv.x on box pixels
    assert dx[on_box].mean() > 1e-3, dx[on_box].mean()
    static = (inst >= 0) & ~on_box & (prev_uv[..., 0] >= 0)
    np.testing.assert_allclose(
        prev_uv[static], cur_uv[static], atol=2e-2
    )
