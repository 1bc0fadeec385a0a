"""FlyCamera controller (reference: Node/FlyCamera.cpp:18-64): basis
matches look_at, pitch clamps, keys move in camera space, scroll scales
speed, and the node transform updates."""

import numpy as np

from stratum_tpu.core import transform as xform
from stratum_tpu.render.flycamera import FlyCamera
from stratum_tpu.scene.graph import NodeGraph, TransformComponent


def test_basis_matches_look_at():
    cam = FlyCamera(position=np.asarray([1.0, 2.0, 3.0], np.float32))
    for yaw, pitch in [(0.0, 0.0), (0.7, 0.3), (-2.1, -0.9), (3.0, 1.2)]:
        cam.yaw, cam.pitch = yaw, pitch
        c2w = cam.update(dt=0.0)
        fwd = c2w[:, 2]
        ref = np.asarray(
            xform.look_at(cam.position, cam.position + fwd)
        )
        np.testing.assert_allclose(c2w, ref, atol=1e-5)


def test_moves_in_camera_space():
    cam = FlyCamera(speed=2.0)
    cam.yaw = np.pi / 2  # facing world +x
    cam.update(dt=0.5, keys=["w"])
    np.testing.assert_allclose(
        cam.position, [1.0, 0.0, 0.0], atol=1e-5
    )
    cam.update(dt=0.5, keys=["d"])  # camera right = world -z at this yaw
    np.testing.assert_allclose(
        cam.position, [1.0, 0.0, -1.0], atol=1e-5
    )
    # diagonal motion is normalized (reference normalizes the move vector)
    cam2 = FlyCamera(speed=1.0)
    cam2.update(dt=1.0, keys=["w", "d"])
    assert abs(np.linalg.norm(cam2.position) - 1.0) < 1e-5


def test_pitch_clamp_and_scroll():
    cam = FlyCamera()
    cam.update(dt=0.0, mouse_delta=(0.0, -1e6))  # drag way up
    assert cam.pitch < np.pi / 2
    cam.update(dt=0.0, mouse_delta=(0.0, 1e6))  # drag way down
    assert cam.pitch > -np.pi / 2
    s0 = cam.speed
    cam.update(dt=0.0, scroll=2.0)
    assert cam.speed > s0
    # rotation only applies while the rotate button is held
    yaw0 = cam.yaw
    cam.update(dt=0.0, mouse_delta=(100.0, 0.0), rotating=False)
    assert cam.yaw == yaw0


def test_writes_node_transform():
    g = NodeGraph()
    n = g.root.add_child("camera")
    cam = FlyCamera(node=n)
    c2w = cam.update(dt=0.1, keys=["w"])
    tc = n.find(TransformComponent)
    assert tc is not None
    np.testing.assert_allclose(tc.matrix, c2w)
