"""Affine transforms and camera projections.

TPU-native analog of the reference's shared transform header
(src/Shaders/transform.h). Transforms are row-major ``[..., 3, 4]`` affine
matrices; projections follow the reference's reversed-z, infinite-far
perspective convention (transform.h:109-148) so that loaded scenes and camera
parameters are interchangeable. Camera space looks down +z.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp
import numpy as np

from stratum_tpu.core import math as smath


# ---------------------------------------------------------------------------
# 3x4 affine transforms (transform.h:7-104)
# ---------------------------------------------------------------------------

def identity_transform(dtype=jnp.float32):
    return jnp.eye(3, 4, dtype=dtype)


# NOTE: 3-vector transforms are written as explicit multiply-adds rather than
# einsum/matmul: a 3-wide contraction wastes the 128x128 MXU and, worse, JAX's
# default matmul precision on TPU-like backends is bf16 which is far too coarse
# for transform chains. Elementwise FMAs run on the VPU at full f32.

def _linear_apply(m, v):
    return (
        m[..., :, 0] * v[..., None, 0]
        + m[..., :, 1] * v[..., None, 1]
        + m[..., :, 2] * v[..., None, 2]
    )


def transform_point(m, p):
    """Apply [..., 3, 4] affine to points [..., 3]."""
    return _linear_apply(m[..., :3], p) + m[..., 3]


def transform_vector(m, v):
    """Apply the linear part only (directions)."""
    return _linear_apply(m[..., :3], v)


def transform_normal(m_inv, n):
    """Transform a normal with the *inverse* transform (multiply transposed)."""
    a = m_inv[..., :3]
    return (
        a[..., 0, :] * n[..., None, 0]
        + a[..., 1, :] * n[..., None, 1]
        + a[..., 2, :] * n[..., None, 2]
    )


def compose(a, b):
    """Composite transform: (a ∘ b)(p) = a(b(p)). (transform.h:88-104)."""
    al = a[..., :3]
    bl = b[..., :3]
    lin = jnp.stack(
        [_linear_apply(al, bl[..., :, j]) for j in range(3)], axis=-1
    )
    trans = _linear_apply(al, b[..., 3]) + a[..., 3]
    return jnp.concatenate([lin, trans[..., None]], axis=-1)


def inverse(m):
    """Inverse of an affine 3x4 via 3x3 adjugate (transform.h:25-45)."""
    a = m[..., :3]
    # a[..., j] is column j; A^{-1} rows are (v1×v2, v2×v0, v0×v1) / det.
    c0 = jnp.cross(a[..., 1], a[..., 2])
    c1 = jnp.cross(a[..., 2], a[..., 0])
    c2 = jnp.cross(a[..., 0], a[..., 1])
    det = smath.dot(a[..., 0], c0)[..., None, None]
    inv_lin = jnp.stack([c0, c1, c2], axis=-2) / det
    inv_trans = -_linear_apply(inv_lin, m[..., 3])
    return jnp.concatenate([inv_lin, inv_trans[..., None]], axis=-1)


def from_translation(t):
    t = jnp.asarray(t, dtype=jnp.float32)
    return jnp.concatenate([jnp.eye(3, dtype=jnp.float32), t[..., None]], axis=-1)


def from_scale(s):
    s = jnp.broadcast_to(jnp.asarray(s, dtype=jnp.float32), (3,))
    return jnp.concatenate(
        [jnp.diag(s), jnp.zeros((3, 1), dtype=jnp.float32)], axis=-1
    )


def from_rotation_matrix(r, t=None):
    r = jnp.asarray(r, dtype=jnp.float32)
    t = jnp.zeros(3, jnp.float32) if t is None else jnp.asarray(t, jnp.float32)
    return jnp.concatenate([r, t[..., None]], axis=-1)


def rotation_x(angle):
    c, s = jnp.cos(angle), jnp.sin(angle)
    return jnp.asarray([[1, 0, 0], [0, c, -s], [0, s, c]], dtype=jnp.float32)


def rotation_y(angle):
    c, s = jnp.cos(angle), jnp.sin(angle)
    return jnp.asarray([[c, 0, s], [0, 1, 0], [-s, 0, c]], dtype=jnp.float32)


def rotation_z(angle):
    c, s = jnp.cos(angle), jnp.sin(angle)
    return jnp.asarray([[c, -s, 0], [s, c, 0], [0, 0, 1]], dtype=jnp.float32)


def look_at(eye, target, up=(0.0, 1.0, 0.0)) -> jnp.ndarray:
    """Camera-to-world transform: camera at eye looking toward target, +z fwd."""
    eye = jnp.asarray(eye, jnp.float32)
    target = jnp.asarray(target, jnp.float32)
    up = jnp.asarray(up, jnp.float32)
    fwd = smath.normalize(target - eye)
    right = smath.normalize(jnp.cross(up, fwd))
    true_up = jnp.cross(fwd, right)
    lin = jnp.stack([right, true_up, fwd], axis=-1)  # columns = camera axes
    return jnp.concatenate([lin, eye[..., None]], axis=-1)


# ---------------------------------------------------------------------------
# projections (transform.h:109-168): reversed-z, infinite far plane
# ---------------------------------------------------------------------------

class ProjectionData(NamedTuple):
    """Pytree-compatible projection parameters (transform.h:109-117)."""

    scale: jnp.ndarray  # [2]
    offset: jnp.ndarray  # [2]
    near_plane: jnp.ndarray  # scalar; sign encodes handedness like reference
    far_plane: jnp.ndarray  # scalar (orthographic only)
    sensor_area: jnp.ndarray  # scalar; pixel solid-angle normalization
    vertical_fov: jnp.ndarray  # scalar; < 0 means orthographic


def make_perspective(fovy, aspect, offset=(0.0, 0.0), znear=0.001) -> ProjectionData:
    """Perspective projection (transform.h:159-168). aspect = height/width
    scaling such that scale.x = aspect * scale.y matches the reference."""
    sy = 1.0 / np.tan(float(fovy) / 2.0)
    sx = float(aspect) * sy
    sensor_area = 4.0 / max(sx * sy, 1e-12)  # NDC [-1,1]^2 mapped to lens plane
    return ProjectionData(
        scale=jnp.asarray([sx, sy], jnp.float32),
        offset=jnp.asarray(offset, jnp.float32),
        near_plane=jnp.asarray(znear, jnp.float32),
        far_plane=jnp.asarray(0.0, jnp.float32),
        sensor_area=jnp.asarray(sensor_area, jnp.float32),
        vertical_fov=jnp.asarray(fovy, jnp.float32),
    )


def make_orthographic(size, offset=(0.0, 0.0), znear=0.0, zfar=512.0) -> ProjectionData:
    size = np.asarray(size, np.float32)
    return ProjectionData(
        scale=jnp.asarray(2.0 / size, jnp.float32),
        offset=jnp.asarray(offset, jnp.float32),
        near_plane=jnp.asarray(znear, jnp.float32),
        far_plane=jnp.asarray(zfar, jnp.float32),
        sensor_area=jnp.asarray(float(size[0] * size[1]), jnp.float32),
        vertical_fov=jnp.asarray(-1.0, jnp.float32),
    )


def back_project(proj: ProjectionData, ndc_xy):
    """NDC [-1,1]^2 -> camera-space point on the near plane
    (transform.h:136-148, perspective branch)."""
    sign_n = jnp.sign(proj.near_plane)
    x = proj.near_plane * (ndc_xy[..., 0] * sign_n - proj.offset[0]) / proj.scale[0]
    y = proj.near_plane * (ndc_xy[..., 1] * sign_n - proj.offset[1]) / proj.scale[1]
    z = jnp.broadcast_to(proj.near_plane, x.shape)
    ortho_x = (ndc_xy[..., 0] - proj.offset[0]) / proj.scale[0]
    ortho_y = (ndc_xy[..., 1] - proj.offset[1]) / proj.scale[1]
    is_ortho = proj.vertical_fov < 0
    return jnp.stack(
        [
            jnp.where(is_ortho, ortho_x, x),
            jnp.where(is_ortho, ortho_y, y),
            z,
        ],
        axis=-1,
    )


def project_point(proj: ProjectionData, p):
    """Camera-space point -> clip coords [..., 4] (transform.h:120-135).

    Perspective uses reversed-z with infinite far: after divide,
    z_ndc = |near| / z_cam.
    """
    sign_n = jnp.sign(proj.near_plane)
    persp = jnp.stack(
        [
            p[..., 0] * proj.scale[0] + p[..., 2] * proj.offset[0],
            p[..., 1] * proj.scale[1] + p[..., 2] * proj.offset[1],
            jnp.broadcast_to(jnp.abs(proj.near_plane), p[..., 0].shape),
            p[..., 2] * sign_n,
        ],
        axis=-1,
    )
    ortho = jnp.stack(
        [
            p[..., 0] * proj.scale[0] + proj.offset[0],
            p[..., 1] * proj.scale[1] + proj.offset[1],
            (p[..., 2] - proj.far_plane) / (proj.near_plane - proj.far_plane),
            jnp.ones_like(p[..., 0]),
        ],
        axis=-1,
    )
    return jnp.where(proj.vertical_fov < 0, ortho, persp)
