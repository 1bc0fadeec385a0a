"""Camera views and primary-ray generation.

TPU-native analog of the reference's ViewData (src/Shaders/scene.h:96-112) and
the camera-ray construction at the top of the ``sample_visibility`` kernel
(src/Shaders/kernels/renderers/bdpt.hlsl:151-186): pixel -> NDC ->
``back_project`` to the near plane -> normalized camera-space direction ->
world via the camera-to-world transform.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp
import numpy as np

from stratum_tpu.core import transform as xform
from stratum_tpu.core import math as smath


class ViewData(NamedTuple):
    """One render view (pytree). Image size stays out of the pytree — it is a
    static jit parameter (reference keeps it in image_min/max, scene.h:103)."""

    camera_to_world: jnp.ndarray  # f32 [3,4]
    world_to_camera: jnp.ndarray  # f32 [3,4]
    projection: xform.ProjectionData


def make_view(camera_to_world, fovy: float, width: int, height: int, znear=0.001):
    c2w = jnp.asarray(camera_to_world, jnp.float32)
    proj = xform.make_perspective(fovy, aspect=height / width, znear=znear)
    return ViewData(
        camera_to_world=c2w,
        world_to_camera=xform.inverse(c2w),
        projection=proj,
    )


def look_at_view(eye, target, fovy, width, height, up=(0.0, 1.0, 0.0)):
    return make_view(xform.look_at(eye, target, up), fovy, width, height)


def pixel_grid(width: int, height: int):
    """Integer pixel coords px[H*W], py[H*W] in row-major order."""
    py, px = jnp.meshgrid(
        jnp.arange(height, dtype=jnp.uint32),
        jnp.arange(width, dtype=jnp.uint32),
        indexing="ij",
    )
    return px.reshape(-1), py.reshape(-1)


def tile_dims(width: int, height: int, th: int = 32, tw: int = 64):
    """Largest tile dims (<= th x tw) that evenly divide the image, or None
    if the image is too small to tile."""
    while th > 1 and height % th:
        th //= 2
    while tw > 1 and width % tw:
        tw //= 2
    if th * tw < 64:
        return None
    return th, tw


def pixel_grid_tiled(width: int, height: int, th: int, tw: int):
    """Pixel coords in tile-major order: consecutive lanes form compact
    th x tw screen tiles, so fixed-size ray blocks get compact frusta (the
    coherence the reference buys with its Morton thread remap,
    bdpt_util.hlsli:76-83). Pure layout transform — zero data movement at
    trace time, and the pixel-keyed RNG makes results identical to the
    row-major order."""
    px, py = pixel_grid(width, height)
    px = px.reshape(height // th, th, width // tw, tw)
    py = py.reshape(height // th, th, width // tw, tw)
    px = jnp.transpose(px, (0, 2, 1, 3)).reshape(-1)
    py = jnp.transpose(py, (0, 2, 1, 3)).reshape(-1)
    return px, py


def untile_image(flat, width: int, height: int, th: int, tw: int):
    """Inverse of pixel_grid_tiled's ordering: [N, C] -> [H, W, C]."""
    c = flat.shape[-1:]
    img = flat.reshape((height // th, width // tw, th, tw) + c)
    return jnp.transpose(img, (0, 2, 1, 3, 4)).reshape((height, width) + c)


def generate_rays(view: ViewData, px, py, jitter, width: int, height: int):
    """Primary rays for pixel coords px/py [N] with subpixel jitter [N, 2] in
    [0,1). Returns (origin [N,3], direction [N,3]).

    Matches the reference's uv convention: uv = (pixel + jitter)/extent,
    ndc = uv*2-1 with y flipped so +y is up in world
    (bdpt.hlsl:165-170 back_project usage).
    """
    u = (px.astype(jnp.float32) + jitter[..., 0]) / width
    v = (py.astype(jnp.float32) + jitter[..., 1]) / height
    ndc = jnp.stack([u * 2.0 - 1.0, -(v * 2.0 - 1.0)], axis=-1)
    p_cam = xform.back_project(view.projection, ndc)
    d_cam = smath.normalize(p_cam)
    origin = jnp.broadcast_to(view.camera_to_world[..., 3], d_cam.shape)
    direction = xform.transform_vector(view.camera_to_world, d_cam)
    return origin, smath.normalize(direction)


def sensor_importance(view: ViewData, world_pos, width: int, height: int):
    """Project a world point into the view; returns (pixel_xy f32 [.,2],
    in_frustum bool, We-like weight G-term for light tracing)
    (reference: connect_view sensor importance, path.hlsli:536-616).
    """
    p_cam = xform.transform_point(view.world_to_camera, world_pos)
    clip = xform.project_point(view.projection, p_cam)
    w = clip[..., 3]
    ndc = clip[..., :2] / jnp.maximum(jnp.abs(w), 1e-20)[..., None]
    in_front = w > 0
    inside = (
        in_front
        & (ndc[..., 0] >= -1.0)
        & (ndc[..., 0] <= 1.0)
        & (ndc[..., 1] >= -1.0)
        & (ndc[..., 1] <= 1.0)
    )
    pix_x = (ndc[..., 0] * 0.5 + 0.5) * width
    pix_y = (-ndc[..., 1] * 0.5 + 0.5) * height
    # importance: 1 / (A_sensor * cos^4 theta) measure conversion factor
    dist2 = smath.length_squared(p_cam)
    cos_theta = jnp.abs(p_cam[..., 2]) / jnp.maximum(jnp.sqrt(dist2), 1e-20)
    lens_area = view.projection.sensor_area
    num_pixels = width * height
    pdf_w = dist2 / jnp.maximum(
        lens_area * cos_theta * cos_theta * cos_theta, 1e-20
    )
    importance = pdf_w * num_pixels
    return jnp.stack([pix_x, pix_y], axis=-1), inside, importance
