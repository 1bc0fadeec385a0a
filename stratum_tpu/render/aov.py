"""AOV / G-buffer pass: first-hit geometry + demodulation data.

TPU-native analog of the reference's ``sample_visibility`` G-buffer writes
(src/Shaders/kernels/renderers/bdpt.hlsl:151-300): albedo, emission-included
radiance split, VisibilityInfo (instance id + octahedral normal,
scene.h:114-123), DepthInfo (z, dz — scene.h:124-128) and the prev-frame
reprojected UV used by the temporal denoiser: camera motion via prev_view
AND object motion via per-instance motion transforms evaluated by
flatten(time=, prev_time=) from AnimationComponents (Scene.cpp:302-311,
398-427).
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from stratum_tpu.core import math as smath
from stratum_tpu.core import transform as xform
from stratum_tpu.render import camera as scamera
from stratum_tpu.render.integrator import RenderConfig, _trace_fns
from stratum_tpu.render.shading import (
    apply_textures,
    load_material,
    make_shading_point,
)
from stratum_tpu.scene.schema import SceneData


class GBuffer(NamedTuple):
    """Per-pixel first-hit data, image-shaped [H, W, ...]."""

    albedo: jnp.ndarray  # [H,W,3] base color at first hit (1 for miss)
    normal: jnp.ndarray  # [H,W,3] shading normal (0 for miss)
    depth: jnp.ndarray  # [H,W] camera-space hit distance (inf for miss)
    instance: jnp.ndarray  # [H,W] instance id (-1 for miss)
    prev_uv: jnp.ndarray  # [H,W,2] position in the PREVIOUS view, uv in [0,1]


def render_gbuffer(
    scene: SceneData, view, prev_view, cfg: RenderConfig
) -> GBuffer:
    """Trace pixel centers once and build the G-buffer. Uses pixel centers
    (no jitter) so the buffers are stable across frames."""
    px, py = scamera.pixel_grid(cfg.width, cfg.height)
    flat = gbuffer_flat(scene, view, prev_view, cfg, px, py)
    h, w = cfg.height, cfg.width
    return GBuffer(
        albedo=flat.albedo.reshape(h, w, 3),
        normal=flat.normal.reshape(h, w, 3),
        depth=flat.depth.reshape(h, w),
        instance=flat.instance.reshape(h, w),
        prev_uv=flat.prev_uv.reshape(h, w, 2),
    )


def gbuffer_flat(
    scene: SceneData, view, prev_view, cfg: RenderConfig, px, py
) -> GBuffer:
    """Per-pixel G-buffer rows for arbitrary pixel coords (flat [N, ...])
    — the shard_map-able core (parallel/mesh.py shards px/py tiles)."""
    jitter = jnp.full((px.shape[0], 2), 0.5, jnp.float32)
    origin, direction = scamera.generate_rays(
        view, px, py, jitter, cfg.width, cfg.height
    )
    trace_closest, _ = _trace_fns(scene, cfg)
    hit = trace_closest(origin, direction)
    sp = make_shading_point(scene.geo, hit.tri, hit.bary, direction)
    mat = load_material(scene.materials, sp.material)
    if scene.textures.resolution > 1:
        mat = apply_textures(
            mat, scene.materials, scene.textures, sp.material, sp.uv
        )
    miss = ~hit.hit
    # emissive surfaces demodulate by 1 — their radiance is emission, not
    # albedo-modulated reflection (the reference's demodulate-albedo option
    # likewise only divides reflected light, temporal_accumulation.hlsl:112)
    emissive = smath.luminance(mat.emission) > 0.0
    albedo = jnp.where(
        (miss | emissive)[..., None], 1.0, mat.base_color
    )
    normal = jnp.where(miss[..., None], 0.0, sp.shading_normal)
    depth = jnp.where(miss, jnp.inf, hit.t)
    instance = jnp.where(miss, -1, sp.instance)
    # object motion: map the hit to its PREVIOUS-frame world position via
    # the per-instance motion transform (reference: motion transforms fed
    # into the prev-UV reprojection, Scene.cpp:398-427 + bdpt.hlsl G-buffer
    # writes); identity rows make this a no-op for static scenes
    mot = scene.instance_motion[jnp.maximum(sp.instance, 0)]  # [N, 3, 4]
    prev_pos = (
        jnp.einsum("nij,nj->ni", mot[:, :, :3], sp.position) + mot[:, :, 3]
    )
    pix, inside, _ = scamera.sensor_importance(
        prev_view, prev_pos, cfg.width, cfg.height
    )
    prev_uv = jnp.where(
        (miss | ~inside)[..., None],
        -1.0,
        pix / jnp.asarray([cfg.width, cfg.height], jnp.float32),
    )
    return GBuffer(
        albedo=albedo,
        normal=normal,
        depth=depth,
        instance=instance,
        prev_uv=prev_uv,
    )


class PickResult(NamedTuple):
    """Per-query first-hit data from pick() — the selection-readback analog
    of the reference's pixel pick (Node/BDPT.cpp:360-371: VisibilityInfo
    readback at the cursor -> selected node, + 823-835 gui wiring)."""

    instance: jnp.ndarray  # i32 [Q] (-1 = miss)
    prim: jnp.ndarray  # i32 [Q] triangle id, or T + sphere id (-1 = miss)
    material: jnp.ndarray  # i32 [Q] material row (-1 = miss)
    depth: jnp.ndarray  # f32 [Q] hit distance (inf = miss)
    position: jnp.ndarray  # f32 [Q,3] world hit position (0 = miss)
    uv: jnp.ndarray  # f32 [Q,2] surface uv
    normal: jnp.ndarray  # f32 [Q,3] shading normal


def pick(scene: SceneData, view, cfg: RenderConfig, px, py) -> PickResult:
    """Query pixels (px, py) -> instance / primitive / depth by tracing
    their center rays. ``px``/``py`` are int arrays (or scalars) in pixel
    coordinates. Cheap: Q rays through the configured tracer."""
    px = jnp.atleast_1d(jnp.asarray(px, jnp.uint32))
    py = jnp.atleast_1d(jnp.asarray(py, jnp.uint32))
    jitter = jnp.full((px.shape[0], 2), 0.5, jnp.float32)
    origin, direction = scamera.generate_rays(
        view, px, py, jitter, cfg.width, cfg.height
    )
    trace_closest, _ = _trace_fns(scene, cfg)
    hit = trace_closest(origin, direction)
    sp = make_shading_point(scene.geo, hit.tri, hit.bary, direction)
    miss = ~hit.hit
    return PickResult(
        instance=jnp.where(miss, -1, sp.instance),
        prim=jnp.where(miss, -1, hit.tri),
        material=jnp.where(miss, -1, sp.material),
        depth=jnp.where(miss, jnp.inf, hit.t),
        position=jnp.where(miss[..., None], 0.0, sp.position),
        uv=jnp.where(miss[..., None], 0.0, sp.uv),
        normal=jnp.where(miss[..., None], 0.0, sp.shading_normal),
    )
