"""Renderer debug views: the estimator-debugging microscope.

TPU-native analog of the reference's ``BDPTDebugMode`` set (13 views,
src/Shaders/bdpt.h:177-193, rendered by bdpt.hlsl:190-260): first-hit
G-buffer channels, the env-sampling PDF view, per-path-length contribution
images, and the ReSTIR reservoir-weight view. Exposed on the CLI as
``--debug=<mode>`` (list in DEBUG_MODES).
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp

from stratum_tpu.core import math as smath
from stratum_tpu.render import aov as saov
from stratum_tpu.render import camera as scamera
from stratum_tpu.render import integrator as sintegrator
from stratum_tpu.render import lights as slights

DEBUG_MODES = (
    "albedo",            # eAlbedo
    "normal",            # eShadingNormal (0.5*n+0.5)
    "depth",             # eDepth (normalized)
    "instance",          # eInstanceIndex hashed to color
    "uv",                # eTextureCoordinate
    "env_pdf",           # eEnvironmentSamplePDF per camera direction
    "env_test",          # eEnvironmentSampleTest: Le * pdf (importance map)
    "path_length_N",     # ePathLengthContribution (N = edge count, e.g. 2)
    "reservoir_w",       # eReservoirWeight (ReSTIR DI contribution weight)
)


def _hash_colors(idx):
    """Stable pseudo-random color per id (reference: viridis-of-hash)."""
    from stratum_tpu.core import rng as srng

    h = srng.pcg(idx.astype(jnp.uint32))
    r = (h & 0xFF).astype(jnp.float32) / 255.0
    g = ((h >> 8) & 0xFF).astype(jnp.float32) / 255.0
    b = ((h >> 16) & 0xFF).astype(jnp.float32) / 255.0
    return jnp.stack([r, g, b], axis=-1)


def render_debug(scene, view, cfg, mode: str, seed: int = 0, spp: int = 8):
    """Render one debug view as [H, W, 3] float."""
    if mode.startswith("path_length_"):
        edges = int(mode.rsplit("_", 1)[1])
        dcfg = dataclasses.replace(cfg, debug_path_edges=edges)
        return sintegrator.render_path_progressive(
            scene, view, dcfg, spp, seed
        )
    if mode == "reservoir_w":
        from stratum_tpu.render import restir as srestir

        state = srestir.init_restir(cfg.width * cfg.height)
        for s in range(spp):
            state, _ = srestir.restir_di_jit(scene, view, cfg, state, seed + s)
        from stratum_tpu.core import reservoir as sres

        w = smath.safe_div(
            state.total_weight,
            state.m * jnp.maximum(state.target_pdf, 1e-20),
        )
        img = jnp.broadcast_to(
            w.reshape(cfg.height, cfg.width, 1), (cfg.height, cfg.width, 3)
        )
        return img

    gbuf = saov.render_gbuffer(scene, view, view, cfg)
    if mode == "albedo":
        return gbuf.albedo
    if mode == "normal":
        return gbuf.normal * 0.5 + 0.5
    if mode == "depth":
        d = jnp.where(jnp.isfinite(gbuf.depth), gbuf.depth, 0.0)
        dmax = jnp.maximum(jnp.max(d), 1e-6)
        return jnp.broadcast_to(
            (d / dmax)[..., None], d.shape + (3,)
        )
    if mode == "instance":
        return _hash_colors(jnp.maximum(gbuf.instance, 0)) * (
            gbuf.instance >= 0
        )[..., None].astype(jnp.float32)
    if mode == "uv":
        px, py = scamera.pixel_grid(cfg.width, cfg.height)
        jitter = jnp.full((px.shape[0], 2), 0.5, jnp.float32)
        origin, direction = scamera.generate_rays(
            view, px, py, jitter, cfg.width, cfg.height
        )
        from stratum_tpu.render.integrator import _trace_fns
        from stratum_tpu.render.shading import make_shading_point

        trace_closest, _ = _trace_fns(scene, cfg)
        hit = trace_closest(origin, direction)
        sp = make_shading_point(scene.geo, hit.tri, hit.bary, direction)
        uvc = jnp.concatenate(
            [sp.uv % 1.0, jnp.zeros_like(sp.uv[..., :1])], axis=-1
        )
        return jnp.where(
            hit.hit[..., None], uvc, 0.0
        ).reshape(cfg.height, cfg.width, 3)
    if mode in ("env_pdf", "env_test"):
        # per-camera-direction env NEE pdf / importance (reference:
        # eEnvironmentSamplePDF / eEnvironmentSampleTest)
        px, py = scamera.pixel_grid(cfg.width, cfg.height)
        jitter = jnp.full((px.shape[0], 2), 0.5, jnp.float32)
        _, direction = scamera.generate_rays(
            view, px, py, jitter, cfg.width, cfg.height
        )
        pdf = slights.environment_pdf_w(scene, direction)
        if mode == "env_pdf":
            img = jnp.broadcast_to(pdf[..., None], pdf.shape + (3,))
        else:
            img = slights.eval_environment(scene, direction) * pdf[..., None]
        return img.reshape(cfg.height, cfg.width, 3)
    raise ValueError(
        f"unknown debug mode {mode!r}; known: {DEBUG_MODES}"
    )
