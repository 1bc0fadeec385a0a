"""SVGF-style denoiser: temporal reprojection + variance-guided a-trous.

TPU-native analog of the reference Denoiser
(src/Node/Denoiser.{hpp,cpp}:117-274 driving three kernels):
- temporal_accumulation.hlsl: bilinear 4-tap reprojection of history gated
  by instance / normal cos / depth tests (temporal_accumulation.hlsl:80-99),
  exponential moving average capped by ``history_limit``, and first/second
  luminance moments (119-138);
- estimate_variance.hlsl: variance from moments with a spatial fallback +
  boost for young pixels (74-102);
- atrous.hlsl: N edge-aware a-trous wavelet iterations with luminance /
  depth / normal edge-stopping weights (82-117) and kernel dilation 2^i.

Everything is dense [H, W] image math (shifts via padding + static slicing)
— exactly the layout XLA fuses best; the only gathers are the 4 history
taps of reprojection.
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple

import jax.numpy as jnp
import numpy as np

from stratum_tpu.core import math as smath
from stratum_tpu.render.aov import GBuffer


@dataclasses.dataclass(frozen=True)
class DenoiseConfig:
    history_limit: float = 16.0  # EMA cap (gHistoryLimit)
    atrous_iterations: int = 5
    sigma_luminance: float = 4.0  # luminance edge sigma boost
    sigma_normal: float = 128.0  # normal edge-stopping power
    sigma_depth: float = 1.0
    variance_boost: float = 8.0  # young-pixel variance boost
    demodulate_albedo: bool = True
    filter_type: str = "atrous"  # a-trous tap pattern (reference:
                                 # FilterKernelType, filter_type.h:8-16):
                                 # "atrous" | "box3" | "box5" |
                                 # "subsampled" | "box3_subsampled" |
                                 # "box5_subsampled"
    history_tap: int = 0  # >0: after a-trous iteration (history_tap-1),
                          # write the filtered color back into the temporal
                          # history so next frame accumulates on top of a
                          # partially filtered image (reference: copy_rgb
                          # history tap, atrous.hlsl:264-271 +
                          # Denoiser.cpp:246-260)
    debug_mode: str = "none"  # denoiser debug view (reference:
                              # DenoiserDebugMode, denoiser.h:10-16):
                              # "none" | "sample_count" | "variance" |
                              # "weight_sum"


class DenoiseState(NamedTuple):
    """Cross-frame history (reference: per-frame pooled images recycled at
    Denoiser.cpp:129-148)."""

    color: jnp.ndarray  # [H,W,3] accumulated (demodulated) color
    moments: jnp.ndarray  # [H,W,2] E[l], E[l^2]
    history: jnp.ndarray  # [H,W] accumulated frame count
    normal: jnp.ndarray  # [H,W,3] prev normals (for gating)
    depth: jnp.ndarray  # [H,W]
    instance: jnp.ndarray  # [H,W]


def init_state(height: int, width: int) -> DenoiseState:
    return DenoiseState(
        color=jnp.zeros((height, width, 3), jnp.float32),
        moments=jnp.zeros((height, width, 2), jnp.float32),
        history=jnp.zeros((height, width), jnp.float32),
        normal=jnp.zeros((height, width, 3), jnp.float32),
        depth=jnp.full((height, width), jnp.inf, jnp.float32),
        instance=jnp.full((height, width), -1, jnp.int32),
    )


def _tap(img, yi, xi):
    h, w = img.shape[:2]
    yi = jnp.clip(yi, 0, h - 1)
    xi = jnp.clip(xi, 0, w - 1)
    return img[yi, xi]


def temporal_accumulate(
    state: DenoiseState, radiance, gbuf: GBuffer, cfg: DenoiseConfig,
    with_aux: bool = False,
):
    """Reproject history and blend (temporal_accumulation.hlsl). Returns
    (new_state, integrated_color, variance); with ``with_aux`` also a dict
    of debug quantities (reprojection weight sum, history length)."""
    h, w = radiance.shape[:2]
    color_in = radiance
    if cfg.demodulate_albedo:
        color_in = radiance / jnp.maximum(gbuf.albedo, 1e-3)
    lum = smath.luminance(color_in)
    moments_in = jnp.stack([lum, lum * lum], axis=-1)

    # 4-tap bilinear history lookup at prev_uv
    uv = gbuf.prev_uv
    valid_uv = (uv[..., 0] >= 0) & (uv[..., 1] >= 0)
    x = uv[..., 0] * w - 0.5
    y = uv[..., 1] * h - 0.5
    x0 = jnp.floor(x).astype(jnp.int32)
    y0 = jnp.floor(y).astype(jnp.int32)
    fx = x - x0
    fy = y - y0
    weights = [
        (1 - fx) * (1 - fy),
        fx * (1 - fy),
        (1 - fx) * fy,
        fx * fy,
    ]
    offsets = [(0, 0), (0, 1), (1, 0), (1, 1)]
    acc_c = jnp.zeros_like(color_in)
    acc_m = jnp.zeros_like(moments_in)
    acc_h = jnp.zeros((h, w), jnp.float32)
    acc_w = jnp.zeros((h, w), jnp.float32)
    for (dy, dx), wgt in zip(offsets, weights):
        yi = y0 + dy
        xi = x0 + dx
        # tap validity gates (temporal_accumulation.hlsl:80-99)
        same_inst = _tap(state.instance, yi, xi) == gbuf.instance
        n_ok = (
            smath.dot(_tap(state.normal, yi, xi), gbuf.normal)
            > np.cos(np.radians(2.0))
        )
        zp = _tap(state.depth, yi, xi)
        z_ok = jnp.abs(zp - gbuf.depth) < 0.1 * jnp.maximum(
            gbuf.depth, 1e-3
        )
        ok = valid_uv & same_inst & n_ok & z_ok & (yi >= 0) & (yi < h) & (
            xi >= 0
        ) & (xi < w)
        tw = jnp.where(ok, wgt, 0.0)
        acc_c += _tap(state.color, yi, xi) * tw[..., None]
        acc_m += _tap(state.moments, yi, xi) * tw[..., None]
        acc_h += _tap(state.history, yi, xi) * tw
        acc_w += tw
    has_hist = acc_w > 1e-3
    inv_w = jnp.where(has_hist, 1.0 / jnp.maximum(acc_w, 1e-3), 0.0)
    prev_c = acc_c * inv_w[..., None]
    prev_m = acc_m * inv_w[..., None]
    prev_n = acc_h * inv_w

    n = jnp.where(has_hist, jnp.minimum(prev_n + 1.0, cfg.history_limit), 1.0)
    alpha = 1.0 / n
    color = jnp.where(
        has_hist[..., None],
        prev_c + (color_in - prev_c) * alpha[..., None],
        color_in,
    )
    moments = jnp.where(
        has_hist[..., None],
        prev_m + (moments_in - prev_m) * alpha[..., None],
        moments_in,
    )
    variance = estimate_variance(moments, n, lum, cfg)
    new_state = DenoiseState(
        color=color,
        moments=moments,
        history=n,
        normal=gbuf.normal,
        depth=gbuf.depth,
        instance=gbuf.instance,
    )
    if with_aux:
        return new_state, color, variance, {
            "weight_sum": acc_w, "history": n,
        }
    return new_state, color, variance


def _shift(img, dy, dx):
    """Clamp-padded static shift."""
    h, w = img.shape[:2]
    pad = [(max(dy, 0), max(-dy, 0)), (max(dx, 0), max(-dx, 0))] + [
        (0, 0)
    ] * (img.ndim - 2)
    out = jnp.pad(img, pad, mode="edge")
    return out[
        max(-dy, 0) : max(-dy, 0) + h, max(-dx, 0) : max(-dx, 0) + w
    ]


def estimate_variance(moments, history, lum, cfg: DenoiseConfig):
    """Variance from moments, with a spatial moment fallback for young
    pixels (estimate_variance.hlsl:74-102)."""
    var_t = jnp.maximum(moments[..., 1] - moments[..., 0] ** 2, 0.0)
    # spatial 5x5 moments for short history
    m1 = jnp.zeros_like(lum)
    m2 = jnp.zeros_like(lum)
    for dy in range(-2, 3):
        for dx in range(-2, 3):
            l = _shift(lum[..., None], dy, dx)[..., 0]
            m1 += l
            m2 += l * l
    m1 /= 25.0
    m2 /= 25.0
    var_s = jnp.maximum(m2 - m1 * m1, 0.0)
    young = history < 4.0
    boost = jnp.where(young, cfg.variance_boost / jnp.maximum(history, 1.0), 1.0)
    return jnp.where(young, var_s, var_t) * boost


_ATROUS_W = np.asarray([1.0, 2.0 / 3.0, 1.0 / 6.0], np.float32)  # B3 spline


def _filter_taps(filter_type: str, it: int):
    """(dy, dx, kernel weight) taps for one filter iteration, center
    included (reference tap generators: atrous.hlsl:121-207 + the
    box-then-subsampled composites switched in main, atrous.hlsl:232-249).
    ``subsampled`` alternates its 2-step axis by iteration parity."""
    if filter_type == "atrous":
        return [
            (dy, dx, float(_ATROUS_W[abs(dy)] * _ATROUS_W[abs(dx)]))
            for dy in range(-2, 3)
            for dx in range(-2, 3)
        ]
    if filter_type == "box3":
        return [(dy, dx, 1.0) for dy in (-1, 0, 1) for dx in (-1, 0, 1)]
    if filter_type == "box5":
        return [(dy, dx, 1.0) for dy in range(-2, 3) for dx in range(-2, 3)]
    if filter_type == "subsampled":
        taps = [
            (0, 0, 1.0),
            (-1, 1, 1.0), (1, 1, 1.0), (-1, -1, 1.0), (1, -1, 1.0),
        ]
        if it % 2 == 0:
            taps += [(0, -2, 1.0), (0, 2, 1.0)]
        else:
            taps += [(-2, 0, 1.0), (2, 0, 1.0)]
        return taps
    if filter_type == "box3_subsampled":
        return _filter_taps("box3" if it == 0 else "subsampled", it)
    if filter_type == "box5_subsampled":
        return _filter_taps("box5" if it == 0 else "subsampled", it)
    raise ValueError(f"unknown filter_type {filter_type!r}")


def atrous_filter(color, variance, gbuf: GBuffer, cfg: DenoiseConfig):
    """Edge-aware a-trous iterations (atrous.hlsl:63-207). Returns
    (filtered color, history-tap color): the tap is the output of iteration
    cfg.history_tap-1 (None when disabled), which denoise() writes back
    into the temporal history (reference: copy_rgb, atrous.hlsl:264-271).
    Color stays demodulated if cfg.demodulate_albedo."""
    normal = gbuf.normal
    # only foreground pixels are filtered (reference: the isinf(z_center)
    # gate, atrous.hlsl:231); background depth is clamped to a finite
    # sentinel so inf-inf never reaches the weights, and the final color at
    # background pixels is restored from the input
    foreground = jnp.isfinite(gbuf.depth)
    depth = jnp.where(foreground, gbuf.depth, 3.0e37)
    input_color = color
    # depth gradient magnitude for the depth edge weight
    dzdx = jnp.abs(_shift(depth[..., None], 0, 1)[..., 0] - depth)
    dzdy = jnp.abs(_shift(depth[..., None], 1, 0)[..., 0] - depth)
    dz = jnp.maximum(dzdx, dzdy) + 1e-4

    tap_color = None
    for it in range(cfg.atrous_iterations):
        step = 1 << it
        # 3x3-gaussian-prefiltered variance for the luminance sigma
        gvar = jnp.zeros_like(variance)
        gw = 0.0
        for dy in (-1, 0, 1):
            for dx in (-1, 0, 1):
                k = [1.0, 2.0, 1.0][dy + 1] * [1.0, 2.0, 1.0][dx + 1]
                gvar += k * _shift(variance[..., None], dy, dx)[..., 0]
                gw += k
        sigma_l = cfg.sigma_luminance * jnp.sqrt(gvar / gw) + 1e-6
        lum_c = smath.luminance(color)

        acc = jnp.zeros_like(color)
        acc_v = jnp.zeros_like(variance)
        wsum = jnp.zeros_like(variance)
        for dy, dx, kw in _filter_taps(cfg.filter_type, it):
            oy, ox = dy * step, dx * step
            c_n = _shift(color, oy, ox)
            v_n = _shift(variance[..., None], oy, ox)[..., 0]
            n_n = _shift(normal, oy, ox)
            z_n = _shift(depth[..., None], oy, ox)[..., 0]
            l_n = smath.luminance(c_n)
            w_l = jnp.exp(-jnp.abs(l_n - lum_c) / sigma_l)
            w_n = jnp.maximum(smath.dot(n_n, normal), 0.0) ** cfg.sigma_normal
            w_z = jnp.exp(
                -jnp.abs(z_n - depth)
                / (cfg.sigma_depth * dz * (abs(dy) + abs(dx) + 1e-3) * step + 1e-6)
            )
            wgt = kw * w_l * w_n * w_z
            acc += c_n * wgt[..., None]
            acc_v += v_n * wgt * wgt
            wsum += wgt
        color = acc / jnp.maximum(wsum, 1e-6)[..., None]
        color = jnp.where(foreground[..., None], color, input_color)
        variance = acc_v / jnp.maximum(wsum * wsum, 1e-6)
        if it + 1 == cfg.history_tap:
            tap_color = color
    return color, tap_color


def denoise(
    state: DenoiseState, radiance, gbuf: GBuffer, cfg: DenoiseConfig | None = None
):
    """Full SVGF pass. Returns (new_state, denoised_radiance). With
    cfg.debug_mode != "none" the second output is the debug visualization
    instead (reference: Denoiser.cpp:273 returns mDebugImage)."""
    cfg = cfg or DenoiseConfig()
    new_state, color, variance, aux = temporal_accumulate(
        state, radiance, gbuf, cfg, with_aux=True
    )
    filtered, tap_color = atrous_filter(color, variance, gbuf, cfg)
    if tap_color is not None:
        # copy_rgb history tap (atrous.hlsl:264-271): next frame's temporal
        # history starts from the partially filtered color; moments/history
        # count stay untouched (the reference keeps AccumColor.w)
        new_state = new_state._replace(color=tap_color)
    if cfg.demodulate_albedo:
        filtered = filtered * jnp.maximum(gbuf.albedo, 1e-3)
    if cfg.debug_mode != "none":
        # DenoiserDebugMode (denoiser.h:10-16; written in
        # temporal_accumulation.hlsl:133-146)
        if cfg.debug_mode == "sample_count":
            dbg = smath.viridis(
                jnp.clip(aux["history"] / max(cfg.history_limit, 1.0), 0, 1)
            )
        elif cfg.debug_mode == "variance":
            dbg = smath.viridis(jnp.clip(variance, 0.0, 1.0))
        elif cfg.debug_mode == "weight_sum":
            dbg = smath.viridis(jnp.clip(aux["weight_sum"], 0.0, 1.0))
        else:
            raise ValueError(f"unknown debug_mode {cfg.debug_mode!r}")
        return new_state, dbg
    return new_state, filtered
