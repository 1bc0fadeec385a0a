"""Tone mapping operators + auto-exposure.

TPU-native analog of src/Shaders/kernels/tonemap.hlsl: the 10-operator set
(tonemap.hlsl:189-223, enum TonemapMode tonemap.h:8-21), the max-reduction
used for exposure normalization (``reduce_max``, tonemap.hlsl:105-152) and the
cross-frame exposure EMA (tonemap.hlsl:168-181). The reference's wave/atomic
fixed-point max becomes a plain jnp reduction.
"""

from __future__ import annotations

import enum

import jax.numpy as jnp
import numpy as np

from stratum_tpu.core import math as smath


class TonemapMode(enum.Enum):
    RAW = "raw"
    REINHARD = "reinhard"
    REINHARD_EXTENDED = "reinhard_extended"
    REINHARD_LUMINANCE = "reinhard_luminance"
    REINHARD_LUMINANCE_EXTENDED = "reinhard_luminance_extended"
    UNCHARTED2 = "uncharted2"
    FILMIC = "filmic"
    ACES = "aces"
    ACES_APPROX = "aces_approx"
    VIRIDIS_R = "viridis_r"
    VIRIDIS_LENGTH = "viridis_length"


def _reinhard(c):
    return c / (1.0 + c)


def _reinhard_extended(c, max_c):
    return c * (1.0 + c / jnp.maximum(max_c * max_c, 1e-8)) / (1.0 + c)


def _reinhard_luminance(c):
    l = smath.luminance(c)[..., None]
    return c / (1.0 + l)


def _reinhard_luminance_extended(c, max_l):
    l = smath.luminance(c)[..., None]
    num = l * (1.0 + l / jnp.maximum(max_l * max_l, 1e-8))
    return c * smath.safe_div(num, l * (1.0 + l))


def _uncharted2_partial(c):
    a, b, cc, d, e, f = 0.15, 0.50, 0.10, 0.20, 0.02, 0.30
    return ((c * (a * c + cc * b) + d * e) / (c * (a * c + b) + d * f)) - e / f


def _uncharted2(c):
    exposure_bias = 2.0
    w = 11.2
    return _uncharted2_partial(c * exposure_bias) / _uncharted2_partial(
        jnp.asarray(w)
    )


def _filmic(c):
    # Hejl-Burgess-Dawson approximate filmic (includes gamma)
    x = jnp.maximum(c - 0.004, 0.0)
    out = (x * (6.2 * x + 0.5)) / (x * (6.2 * x + 1.7) + 0.06)
    # undo the baked sRGB-ish 2.2 gamma so all operators return linear
    return out ** 2.2


_ACES_IN = np.array(
    [
        [0.59719, 0.35458, 0.04823],
        [0.07600, 0.90834, 0.01566],
        [0.02840, 0.13383, 0.83777],
    ],
    np.float32,
)
_ACES_OUT = np.array(
    [
        [1.60475, -0.53108, -0.07367],
        [-0.10208, 1.10813, -0.00605],
        [-0.00327, -0.07276, 1.07602],
    ],
    np.float32,
)


def _aces_fitted(c):
    v = jnp.einsum("ij,...j->...i", jnp.asarray(_ACES_IN), c)
    a = v * (v + 0.0245786) - 0.000090537
    b = v * (0.983729 * v + 0.4329510) + 0.238081
    return jnp.clip(jnp.einsum("ij,...j->...i", jnp.asarray(_ACES_OUT), a / b), 0.0, 1.0)


def _aces_approx(c):
    v = c * 0.6
    a, b, cc, d, e = 2.51, 0.03, 2.43, 0.59, 0.14
    return jnp.clip((v * (a * v + b)) / (v * (cc * v + d) + e), 0.0, 1.0)


def reduce_max_color(image):
    """(max rgb component, max luminance) over the image
    (tonemap.hlsl:105-152)."""
    return jnp.max(image), jnp.max(smath.luminance(image))


def exposure_ema(prev_max, cur_max, alpha: float = 0.1):
    """Exponential moving average of the frame max for stable auto-exposure
    (tonemap.hlsl:168-181)."""
    return prev_max + (cur_max - prev_max) * alpha


def tonemap(
    image,
    mode: TonemapMode = TonemapMode.RAW,
    exposure: float = 0.0,
    max_value=None,
):
    """Apply exposure (in stops) then the operator. Output is linear radiance
    in [0,1] for the LDR operators; display encoding (sRGB) happens at save
    time (io/image.py)."""
    c = jnp.asarray(image, jnp.float32) * (2.0 ** exposure)
    if max_value is None:
        max_value = jnp.maximum(jnp.max(c), 1e-4)
    if mode == TonemapMode.RAW:
        return c
    if mode == TonemapMode.REINHARD:
        return _reinhard(c)
    if mode == TonemapMode.REINHARD_EXTENDED:
        return _reinhard_extended(c, max_value)
    if mode == TonemapMode.REINHARD_LUMINANCE:
        return _reinhard_luminance(c)
    if mode == TonemapMode.REINHARD_LUMINANCE_EXTENDED:
        return _reinhard_luminance_extended(c, max_value)
    if mode == TonemapMode.UNCHARTED2:
        return _uncharted2(c)
    if mode == TonemapMode.FILMIC:
        return _filmic(c)
    if mode == TonemapMode.ACES:
        return _aces_fitted(c)
    if mode == TonemapMode.ACES_APPROX:
        return _aces_approx(c)
    if mode == TonemapMode.VIRIDIS_R:
        return smath.viridis(c[..., 0] / max_value)
    if mode == TonemapMode.VIRIDIS_LENGTH:
        return smath.viridis(smath.length(c) / max_value)
    raise ValueError(f"unknown tonemap mode {mode}")
