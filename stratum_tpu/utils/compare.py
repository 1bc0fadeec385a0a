"""Image error metrics: MSE / RMSE / SMAPE / average.

TPU-native analog of the reference's ImageComparer + image_compare kernel
(src/Node/ImageComparer.cpp:50-89, src/Shaders/kernels/image_compare.hlsl:
14-48 — CompareMetric {SMAPE, MSE, Average}, image_compare.h:8-13). The
reference accumulates per-pixel error with fixed-point atomics; here a jnp
reduction suffices (and runs on device).
"""

from __future__ import annotations

import jax.numpy as jnp


def mse(a, b):
    d = jnp.asarray(a, jnp.float32) - jnp.asarray(b, jnp.float32)
    return jnp.mean(d * d)


def rmse(a, b):
    return jnp.sqrt(mse(a, b))


def smape(a, b, eps: float = 1e-2):
    """Symmetric mean absolute percentage error per the reference kernel:
    |a-b| / (|a| + |b| + eps), averaged (image_compare.hlsl:23-33)."""
    a = jnp.asarray(a, jnp.float32)
    b = jnp.asarray(b, jnp.float32)
    return jnp.mean(jnp.abs(a - b) / (jnp.abs(a) + jnp.abs(b) + eps))


def average(a):
    return jnp.mean(jnp.asarray(a, jnp.float32))


def relative_mse(a, ref, eps: float = 1e-2):
    """MSE normalized by reference luminance^2 — the standard progressive-
    rendering convergence metric."""
    a = jnp.asarray(a, jnp.float32)
    ref = jnp.asarray(ref, jnp.float32)
    d = a - ref
    return jnp.mean(d * d / (ref * ref + eps))
