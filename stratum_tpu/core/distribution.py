"""Piecewise-constant 1D/2D sampling distributions.

TPU-native analog of the reference's dist2.h (src/Shaders/dist2.h:6-157):
normalized PDF + inclusive CDF tables, inverse-CDF sampling via
``jnp.searchsorted`` (vectorized binary search), and the 2D marginal ×
conditional construction used for environment-map importance sampling with
sin(theta) weighting. Builders are host-friendly (numpy in, jnp out) and the
samplers are jit-safe and batched.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp
import numpy as np


class Dist1D(NamedTuple):
    """pdf[N] (normalized so mean(pdf) = 1 over the [0,1) domain) and
    cdf[N+1] inclusive with cdf[0]=0, cdf[N]=1."""

    pdf: jnp.ndarray
    cdf: jnp.ndarray

    @property
    def size(self) -> int:
        return self.pdf.shape[-1]


def build_dist1d(weights) -> Dist1D:
    """Build from nonnegative weights (host or device)."""
    w = jnp.asarray(weights, jnp.float32)
    w = jnp.maximum(w, 0.0)
    total = jnp.sum(w, axis=-1, keepdims=True)
    n = w.shape[-1]
    # degenerate all-zero row -> uniform
    safe_w = jnp.where(total > 0.0, w, jnp.ones_like(w))
    safe_total = jnp.where(total > 0.0, total, jnp.full_like(total, float(n)))
    pdf = safe_w * (n / safe_total)
    cdf = jnp.cumsum(safe_w / safe_total, axis=-1)
    zeros = jnp.zeros_like(cdf[..., :1])
    cdf = jnp.concatenate([zeros, cdf], axis=-1)
    cdf = cdf.at[..., -1].set(1.0)
    return Dist1D(pdf=pdf, cdf=cdf)


def sample_dist1d(dist: Dist1D, u):
    """Inverse-CDF sample. Returns (index, u_remapped, pdf) where
    u_remapped in [0,1) is the position inside the chosen cell (reusable as a
    fresh uniform) and pdf is the discrete cell pdf × N (i.e. the density on
    [0,1))."""
    idx = jnp.clip(
        jnp.searchsorted(dist.cdf, u, side="right") - 1, 0, dist.size - 1
    )
    c0 = dist.cdf[idx]
    c1 = dist.cdf[idx + 1]
    du = (u - c0) / jnp.maximum(c1 - c0, 1e-20)
    return idx, du, dist.pdf[idx]


def dist1d_pdf(dist: Dist1D, idx):
    return dist.pdf[idx]


def dist1d_discrete_pdf(dist: Dist1D, idx):
    """Probability mass of cell idx (= pdf/N)."""
    return dist.pdf[idx] / dist.size


class Dist2D(NamedTuple):
    """Marginal over rows + conditional over columns per row.

    marginal: Dist1D over H rows; conditional pdf[H, W], cdf[H, W+1].
    """

    marginal: Dist1D
    cond_pdf: jnp.ndarray
    cond_cdf: jnp.ndarray

    @property
    def shape(self):
        return self.cond_pdf.shape


def build_dist2d(weights) -> Dist2D:
    """weights[H, W] nonnegative -> 2D distribution over [0,1)^2 (uv)."""
    w = jnp.maximum(jnp.asarray(weights, jnp.float32), 0.0)
    h, wdt = w.shape
    row_sums = jnp.sum(w, axis=-1)
    marginal = build_dist1d(row_sums)
    cond = build_dist1d(w)  # batched over rows
    return Dist2D(marginal=marginal, cond_pdf=cond.pdf, cond_cdf=cond.cdf)


def sample_dist2d(dist: Dist2D, u1, u2):
    """Sample (u, v) in [0,1)^2. Returns (uv[..., 2], pdf) with pdf the joint
    density on the unit square."""
    h, w = dist.shape
    row, du1, pdf_row = sample_dist1d(dist.marginal, u1)
    cond_cdf = dist.cond_cdf[row]  # gather rows: [..., W+1]
    col = jnp.clip(
        _searchsorted_rows(cond_cdf, u2) - 1, 0, w - 1
    )
    c0 = jnp.take_along_axis(cond_cdf, col[..., None], axis=-1)[..., 0]
    c1 = jnp.take_along_axis(cond_cdf, col[..., None] + 1, axis=-1)[..., 0]
    du2 = (u2 - c0) / jnp.maximum(c1 - c0, 1e-20)
    pdf_col = dist.cond_pdf[row, col]
    u = (col.astype(jnp.float32) + du2) / w
    v = (row.astype(jnp.float32) + du1) / h
    return jnp.stack([u, v], axis=-1), pdf_row * pdf_col


def dist2d_pdf(dist: Dist2D, uv):
    """Joint density at uv in [0,1)^2."""
    h, w = dist.shape
    col = jnp.clip((uv[..., 0] * w).astype(jnp.int32), 0, w - 1)
    row = jnp.clip((uv[..., 1] * h).astype(jnp.int32), 0, h - 1)
    return dist.marginal.pdf[row] * dist.cond_pdf[row, col]


def _searchsorted_rows(cdf_rows, u):
    """Per-row searchsorted: cdf_rows[..., K], u[...] -> index in [0, K]."""
    return jnp.sum((cdf_rows <= u[..., None]).astype(jnp.int32), axis=-1)


def build_env_dist2d(luminance_hw) -> Dist2D:
    """Environment-map distribution: luminance[H, W] weighted by sin(theta)
    of the row center (reference dist2.h:86-154)."""
    lum = np.asarray(luminance_hw, np.float32)
    h = lum.shape[0]
    theta = (np.arange(h, dtype=np.float32) + 0.5) / h * np.pi
    return build_dist2d(lum * np.sin(theta)[:, None])
