"""Weighted reservoir sampling (ReSTIR building block).

TPU-native analog of src/Shaders/reservoir.h:4-27: ``update`` keeps a
candidate with probability w/total_weight, and the unbiased contribution
weight is ``W = total / (M * p_hat)``. Batched over lanes; merging two
reservoirs is an update with the other's total as weight (the spatial /
temporal reuse primitive, reference: NEEReservoir reuse, bdpt.h:158-175).
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from stratum_tpu.core import math as smath


class Reservoir(NamedTuple):
    """One reservoir per lane; ``sample`` is a pytree of per-lane payloads."""

    sample: object  # pytree of arrays [N, ...]
    target_pdf: jnp.ndarray  # [N] p_hat of the kept sample
    total_weight: jnp.ndarray  # [N] sum of candidate weights
    m: jnp.ndarray  # [N] number of candidates seen


def init_reservoir(sample_zero, n):
    return Reservoir(
        sample=sample_zero,
        target_pdf=jnp.zeros((n,), jnp.float32),
        total_weight=jnp.zeros((n,), jnp.float32),
        m=jnp.zeros((n,), jnp.float32),
    )


def update(res: Reservoir, candidate, target_pdf, weight, u) -> Reservoir:
    """Stream one candidate with resampling weight ``weight``; keep it with
    probability weight/total (reservoir.h:10-20)."""
    total = res.total_weight + weight
    keep = (u * jnp.maximum(total, 1e-20)) < weight
    sample = _tree_select(keep, candidate, res.sample)
    return Reservoir(
        sample=sample,
        target_pdf=jnp.where(keep, target_pdf, res.target_pdf),
        total_weight=total,
        m=res.m + 1.0,
    )


def merge(res: Reservoir, other: Reservoir, u) -> Reservoir:
    """Merge ``other`` into ``res`` (temporal/spatial reuse)."""
    w_other = other.target_pdf * contribution_weight(other) * other.m
    total = res.total_weight + w_other
    keep = (u * jnp.maximum(total, 1e-20)) < w_other
    return Reservoir(
        sample=_tree_select(keep, other.sample, res.sample),
        target_pdf=jnp.where(keep, other.target_pdf, res.target_pdf),
        total_weight=total,
        m=res.m + other.m,
    )


def contribution_weight(res: Reservoir):
    """W = total / (M * p_hat) (reservoir.h:22-26)."""
    return smath.safe_div(
        res.total_weight, res.m * jnp.maximum(res.target_pdf, 1e-20)
    )


def _tree_select(mask, a, b):
    import jax

    def sel(x, y):
        m = mask.reshape(mask.shape + (1,) * (x.ndim - mask.ndim))
        return jnp.where(m, x, y)

    return jax.tree.map(sel, a, b)
