"""Adaptive sampling: variance-guided per-pixel sample allocation.

Beyond the reference (which only renders uniform spp): after a uniform
pilot, every round traces ONE fresh sample for the L pixels whose
estimator stands to gain most — ranked by the marginal-variance score
``var_p / count_p^2`` (the exact drop in variance-of-the-mean from one
more sample is ``var/(c*(c+1))``). The TPU shape story is what makes
this cheap: a round is a fixed-size top-L gather of pixel coords into
the same wavefront ``trace_path`` the uniform path uses (pixel-keyed RNG
means scattered pixel subsets sample exactly what a full frame would),
one scatter-add back, no dynamic shapes anywhere.

Each pixel's estimate is the mean of its own samples — samples in round
r are independent of the scores that selected them (scores depend only
on earlier rounds), so per-pixel means stay unbiased conditional on the
allocation, the standard two-stage adaptive-MC argument.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from stratum_tpu.core import math as smath
from stratum_tpu.render import integrator as sintegrator


class AdaptiveState:
    """Per-pixel running sums, flat [n] over the pixel domain."""

    def __init__(self, accum, accum_sq, count):
        self.accum = accum  # [n,3] radiance sum
        self.accum_sq = accum_sq  # [n] luminance^2 sum
        self.count = count  # [n] f32 samples per pixel


def init_state(num_pixels: int) -> AdaptiveState:
    return AdaptiveState(
        jnp.zeros((num_pixels, 3), jnp.float32),
        jnp.zeros((num_pixels,), jnp.float32),
        jnp.zeros((num_pixels,), jnp.float32),
    )


def _topk_pixels(cfg, accum, accum_sq, count, L):
    """Rank pixels by smoothed marginal variance and return the top-L as
    (flat idx, px, py). Deterministic in the state — the sharded round
    relies on every replica computing the identical selection."""
    n = cfg.width * cfg.height
    mean = smath.luminance(accum) / jnp.maximum(count, 1.0)
    var = jnp.maximum(
        accum_sq / jnp.maximum(count, 1.0) - mean * mean, 0.0
    )
    # per-pixel variance estimates from a handful of samples are extremely
    # noisy — raw greedy allocation STARVES pixels whose few samples
    # happened to agree (measured worse than uniform at small budgets).
    # A 5x5 spatial average is the standard stabilizer: noise is locally
    # stationary, neighbours share the true variance.
    v2 = var.reshape(cfg.height, cfg.width)
    k = jnp.ones((5, 5), jnp.float32) / 25.0
    v2 = lax.conv_general_dilated(
        v2[None, None], k[None, None], (1, 1), "SAME",
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
    )[0, 0]
    var = v2.reshape(n)
    # marginal benefit of one more sample; the small floor keeps
    # apparently-converged pixels eligible once everything else is flat
    score = (var + 1e-8) / jnp.maximum(count, 1.0) ** 2
    _, idx = lax.top_k(score, L)
    px = (idx % cfg.width).astype(jnp.uint32)
    py = (idx // cfg.width).astype(jnp.uint32)
    return idx, px, py


@partial(jax.jit, static_argnums=(2, 6, 8))
def _adaptive_round(scene, view, cfg, accum, accum_sq, count, L, seed,
                    qmc="rand"):
    """One adaptive round: sample the top-L pixels by marginal variance.

    ``qmc`` is a cache key only: core/rng.QMC is read at TRACE time, so
    without it a mode flip after the first compile would be silently
    ignored (callers pass srng.QMC)."""
    idx, px, py = _topk_pixels(cfg, accum, accum_sq, count, L)
    rad, _ = sintegrator.trace_path(scene, view, cfg, seed, px, py)
    accum = accum.at[idx].add(rad)
    accum_sq = accum_sq.at[idx].add(smath.luminance(rad) ** 2)
    count = count.at[idx].add(1.0)
    return accum, accum_sq, count


@partial(jax.jit, static_argnums=(2, 7))
def _uniform_round(scene, view, cfg, accum, accum_sq, count, seed,
                   qmc="rand"):
    rad, _ = sintegrator.trace_path(scene, view, cfg, seed)
    return (
        accum + rad,
        accum_sq + smath.luminance(rad) ** 2,
        count + 1.0,
    )


def render_adaptive(
    scene, view, cfg, total_rays_budget_spp: float, pilot: int = 2,
    frac: float = 0.25, seed0: int = 0,
):
    """Render with an average budget of ``total_rays_budget_spp`` camera
    samples per pixel: ``pilot`` uniform rounds, then top-``frac`` rounds
    until the budget is spent. Returns (image [H,W,3], state)."""
    n = cfg.width * cfg.height
    st = init_state(n)
    accum, accum_sq, count = st.accum, st.accum_sq, st.count
    spent = 0.0
    seed = seed0
    from stratum_tpu.core import rng as srng

    for _ in range(min(pilot, int(total_rays_budget_spp))):
        accum, accum_sq, count = _uniform_round(
            scene, view, cfg, accum, accum_sq, count, seed, srng.QMC
        )
        spent += 1.0
        seed += 1
    L = max(int(round(n * frac)), 1)
    while spent + frac <= total_rays_budget_spp + 1e-6:
        accum, accum_sq, count = _adaptive_round(
            scene, view, cfg, accum, accum_sq, count, L, seed, srng.QMC
        )
        spent += L / n
        seed += 1
    img = accum / jnp.maximum(count, 1.0)[:, None]
    state = AdaptiveState(accum, accum_sq, count)
    return img.reshape(cfg.height, cfg.width, 3), state
