"""Keyframe splines for animation (reference: src/Common/spline.hpp:7-30).

Host-side utility; evaluation is jnp so animated parameters can be traced.
"""

from __future__ import annotations

from enum import IntEnum
from typing import NamedTuple

import jax.numpy as jnp
import numpy as np


class ExtrapolateMode(IntEnum):
    CONSTANT = 0
    LINEAR = 1
    CYCLE = 2
    CYCLE_OFFSET = 3
    BOUNCE = 4


class TangentMode(IntEnum):
    MANUAL = 0
    FLAT = 1
    LINEAR = 2
    SMOOTH = 3
    STEP = 4


class Spline(NamedTuple):
    times: jnp.ndarray  # [K]
    values: jnp.ndarray  # [K, D]
    tangents_in: jnp.ndarray  # [K, D]
    tangents_out: jnp.ndarray  # [K, D]
    extrapolate: int = ExtrapolateMode.CONSTANT


def make_linear_spline(times, values) -> Spline:
    times = jnp.asarray(times, jnp.float32)
    values = jnp.atleast_2d(jnp.asarray(values, jnp.float32))
    dt = jnp.diff(times)
    dv = jnp.diff(values, axis=0) / dt[:, None]
    tan = jnp.concatenate([dv, dv[-1:]], axis=0)
    tan_in = jnp.concatenate([dv[:1], dv], axis=0)
    return Spline(times, values, tan_in, tan, ExtrapolateMode.CONSTANT)


def evaluate(spline: Spline, t):
    """Cubic Hermite evaluation with constant extrapolation."""
    times, values = spline.times, spline.values
    k = times.shape[0]
    t = jnp.asarray(t, jnp.float32)
    tc = jnp.clip(t, times[0], times[-1])
    idx = jnp.clip(jnp.searchsorted(times, tc, side="right") - 1, 0, k - 2)
    t0, t1 = times[idx], times[idx + 1]
    dt = jnp.maximum(t1 - t0, 1e-12)
    u = (tc - t0) / dt
    p0, p1 = values[idx], values[idx + 1]
    m0 = spline.tangents_out[idx] * dt
    m1 = spline.tangents_in[idx + 1] * dt
    u2 = u * u
    u3 = u2 * u
    h00 = 2 * u3 - 3 * u2 + 1
    h10 = u3 - 2 * u2 + u
    h01 = -2 * u3 + 3 * u2
    h11 = u3 - u2
    return h00 * p0 + h10 * m0 + h01 * p1 + h11 * m1
