"""Trace-local wavefront sorting: reorder rays for block coherence INSIDE
the tracer and scatter hit records back to the caller's lane order.

This replaces carrying a sorted wavefront through the integrator (the
round-2 in-carry sort permuted ~13 state arrays per bounce and cost ~290 ms
per 2M-ray bounce; measured in tools/profile_overhead.py). Here only the
ray triple rides one packed [N, 8] gather in and the hit record one packed
gather out (~55 ms total), the caller's state never moves, and dead lanes
(t_max <= 0) sort to the tail where whole blocks produce zero candidates
and exit immediately — the wavefront-compaction effect without dynamic
shapes.

Sort key (measured best at 5 direction bits on the atrium,
tools/sweep_sort.py): [dir(5) | morton(origin quantized to scene bounds)].
Direction bits = octant(3) + 1x1-bit u,v on the dominant-axis cube face.
The reference gets cheap coherence from screen-tile thread remapping
(bdpt_util.hlsli:76-83); secondary rays have no screen structure left, so
the 5D (origin, direction) key re-creates it.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from stratum_tpu.ops.bvh import morton3
from stratum_tpu.ops.intersect import HitRecord

DIR_BITS = 5


def ray_key(origin, direction, t_max, lo, hi, dir_bits: int = DIR_BITS):
    """u32 coherence key; dead lanes (t_max <= 0) get the max key."""
    q = (origin - lo) / jnp.maximum(hi - lo, 1e-9)
    octant = (
        (direction[..., 0] > 0).astype(jnp.uint32)
        | ((direction[..., 1] > 0).astype(jnp.uint32) << 1)
        | ((direction[..., 2] > 0).astype(jnp.uint32) << 2)
    )
    extra = max(dir_bits - 3, 0)
    if extra > 0:
        half = extra // 2
        ax = jnp.abs(direction)
        dom = jnp.argmax(ax, axis=-1)
        denom = jnp.maximum(jnp.max(ax, axis=-1), 1e-9)
        # pick the two non-dominant components with selects, NOT
        # take_along_axis: two dynamic row gathers cost ~28 ms per 2M-ray
        # wave on TPU (~7 ns/row) while three wheres are free
        dx, dy, dz = direction[..., 0], direction[..., 1], direction[..., 2]
        u1 = jnp.where(dom == 0, dy, jnp.where(dom == 1, dz, dx)) / denom
        v1 = jnp.where(dom == 0, dz, jnp.where(dom == 1, dx, dy)) / denom

        def qb(x, b):
            return jnp.clip(
                ((x * 0.5 + 0.5) * (1 << b)).astype(jnp.uint32),
                0, (1 << b) - 1,
            )

        dbits = (
            (octant << jnp.uint32(extra))
            | (qb(u1, extra - half) << jnp.uint32(half))
            | qb(v1, half)
        )
    else:
        dbits = octant
    key = (dbits << jnp.uint32(32 - dir_bits)) | (
        morton3(q) >> jnp.uint32(dir_bits)
    )
    return jnp.where(t_max > 0, key, jnp.uint32(0xFFFFFFFF))


def sorted_trace_fns(closest, occluded, lo, hi, dir_bits: int = DIR_BITS):
    """Wrap a (closest, occluded) tracer pair with trace-local sorting.

    One packed [N, 8] gather carries (origin, direction, t_max) into sorted
    order; hits come back through one packed [N, 4] inverse gather. The
    wrapped functions are drop-in (same signatures/returns, caller lane
    order preserved bit-exactly up to intersection ties)."""

    def _order(o, d, tm):
        key = ray_key(o, d, tm, lo, hi, dir_bits)
        order = jnp.argsort(key)
        n = order.shape[0]
        inv = jnp.zeros_like(order).at[order].set(
            jnp.arange(n, dtype=order.dtype)
        )
        packed = jnp.concatenate(
            [o, d, tm[:, None], jnp.zeros_like(tm)[:, None]], axis=-1
        )[order]  # ONE row gather for all three inputs
        return packed[:, 0:3], packed[:, 3:6], packed[:, 6], inv

    def closest_sorted(o, d, tm=None):
        if tm is None:
            from stratum_tpu.ops.intersect import T_MAX

            tm = jnp.full(o.shape[:1], T_MAX, jnp.float32)
        os_, ds_, ts_, inv = _order(o, d, tm)
        h = closest(os_, ds_, ts_)
        # ONE packed inverse gather, in uint32 space. The floats ride as
        # raw bits (f32 -> uint32 bitcast) because an f32-typed gather
        # canonicalizes denormal/NaN patterns on TPU — riding int32 tri
        # ids through an f32 gather mangled 95% of them on the atrium.
        # Integer gathers copy bits verbatim, so t/bary roundtrip exactly
        # and tri needs no second gather pass (~16 ms per 2M-ray wave).
        # Slot-mode hits (Pallas + slot_payload) ride only (t, slot):
        # tri/bary/payload resolve AFTER the unsort via finalize_hit's one
        # caller-order gather (riding the full payload here measured 48
        # ms/spp slower e2e).
        if h.slot is not None:
            packed = jnp.concatenate(
                [
                    jax.lax.bitcast_convert_type(h.t[:, None], jnp.uint32),
                    jax.lax.bitcast_convert_type(
                        h.slot[:, None], jnp.uint32
                    ),
                ],
                axis=-1,
            )[inv]  # [N, 2] uint32
            slot = jax.lax.bitcast_convert_type(packed[:, 1], jnp.int32)
            return HitRecord(
                t=jax.lax.bitcast_convert_type(packed[:, 0], jnp.float32),
                tri=jnp.where(slot >= 0, 0, -1),
                bary=jnp.zeros((slot.shape[0], 2), jnp.float32),
                slot=slot,
            )
        packed = jnp.concatenate(
            [
                jax.lax.bitcast_convert_type(h.t[:, None], jnp.uint32),
                jax.lax.bitcast_convert_type(h.bary, jnp.uint32),
                jax.lax.bitcast_convert_type(h.tri[:, None], jnp.uint32),
            ],
            axis=-1,
        )[inv]  # [N, 4] uint32
        return HitRecord(
            t=jax.lax.bitcast_convert_type(packed[:, 0], jnp.float32),
            tri=jax.lax.bitcast_convert_type(packed[:, 3], jnp.int32),
            bary=jax.lax.bitcast_convert_type(packed[:, 1:3], jnp.float32),
        )

    def occluded_sorted(o, d, t):
        os_, ds_, ts_, inv = _order(o, d, t)
        occ = occluded(os_, ds_, ts_)
        return occ[inv]

    return closest_sorted, occluded_sorted
