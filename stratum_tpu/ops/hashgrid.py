"""Spatial hash grid, rebuilt sort-based each frame.

TPU-native analog of the reference's GPU hash grid
(src/Shaders/common/hashgrid.hlsli): camera-distance-adaptive cell size
(4-14), pcg-hashed buckets (15-55), lock-free atomic append (56-70) and the
two-pass compaction (72-88). Atomics don't exist on TPU, so the structure is
rebuilt per frame with a sort + segment boundaries — the canonical TPU
substitute (SURVEY.md §2.5) — and queried with binary search over the sorted
keys. Used for world-space reuse (ReSTIR neighbor lookups, photon-style
caches).
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp
import numpy as np

from stratum_tpu.core import rng as srng


class HashGrid(NamedTuple):
    """Sorted entries: keys (cell hashes) + the permutation that sorts the
    inserted items; query = searchsorted range over ``sorted_keys``."""

    sorted_keys: jnp.ndarray  # u32 [N]
    order: jnp.ndarray  # i32 [N] original item index per sorted slot
    cell_size: jnp.ndarray  # f32 scalar
    origin: jnp.ndarray  # f32 [3]


def cell_size_for(camera_pos, positions, base_size):
    """Camera-distance-adaptive cell size (hashgrid.hlsli:4-14): cells grow
    with distance so screen-space density stays roughly constant."""
    d = jnp.linalg.norm(positions - camera_pos, axis=-1)
    return base_size * jnp.maximum(1.0, jnp.mean(d))


def _cell_key(positions, origin, cell_size):
    q = jnp.floor((positions - origin) / cell_size).astype(jnp.int32)
    k = (
        srng.pcg(q[..., 0].astype(jnp.uint32))
        ^ srng.pcg(q[..., 1].astype(jnp.uint32) + np.uint32(0x9E3779B9))
        ^ srng.pcg(q[..., 2].astype(jnp.uint32) + np.uint32(0x85EBCA6B))
    )
    return k


def build_hashgrid(positions, cell_size, origin=None) -> HashGrid:
    """Insert all positions [N,3]; returns the queryable structure. The
    sort replaces the reference's append + compute_indices + swizzle passes
    (hashgrid.hlsli:56-88)."""
    if origin is None:
        origin = jnp.min(positions, axis=0)
    keys = _cell_key(positions, origin, cell_size)
    order = jnp.argsort(keys).astype(jnp.int32)
    return HashGrid(
        sorted_keys=keys[order],
        order=order,
        cell_size=jnp.asarray(cell_size, jnp.float32),
        origin=origin,
    )


def query(grid: HashGrid, positions, max_results: int = 8):
    """Items in each query position's cell: returns (item_ids [Q, R],
    valid [Q, R]). R = max_results slots per query (the reference's probe
    limit, hashgrid.hlsli:34)."""
    keys = _cell_key(positions, grid.origin, grid.cell_size)
    start = jnp.searchsorted(grid.sorted_keys, keys, side="left")
    offs = jnp.arange(max_results, dtype=jnp.int32)
    slots = start[..., None] + offs
    n = grid.sorted_keys.shape[0]
    in_range = slots < n
    slots_c = jnp.minimum(slots, n - 1)
    same = grid.sorted_keys[slots_c] == keys[..., None]
    ids = grid.order[slots_c]
    valid = in_range & same
    return jnp.where(valid, ids, -1), valid
