"""Trace-local ray sorting (ops/raysort): the sorted wrappers must return
results in the CALLER's lane order, identical to the unsorted tracer (up to
intersection ties), and the key must compact dead lanes to the tail."""

import jax
import jax.numpy as jnp
import numpy as np

from stratum_tpu.ops import packet, raysort
from stratum_tpu.ops.intersect import T_MAX


def _scene(rng):
    t = 500
    p0 = rng.random((t, 3), np.float32) * 4
    e1 = rng.random((t, 3), np.float32) * 0.3
    e2 = rng.random((t, 3), np.float32) * 0.3
    pos = np.concatenate([p0, p0 + e1, p0 + e2]).astype(np.float32)
    idx = np.stack(
        [np.arange(t), np.arange(t) + t, np.arange(t) + 2 * t], 1
    ).astype(np.int32)
    return jnp.asarray(pos), jnp.asarray(idx)


def test_sorted_trace_matches_plain():
    rng = np.random.default_rng(5)
    pos, idx = _scene(rng)
    fat = packet.build_fat_bvh(pos, idx, leaf_size=64)
    n = 1024
    o = jnp.asarray(rng.random((n, 3), np.float32) * 4)
    d = rng.random((n, 3), np.float32) - 0.5
    d = jnp.asarray(d / np.linalg.norm(d, axis=1, keepdims=True))
    tm = jnp.full((n,), T_MAX, jnp.float32)
    # kill a third of the lanes: they must come back with their own slots
    tm = tm.at[::3].set(0.0)

    lo = jnp.min(pos, axis=0)
    hi = jnp.max(pos, axis=0)

    def closest(o, d, t):
        return packet.packet_closest(fat, o, d, t_max=t, block=256)

    def occluded(o, d, t):
        return packet.packet_occluded(fat, o, d, t, block=256)

    s_closest, s_occluded = raysort.sorted_trace_fns(closest, occluded, lo, hi)
    h_plain = closest(o, d, tm)
    h_sorted = s_closest(o, d, tm)
    assert (np.asarray(h_plain.tri) == np.asarray(h_sorted.tri)).mean() > 0.999
    both = (np.asarray(h_plain.tri) >= 0) & (np.asarray(h_sorted.tri) >= 0)
    np.testing.assert_allclose(
        np.asarray(h_plain.t)[both], np.asarray(h_sorted.t)[both], rtol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(h_plain.bary)[both], np.asarray(h_sorted.bary)[both],
        atol=1e-5,
    )

    t_occ = jnp.full((n,), 2.0, jnp.float32)
    o_plain = np.asarray(occluded(o, d, t_occ))
    o_sorted = np.asarray(s_occluded(o, d, t_occ))
    assert (o_plain == o_sorted).mean() > 0.999


def test_ray_key_compacts_dead_lanes():
    rng = np.random.default_rng(6)
    n = 512
    o = jnp.asarray(rng.random((n, 3), np.float32))
    d = rng.random((n, 3), np.float32) - 0.5
    d = jnp.asarray(d / np.linalg.norm(d, axis=1, keepdims=True))
    tm = jnp.ones((n,), jnp.float32).at[100:200].set(0.0)
    key = raysort.ray_key(o, d, tm, jnp.zeros(3), jnp.ones(3))
    k = np.asarray(key)
    assert (k[100:200] == 0xFFFFFFFF).all()
    order = np.argsort(k)
    # all dead lanes land in the tail segment
    assert set(order[-100:]) == set(range(100, 200))


def test_ray_key_groups_directions():
    # rays in opposite octants must land in different key buckets, and a
    # nearby direction must key closer than an opposite one
    o = jnp.tile(jnp.asarray([[0.5, 0.5, 0.5]], jnp.float32), (4, 1))
    d = jnp.asarray(
        [[1, 0.01, 0.01], [-1, 0.01, 0.01], [1, 0.02, 0.01], [1, -0.9, 0.01]],
        jnp.float32,
    )
    d = d / jnp.linalg.norm(d, axis=1, keepdims=True)
    tm = jnp.ones((4,), jnp.float32)
    k = np.asarray(
        raysort.ray_key(o, d, tm, jnp.zeros(3), jnp.ones(3))
    )
    assert k[0] != k[1]  # opposite octants differ
    assert abs(int(k[0]) - int(k[2])) < abs(int(k[0]) - int(k[1]))
    assert k[3] != k[0]  # different y-sign octant differs
