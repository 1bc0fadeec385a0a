"""Binned pair-stream tracer (ops/binned.py) vs the brute-force oracle and
the block kernel (interpret mode on CPU; compiled path is exercised on TPU
by tools/perf_binned.py and bench runs)."""

import jax.numpy as jnp
import numpy as np
import pytest

from stratum_tpu.ops import binned, intersect, packet, pallas_trace


@pytest.fixture
def rng_np():
    return np.random.default_rng(11)


def _random_tris(rng, n, spread=1.0):
    base = (rng.random((n, 3)) * 2 - 1).astype(np.float32) * spread
    e1 = (rng.random((n, 3)) - 0.5).astype(np.float32) * 0.4
    e2 = (rng.random((n, 3)) - 0.5).astype(np.float32) * 0.4
    pos = np.concatenate([base, base + e1, base + e2], axis=0)
    idx = np.stack(
        [np.arange(n), np.arange(n) + n, np.arange(n) + 2 * n], axis=1
    ).astype(np.int32)
    return jnp.asarray(pos), jnp.asarray(idx)


def _random_rays(rng, n):
    o = (rng.random((n, 3)) * 2 - 1).astype(np.float32) * 2.0
    d = (rng.random((n, 3)) - 0.5).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True) + 1e-9
    return jnp.asarray(o), jnp.asarray(d)


@pytest.mark.parametrize("g", [8, 16])
def test_binned_matches_brute(rng_np, g):
    pos, idx = _random_tris(rng_np, 400)
    fat = packet.build_fat_bvh(pos, idx, leaf_size=32)
    feat = pallas_trace.pack_leaf_features(fat, mode="c48")
    o, d = _random_rays(rng_np, 512)
    hb = binned.pallas_closest_binned(
        fat, feat, o, d, g=g, pcap=24, mcap=1 << 14, interpret=True
    )
    hr = intersect.intersect_brute_force(o, d, pos, idx)
    agree = (np.asarray(hb.tri) == np.asarray(hr.tri)).mean()
    assert agree > 0.995, agree
    both = (np.asarray(hb.tri) >= 0) & (np.asarray(hr.tri) >= 0)
    tb, tr = np.asarray(hb.t)[both], np.asarray(hr.t)[both]
    assert np.allclose(tb, tr, rtol=2e-3, atol=1e-4)


def test_binned_group_interval_emit_matches_ray_emit(rng_np):
    """em="group" (conservative per-group interval slab tests) can only
    ADD pairs the kernel rejects, so with pcap headroom the hits must
    match em="ray" exactly — including waves with dead lanes (masked out
    of the interval) and sign-mixed groups (the 4-combo product bounds)."""
    pos, idx = _random_tris(rng_np, 400)
    fat = packet.build_fat_bvh(pos, idx, leaf_size=32)
    feat = pallas_trace.pack_leaf_features(fat, mode="c48")
    o, d = _random_rays(rng_np, 512)
    t_max = jnp.where(
        jnp.arange(512) % 5 == 0, 0.0, intersect.T_MAX
    ).astype(jnp.float32)
    ha = binned.pallas_closest_binned(
        fat, feat, o, d, t_max=t_max, g=8, pcap=48, mcap=1 << 15,
        em="ray", interpret=True,
    )
    hg, st = binned.pallas_closest_binned(
        fat, feat, o, d, t_max=t_max, g=8, pcap=48, mcap=1 << 15,
        em="group", interpret=True, with_stats=True,
    )
    assert int(st["dropped_pcap"]) == 0 and int(st["dropped_mcap"]) == 0
    hg = binned.pallas_closest_binned(
        fat, feat, o, d, t_max=t_max, g=8, pcap=48, mcap=1 << 15,
        em="group", interpret=True,
    )
    np.testing.assert_array_equal(np.asarray(ha.tri), np.asarray(hg.tri))
    np.testing.assert_allclose(
        np.asarray(ha.t), np.asarray(hg.t), rtol=1e-6
    )


def test_binned_slot_mode_matches_block_kernel(rng_np):
    """Slot-mode output (t, slot) agrees with the block kernel's slot mode
    after finalize (same fused payload path the integrator uses)."""
    pos, idx = _random_tris(rng_np, 300)
    fat = packet.build_fat_bvh(pos, idx, leaf_size=32)
    feat = pallas_trace.pack_leaf_features(fat, mode="c48")
    o, d = _random_rays(rng_np, 512)
    hb = binned.pallas_closest_binned(
        fat, feat, o, d, g=8, pcap=24, mcap=1 << 14, interpret=True,
        slot_payload=True,
    )
    hp = pallas_trace.pallas_closest(
        fat, feat, o, d, block=256, interpret=True
    )
    hit_b = np.asarray(hb.slot) >= 0
    hit_p = np.asarray(hp.tri) >= 0
    assert (hit_b == hit_p).mean() > 0.995
    both = hit_b & hit_p
    # same winning slot -> same triangle
    tri_b = np.asarray(fat.leaf_tri).reshape(-1)[
        np.maximum(np.asarray(hb.slot), 0)
    ]
    agree = (tri_b[both] == np.asarray(hp.tri)[both]).mean()
    assert agree > 0.99, agree


def test_binned_t_max_and_dead_lanes(rng_np):
    """Per-ray t bounds gate hits; zero-bound (dead) lanes emit nothing."""
    pos, idx = _random_tris(rng_np, 200)
    fat = packet.build_fat_bvh(pos, idx, leaf_size=32)
    feat = pallas_trace.pack_leaf_features(fat, mode="c48")
    o, d = _random_rays(rng_np, 256)
    hr = intersect.intersect_brute_force(o, d, pos, idx)
    t_ref = np.asarray(hr.t)
    # bound half the rays BELOW their hit t -> they must miss
    tm = np.full(256, intersect.T_MAX, np.float32)
    cut = (np.asarray(hr.tri) >= 0) & (np.arange(256) % 2 == 0)
    tm[cut] = t_ref[cut] * 0.5
    tm[1::4] = 0.0  # dead lanes
    hb = binned.pallas_closest_binned(
        fat, feat, o, d, t_max=jnp.asarray(tm), g=8, pcap=24,
        mcap=1 << 13, interpret=True,
    )
    tri_b = np.asarray(hb.tri)
    assert (tri_b[cut] == -1).all()
    assert (tri_b[1::4] == -1).all()
    free = (~cut) & (np.arange(256) % 4 != 1)
    agree = (tri_b[free] == np.asarray(hr.tri)[free]).mean()
    assert agree > 0.99, agree


def test_binned_stats_count_overflow(rng_np):
    """with_stats reports pair counts and capacity overflow (tiny caps
    must report drops rather than fail silently)."""
    pos, idx = _random_tris(rng_np, 300)
    fat = packet.build_fat_bvh(pos, idx, leaf_size=16)
    feat = pallas_trace.pack_leaf_features(fat, mode="c48")
    o, d = _random_rays(rng_np, 256)
    _, stats = binned.pallas_closest_binned(
        fat, feat, o, d, g=8, pcap=24, mcap=1 << 13, interpret=True,
        with_stats=True,
    )
    pairs_roomy = int(stats["pairs"])
    assert pairs_roomy > 0
    assert int(stats["dropped_mcap"]) == 0
    _, tight = binned.pallas_closest_binned(
        fat, feat, o, d, g=8, pcap=2, mcap=1 << 13, interpret=True,
        with_stats=True,
    )
    assert int(tight["dropped_pcap"]) > 0


def test_binned_occluded_matches_brute(rng_np):
    """pallas_occluded_binned vs the brute-force oracle (segment tests:
    real NEE-style bounded rays, plus dead lanes)."""
    pos, idx = _random_tris(rng_np, 300)
    fat = packet.build_fat_bvh(pos, idx, leaf_size=32)
    feat = pallas_trace.pack_leaf_features(fat, mode="c48")
    o, d = _random_rays(rng_np, 256)
    hr = intersect.intersect_brute_force(o, d, pos, idx)
    t_ref = np.asarray(hr.t)
    tm = np.full(256, 2.5, np.float32)
    tm[1::5] = 0.0  # dead lanes must stay unblocked
    occ_b = np.asarray(
        binned.pallas_occluded_binned(
            fat, feat, o, d, jnp.asarray(tm), g=8, pcap=24,
            mcap=1 << 13, interpret=True,
        )
    )
    occ_ref = (t_ref < tm * (1.0 - 1e-3)) & (np.asarray(hr.tri) >= 0)
    assert (occ_b[1::5] == False).all()  # noqa: E712
    agree = (occ_b == occ_ref).mean()
    assert agree > 0.99, agree


def test_binned_t_min_gates_emission(rng_np):
    """A t_min beyond every leaf's exit must kill all pairs (the ADVICE r4
    fix: t_min used to be silently ignored)."""
    pos, idx = _random_tris(rng_np, 200)
    fat = packet.build_fat_bvh(pos, idx, leaf_size=32)
    feat = pallas_trace.pack_leaf_features(fat, mode="c48")
    o, d = _random_rays(rng_np, 128)
    h_far = binned.pallas_closest_binned(
        fat, feat, o, d, t_min=1e6, g=8, pcap=16, mcap=1 << 13,
        interpret=True,
    )
    assert (np.asarray(h_far.tri) == -1).all()


def test_binned_rejects_chunked_slab(rng_np, monkeypatch):
    """The chunk-major ablation layout must be rejected, not silently
    mis-sliced (ADVICE r4)."""
    pos, idx = _random_tris(rng_np, 200)
    # leaf_size 128 admits chunks=4 (4*(128/4) is lane-tile aligned);
    # smaller leaves fall back to the flat layout and nothing is rejected
    fat = packet.build_fat_bvh(pos, idx, leaf_size=128)
    monkeypatch.setattr(pallas_trace, "CHUNKS", 4)
    feat = pallas_trace.pack_leaf_features(fat, mode="c48")
    o, d = _random_rays(rng_np, 128)
    with pytest.raises(ValueError, match="FLAT"):
        binned.pallas_closest_binned(fat, feat, o, d, interpret=True)


def test_integrator_routes_binned(monkeypatch):
    """cfg.binned_secondary / binned_shadow route sorted closest and
    occlusion waves to the binned tracer (wiring check; the pallas block
    kernel itself is TPU-only so the binned calls are stubbed)."""
    import jax.numpy as jnp

    from stratum_tpu.ops import binned as sbinned
    from stratum_tpu.ops import pallas_trace as spallas
    from stratum_tpu.render import integrator
    from stratum_tpu.scene import builtin, flatten

    g = builtin.cornell_box()
    scene, _ = flatten.flatten(g.root)
    calls = {"closest": 0, "occluded": 0}

    def fake_closest(fat, feat, o, d, t_max=None, **kw):
        calls["closest"] += 1
        n = o.shape[0]
        return intersect.HitRecord(
            t=jnp.full((n,), intersect.T_MAX), tri=jnp.full((n,), -1),
            bary=jnp.zeros((n, 2)),
            slot=jnp.full((n,), -1, jnp.int32)
            if kw.get("slot_payload") is not None else None,
        )

    def fake_occluded(fat, feat, o, d, t, **kw):
        calls["occluded"] += 1
        return jnp.zeros(o.shape[:1], bool)

    def fake_block(fat, feat, o, d, t_max=None, **kw):
        n = o.shape[0]
        return intersect.HitRecord(
            t=jnp.full((n,), intersect.T_MAX), tri=jnp.full((n,), -1),
            bary=jnp.zeros((n, 2)),
            slot=jnp.full((n,), -1, jnp.int32)
            if kw.get("slot_payload") is not None else None,
        )

    monkeypatch.setattr(sbinned, "pallas_closest_binned", fake_closest)
    monkeypatch.setattr(sbinned, "pallas_occluded_binned", fake_occluded)
    monkeypatch.setattr(spallas, "pallas_closest", fake_block)
    monkeypatch.setattr(
        spallas, "pallas_occluded",
        lambda *a, **k: jnp.zeros(a[2].shape[:1], bool),
    )
    cfg = integrator.RenderConfig(
        tracer="pallas", binned_secondary=8, binned_shadow=8, sort_rays=True,
    )
    closest, closest_u, occluded = integrator._trace_fns3(scene, cfg)
    o = jnp.zeros((256, 3))
    d = jnp.ones((256, 3))
    closest(o, d)  # sorted closest -> binned
    assert calls["closest"] == 1
    occluded(o, d, jnp.ones((256,)))  # occlusion -> binned
    assert calls["occluded"] == 1
    closest_u(o, d)  # primary peel stays on the block kernel
    assert calls["closest"] == 1


@pytest.mark.parametrize("sb", [2, 4])
def test_binned_superbins_match_brute(rng_np, sb):
    """sb > 1 (superbins: sb bins of one leaf per grid step) must be
    result-identical to sb=1 — only the padding granularity changes."""
    pos, idx = _random_tris(rng_np, 400)
    fat = packet.build_fat_bvh(pos, idx, leaf_size=32)
    feat = pallas_trace.pack_leaf_features(fat, mode="c48")
    o, d = _random_rays(rng_np, 512)
    hb = binned.pallas_closest_binned(
        fat, feat, o, d, g=8, pcap=24, mcap=1 << 14, sb=sb, interpret=True
    )
    hr = intersect.intersect_brute_force(o, d, pos, idx)
    agree = (np.asarray(hb.tri) == np.asarray(hr.tri)).mean()
    assert agree > 0.995, agree
