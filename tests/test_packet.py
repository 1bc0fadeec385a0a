"""Packet (block x fat-leaf) traversal vs the brute-force oracle."""

import jax.numpy as jnp
import numpy as np
import pytest

from stratum_tpu.ops import intersect, packet
from tests.test_bvh import _random_rays, _random_tris


@pytest.mark.parametrize("num_tris,leaf", [(50, 16), (500, 64), (2000, 64)])
def test_packet_closest_matches_brute(rng_np, num_tris, leaf):
    pos, idx = _random_tris(rng_np, num_tris)
    o, d = _random_rays(rng_np, 1024)
    fat = packet.build_fat_bvh(pos, idx, leaf_size=leaf)
    hp = packet.packet_closest(fat, o, d, block=256, group=2)
    hr = intersect.intersect_brute_force(o, d, pos, idx)
    tb, tr = np.asarray(hp.tri), np.asarray(hr.tri)
    agree = (tb == tr).mean()
    assert agree > 0.995, agree  # Plucker arithmetic may flip edge cases
    both = (tb == tr) & (tr >= 0)
    np.testing.assert_allclose(
        np.asarray(hp.t)[both], np.asarray(hr.t)[both], rtol=2e-4, atol=2e-4
    )


def test_packet_occluded_matches(rng_np):
    pos, idx = _random_tris(rng_np, 400)
    o, d = _random_rays(rng_np, 1024)
    t_max = jnp.asarray((rng_np.random(1024) * 10).astype(np.float32))
    fat = packet.build_fat_bvh(pos, idx, leaf_size=32)
    op = np.asarray(packet.packet_occluded(fat, o, d, t_max, block=256, group=2))
    ob = np.asarray(intersect.occluded_brute_force(o, d, t_max, pos, idx))
    assert (op == ob).mean() > 0.995


def test_packet_padding_and_small(rng_np):
    pos, idx = _random_tris(rng_np, 10)
    valid = jnp.asarray(np.arange(10) < 7)
    fat = packet.build_fat_bvh(pos, idx, valid, leaf_size=4)
    o, d = _random_rays(rng_np, 100)
    hp = packet.packet_closest(fat, o, d, block=64, group=2)
    assert (np.asarray(hp.tri) < 7).all()


def test_packet_cornell_render_consistent():
    """Direct-light Cornell via packet tracer matches the brute render."""
    from stratum_tpu.render import camera, integrator
    from stratum_tpu.scene import builtin, flatten

    g = builtin.cornell_box()
    scene, _ = flatten.flatten(g.root)
    node, cam = flatten.find_camera(g.root)
    view = camera.make_view(node.to_world(), cam.fovy, 48, 48)
    a = np.asarray(
        integrator.render_direct(
            scene, view, integrator.RenderConfig(48, 48, tracer="packet"), 3
        )
    )
    b = np.asarray(
        integrator.render_direct(
            scene, view, integrator.RenderConfig(48, 48, tracer="brute"), 3
        )
    )
    mismatch = (np.abs(a - b) > 1e-3 * (1 + np.abs(b))).mean()
    assert mismatch < 0.005, mismatch


def test_sah_fat_bvh_matches_brute(rng_np):
    """The native SAH builder produces a correct FatBVH (skips if g++ or the
    native library is unavailable)."""
    from stratum_tpu.ops.packet import build_fat_bvh_sah

    pos, idx = _random_tris(rng_np, 700)
    fat = build_fat_bvh_sah(pos, idx, leaf_size=32)
    if fat is None:
        pytest.skip("native SAH builder unavailable")
    o, d = _random_rays(rng_np, 1024)
    hp = packet.packet_closest(fat, o, d, block=256, group=2)
    hr = intersect.intersect_brute_force(o, d, pos, idx)
    agree = (np.asarray(hp.tri) == np.asarray(hr.tri)).mean()
    assert agree > 0.995, agree


def test_sah_leaves_tighter_than_morton(rng_np):
    """SAH leaves should have smaller total surface area than Morton groups
    (the reason to pay for the native builder)."""
    from stratum_tpu.ops.packet import build_fat_bvh_sah

    pos, idx = _random_tris(rng_np, 2000, spread=10.0)
    sah = build_fat_bvh_sah(pos, idx, leaf_size=64)
    if sah is None:
        pytest.skip("native SAH builder unavailable")
    mor = packet.build_fat_bvh(pos, idx, leaf_size=64)

    def area(fat):
        d = np.maximum(np.asarray(fat.leaf_hi) - np.asarray(fat.leaf_lo), 0)
        valid = d[:, 0] < 1e30
        return (
            2 * (d[:, 0] * d[:, 1] + d[:, 1] * d[:, 2] + d[:, 2] * d[:, 0])
        )[valid].sum()

    assert area(sah) < area(mor) * 1.05


def test_pallas_tracer_interpret(rng_np):
    """The Pallas traversal kernel agrees with the oracle (interpret mode on
    CPU; the compiled path is exercised on TPU by bench/driver runs)."""
    from stratum_tpu.ops import pallas_trace

    pos, idx = _random_tris(rng_np, 400)
    fat = packet.build_fat_bvh(pos, idx, leaf_size=32)
    feat = pallas_trace.pack_leaf_features(fat)
    o, d = _random_rays(rng_np, 512)
    hp = pallas_trace.pallas_closest(fat, feat, o, d, block=256, interpret=True)
    hr = intersect.intersect_brute_force(o, d, pos, idx)
    agree = (np.asarray(hp.tri) == np.asarray(hr.tri)).mean()
    assert agree > 0.995, agree
    t_max = jnp.asarray((rng_np.random(512) * 10).astype(np.float32))
    op = np.asarray(
        pallas_trace.pallas_occluded(fat, feat, o, d, t_max, block=256,
                                     interpret=True)
    )
    ob = np.asarray(intersect.occluded_brute_force(o, d, t_max, pos, idx))
    assert (op == ob).mean() > 0.995


@pytest.mark.parametrize("leaf", [4, 32, 64])
def test_chunk_aabbs_cover_leaf(rng_np, leaf):
    """Union of the 8 per-chunk AABBs == the leaf AABB, and every valid
    triangle slot lies inside its chunk's box."""
    pos, idx = _random_tris(rng_np, 200)
    fat = packet.build_fat_bvh(pos, idx, leaf_size=leaf)
    ca = np.asarray(fat.leaf_chunk_aabb)  # [L, 8, 6]
    lo_u = ca[:, :, 0:3].min(axis=1)
    hi_u = ca[:, :, 3:6].max(axis=1)
    np.testing.assert_allclose(lo_u, np.asarray(fat.leaf_lo), rtol=1e-6)
    np.testing.assert_allclose(hi_u, np.asarray(fat.leaf_hi), rtol=1e-6)
    # per-slot containment
    kc = -(-leaf // packet.NUM_CHUNKS)
    tri = np.asarray(fat.leaf_tri)
    pos_np, idx_np = np.asarray(pos), np.asarray(idx)
    for l in range(tri.shape[0]):
        for s in range(leaf):
            t = tri[l, s]
            if t < 0:
                continue
            box = ca[l, s // kc]
            pts = pos_np[idx_np[t]]
            assert (pts.min(0) >= box[0:3] - 1e-5).all()
            assert (pts.max(0) <= box[3:6] + 1e-5).all()


def test_chunk_aabbs_sah(rng_np):
    from stratum_tpu.ops.packet import build_fat_bvh_sah

    pos, idx = _random_tris(rng_np, 300)
    fat = build_fat_bvh_sah(pos, idx, leaf_size=32)
    if fat is None:
        pytest.skip("native SAH builder unavailable")
    ca = np.asarray(fat.leaf_chunk_aabb)
    np.testing.assert_allclose(
        ca[:, :, 0:3].min(axis=1), np.asarray(fat.leaf_lo), rtol=1e-6
    )
    np.testing.assert_allclose(
        ca[:, :, 3:6].max(axis=1), np.asarray(fat.leaf_hi), rtol=1e-6
    )


@pytest.mark.parametrize("subs,chunks", [(1, 8), (2, 8), (2, 4)])
def test_pallas_tracer_chunked(rng_np, subs, chunks):
    """Chunk-gated kernel (chunk-major slabs + per-(sub, chunk) commits)
    agrees with the oracle and with the ungated kernel."""
    from stratum_tpu.ops import pallas_trace

    pos, idx = _random_tris(rng_np, 2000)
    fat = packet.build_fat_bvh(pos, idx, leaf_size=256)
    assert pallas_trace._effective_chunks(256, 8) == 8
    feat = pallas_trace.pack_leaf_features(fat, chunks=chunks)
    o, d = _random_rays(rng_np, 512)
    hp = pallas_trace.pallas_closest(
        fat, feat, o, d, block=256, interpret=True, subs=subs, chunks=chunks
    )
    hr = intersect.intersect_brute_force(o, d, pos, idx)
    agree = (np.asarray(hp.tri) == np.asarray(hr.tri)).mean()
    assert agree > 0.995, agree
    both = (np.asarray(hp.tri) == np.asarray(hr.tri)) & (
        np.asarray(hr.tri) >= 0
    )
    np.testing.assert_allclose(
        np.asarray(hp.t)[both], np.asarray(hr.t)[both], rtol=2e-3, atol=2e-3
    )
    t_max = jnp.asarray((rng_np.random(512) * 10).astype(np.float32))
    op = np.asarray(
        pallas_trace.pallas_occluded(
            fat, feat, o, d, t_max, block=256, interpret=True,
            subs=subs, chunks=chunks,
        )
    )
    ob = np.asarray(intersect.occluded_brute_force(o, d, t_max, pos, idx))
    assert (op == ob).mean() > 0.995


@pytest.mark.parametrize("eg", [3, 4, 8])
def test_pallas_tracer_entry_group(rng_np, eg):
    """Hierarchical candidate prep (entry_group > 1: group-level entry
    pass expanded to member leaves) commits the same hits as the exact
    per-leaf entry pass — group entries are conservative lower bounds, so
    only the visit ORDER may differ (t must match exactly; tri can differ
    on exact-tie hits only). eg=3 exercises the clamped tail group."""
    from stratum_tpu.ops import pallas_trace

    pos, idx = _random_tris(rng_np, 2000)
    fat = packet.build_fat_bvh(pos, idx, leaf_size=128)
    feat = pallas_trace.pack_leaf_features(fat)
    o, d = _random_rays(rng_np, 512)
    h0 = pallas_trace.pallas_closest(
        fat, feat, o, d, block=256, interpret=True, entry_group=1
    )
    hg = pallas_trace.pallas_closest(
        fat, feat, o, d, block=256, interpret=True, entry_group=eg
    )
    np.testing.assert_array_equal(np.asarray(h0.t), np.asarray(hg.t))
    assert (np.asarray(h0.tri) == np.asarray(hg.tri)).mean() > 0.995
    t_max = jnp.asarray((rng_np.random(512) * 10).astype(np.float32))
    o0 = np.asarray(
        pallas_trace.pallas_occluded(
            fat, feat, o, d, t_max, block=256, interpret=True, entry_group=1
        )
    )
    og = np.asarray(
        pallas_trace.pallas_occluded(
            fat, feat, o, d, t_max, block=256, interpret=True, entry_group=eg
        )
    )
    np.testing.assert_array_equal(o0, og)


@pytest.mark.parametrize("subs,epi", [(1, 8), (2, 4), (2, 2)])
def test_pallas_tracer_epi_gated(rng_np, subs, epi):
    """Epilogue-only chunk gating (one full-slab matmul per sub, per-chunk
    gated VPU epilogue) is EXACTLY equal to the ungated kernel for both
    closest and occluded — the gating must only skip work pretests prove
    irrelevant, never change a commit."""
    from stratum_tpu.ops import pallas_trace

    pos, idx = _random_tris(rng_np, 2000)
    fat = packet.build_fat_bvh(pos, idx, leaf_size=256)
    feat = pallas_trace.pack_leaf_features(fat)  # flat layout
    o, d = _random_rays(rng_np, 512)
    h0 = pallas_trace.pallas_closest(
        fat, feat, o, d, block=256, interpret=True, subs=subs, epi_chunks=1
    )
    he = pallas_trace.pallas_closest(
        fat, feat, o, d, block=256, interpret=True, subs=subs, epi_chunks=epi
    )
    assert np.array_equal(np.asarray(h0.tri), np.asarray(he.tri))
    np.testing.assert_array_equal(np.asarray(h0.t), np.asarray(he.t))
    t_max = jnp.asarray((rng_np.random(512) * 10).astype(np.float32))
    o0 = np.asarray(
        pallas_trace.pallas_occluded(
            fat, feat, o, d, t_max, block=256, interpret=True,
            subs=subs, epi_chunks=1,
        )
    )
    oe = np.asarray(
        pallas_trace.pallas_occluded(
            fat, feat, o, d, t_max, block=256, interpret=True,
            subs=subs, epi_chunks=epi,
        )
    )
    np.testing.assert_array_equal(o0, oe)


@pytest.mark.parametrize(
    "subs,early_exit,ring",
    [(1, False, 1), (2, True, 1), (4, True, 1), (2, True, 2), (4, False, 2)],
)
def test_pallas_tracer_ring(rng_np, subs, early_exit, ring):
    """Deferred-merge (ring) kernels are EXACTLY equal to the serialized
    kernels: the per-visit packed (t | idx) minima merged one visit late
    reproduce the same winners and tie-breaks, the one-visit-stale pretest
    bound only admits extra (idempotent) work, and the stale early-exit
    bound only delays the exit."""
    from stratum_tpu.ops import pallas_trace

    pos, idx = _random_tris(rng_np, 2000)
    fat = packet.build_fat_bvh(pos, idx, leaf_size=256)
    feat = pallas_trace.pack_leaf_features(fat)
    o, d = _random_rays(rng_np, 512)
    # finite t_max on a slice exercises the ring merge's bound handling
    t_max = jnp.where(
        jnp.arange(512) % 3 == 0,
        jnp.asarray((rng_np.random(512) * 20).astype(np.float32)),
        jnp.float32(pallas_trace.T_MAX),
    )
    h0 = pallas_trace.pallas_closest(
        fat, feat, o, d, t_max=t_max, block=256, interpret=True, subs=subs,
        early_exit=early_exit, ring=False,
    )
    hr = pallas_trace.pallas_closest(
        fat, feat, o, d, t_max=t_max, block=256, interpret=True, subs=subs,
        early_exit=early_exit, ring=ring,
    )
    np.testing.assert_array_equal(np.asarray(h0.t), np.asarray(hr.t))
    assert np.array_equal(np.asarray(h0.tri), np.asarray(hr.tri))
    occ_max = jnp.asarray((rng_np.random(512) * 10).astype(np.float32))
    o0 = np.asarray(
        pallas_trace.pallas_occluded(
            fat, feat, o, d, occ_max, block=256, interpret=True, subs=subs,
            ring=False,
        )
    )
    orr = np.asarray(
        pallas_trace.pallas_occluded(
            fat, feat, o, d, occ_max, block=256, interpret=True, subs=subs,
            ring=ring,
        )
    )
    np.testing.assert_array_equal(o0, orr)


@pytest.mark.parametrize("gs,subs,leaf,gate", [
    (2, 2, 128, False), (4, 1, 64, False), (8, 2, 64, False),
    (2, 2, 128, True), (4, 1, 64, True), (8, 2, 64, True),
])
def test_pallas_tracer_group_stream(rng_np, gs, subs, leaf, gate):
    """Group streaming (gs consecutive leaves per DMA, unrolled member
    commits, carried gate words) is EXACTLY equal to the serialized
    kernel — padded tail leaves (inverted AABBs, zero slabs) can neither
    pretest-pass nor commit. Leaf counts here are deliberately NOT
    multiples of gs*8 so the 8-pad and tail groups are exercised.
    gate=True additionally gates each member's DMA on its pretest word
    (GS_GATE): a skipped member's stale buffer must never be read."""
    from stratum_tpu.ops import pallas_trace

    pos, idx = _random_tris(rng_np, 1700)
    fat = packet.build_fat_bvh(pos, idx, leaf_size=leaf)
    feat = pallas_trace.pack_leaf_features(fat)
    o, d = _random_rays(rng_np, 512)
    t_max = jnp.where(
        jnp.arange(512) % 3 == 0,
        jnp.asarray((rng_np.random(512) * 20).astype(np.float32)),
        jnp.float32(pallas_trace.T_MAX),
    )
    h0 = pallas_trace.pallas_closest(
        fat, feat, o, d, t_max=t_max, block=256, interpret=True, subs=subs,
        gs=1,
    )
    hg = pallas_trace.pallas_closest(
        fat, feat, o, d, t_max=t_max, block=256, interpret=True, subs=subs,
        gs=gs, gs_gate=gate,
    )
    np.testing.assert_array_equal(np.asarray(h0.t), np.asarray(hg.t))
    assert np.array_equal(np.asarray(h0.tri), np.asarray(hg.tri))
    occ_max = jnp.asarray((rng_np.random(512) * 10).astype(np.float32))
    o0 = np.asarray(
        pallas_trace.pallas_occluded(
            fat, feat, o, d, occ_max, block=256, interpret=True, subs=subs,
            gs=1,
        )
    )
    og = np.asarray(
        pallas_trace.pallas_occluded(
            fat, feat, o, d, occ_max, block=256, interpret=True, subs=subs,
            gs=gs, gs_gate=gate,
        )
    )
    np.testing.assert_array_equal(o0, og)


def test_pallas_tracer_ring_slot_mode(rng_np):
    """Ring kernel in slot-payload mode resolves identical hit records."""
    from stratum_tpu.ops import pallas_trace

    pos, idx = _random_tris(rng_np, 1500)
    fat = packet.build_fat_bvh(pos, idx, leaf_size=256)
    feat = pallas_trace.pack_leaf_features(fat)
    o, d = _random_rays(rng_np, 512)
    h0 = pallas_trace.pallas_closest(
        fat, feat, o, d, block=256, interpret=True, ring=False
    )
    hs = pallas_trace.pallas_closest(
        fat, feat, o, d, block=256, interpret=True, ring=True,
        slot_payload=True,
    )
    # slot mode returns unresolved records; check slot -> tri agreement
    tri = np.where(
        np.asarray(hs.slot) >= 0,
        np.asarray(fat.leaf_tri).reshape(-1)[
            np.maximum(np.asarray(hs.slot), 0)
        ],
        -1,
    )
    assert np.array_equal(np.asarray(h0.tri), tri)
    np.testing.assert_array_equal(np.asarray(h0.t), np.asarray(hs.t))


def test_leaf_packing_fill_and_parity(rng_np):
    """Fill-aware leaf packing (pack_leaf_segments): merged segments stay
    within leaf_size, cover the same triangle order, raise mean fill, and
    the packed FatBVH traces identically to brute force."""
    from stratum_tpu.ops.packet import build_fat_bvh_sah, pack_leaf_segments

    pos, idx = _random_tris(rng_np, 3000, spread=10.0)
    base = build_fat_bvh_sah(pos, idx, leaf_size=64)
    if base is None:
        pytest.skip("native SAH builder unavailable")
    packed = build_fat_bvh_sah(pos, idx, leaf_size=64, pack_alpha=-1.0)
    fill_base = (np.asarray(base.leaf_tri) >= 0).mean()
    fill_packed = (np.asarray(packed.leaf_tri) >= 0).mean()
    assert packed.num_leaves < base.num_leaves
    assert fill_packed > fill_base
    # same triangle multiset
    assert set(np.asarray(packed.leaf_tri)[np.asarray(packed.leaf_tri) >= 0]
               ) == set(np.asarray(base.leaf_tri)[np.asarray(base.leaf_tri) >= 0])
    o, d = _random_rays(rng_np, 1024)
    hp = packet.packet_closest(packed, o, d, block=256, group=2)
    hr = intersect.intersect_brute_force(o, d, pos, idx)
    agree = (np.asarray(hp.tri) == np.asarray(hr.tri)).mean()
    assert agree > 0.995, agree
    # the union-area guard only blocks merges: guarded packing has at
    # least as many (tighter) leaves as pure greedy
    guarded = build_fat_bvh_sah(pos, idx, leaf_size=64, pack_alpha=1.5)
    assert guarded.num_leaves >= packed.num_leaves

    # unit: offsets boundaries are a subset and segments respect leaf_size
    offs = np.asarray([0, 10, 30, 45, 60, 64, 100])
    merged = pack_leaf_segments(offs, 64)
    assert merged[0] == 0 and merged[-1] == 100
    assert set(merged).issubset(set(offs.tolist()))
    assert (np.diff(merged) <= 64).all()
