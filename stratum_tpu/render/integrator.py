"""Render integrators: direct lighting (M1) and the path tracer built on it.

TPU-native analog of the reference's PathIntegrator
(src/Shaders/common/path.hlsli) and the ``sample_visibility`` kernel driver
(src/Shaders/kernels/renderers/bdpt.hlsl:151-300). Architectural translation:
the reference's divergent SIMT megakernel ``while(beta>0) next_vertex()``
becomes a fixed-depth bounce loop over a dense SoA ray wavefront — every
bounce is a batched pass (intersect -> shade -> NEE -> sample next direction)
with lanes masked out as paths die, which XLA vectorizes wholesale.

Deterministic pcg4d streams keyed by (pixel, seed, dimension) make renders
bit-identical under any device-mesh sharding of the pixel domain.
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from stratum_tpu.core import math as smath
from stratum_tpu.core import rng as srng
from stratum_tpu.ops import intersect
from stratum_tpu.render import camera as scamera
from stratum_tpu.render import lights as slights
from stratum_tpu.render.shading import (
    apply_normal_map,
    apply_textures,
    load_material,
    make_shading_point,
    shadow_terminator_factor,
)
from stratum_tpu.scene.schema import SceneData


@dataclasses.dataclass(frozen=True)
class RenderConfig:
    """Static render parameters (jit keys). The reference passes these as
    BDPTPushConstants + specialization-constant flags (Shaders/bdpt.h:51-81);
    here they are a hashable dataclass used with ``static_argnums``."""

    width: int = 256
    height: int = 256
    max_bounces: int = 4  # surface bounces after the camera hit
    use_nee: bool = True
    use_mis: bool = True
    unroll_bounces: int = 1  # lax.scan unroll factor for the bounce loop:
                             # each scan ITERATION BOUNDARY materializes
                             # the full wavefront carry (~20 [N] arrays)
                             # plus the stacked shadow-batch ys — unrolling
                             # lets XLA fuse bounce b's epilogue into
                             # b+1's prologue. Results are bit-identical
                             # (same body, same order). Costs compile time
                             # roughly linearly in the factor.
    rr_depth: int = 2  # bounce index where Russian roulette starts
    rr_min_beta: float = 0.05
    slim_carry: bool = False  # bounce-scan carry diet (r5, VERDICT item
                              # 8): the RNG state uint32[N,4] is
                              # (px, py, seed, dim) where only the dim
                              # counter changes per bounce and is LANE-
                              # UNIFORM by construction (every draw is a
                              # dense next_floats over the whole wave), so
                              # carry ONE uint32 scalar and rebuild st
                              # from the closed-over pixel grid each
                              # bounce; untextured scenes drop the [N]
                              # cone_dist column the same way. Bit-
                              # identical results (tested); auto-disabled
                              # under wave_caps (the compaction repacks
                              # st rows). Static jit key.
    bsdf: str = "lambert"  # "lambert" | "disney"
    tracer: str = "auto"  # "auto" | "mxu" | "bvh" | "brute"
    alpha_test: bool = False  # re-trace through alpha-masked hits
                              # (reference: eAlphaTest + alpha-tested
                              # RayQuery commits, intersection.hlsli:118-128)
    ris_candidates: int = 1  # >1 enables reservoir (RIS) NEE
                             # (reference: eNEEReservoirs, bdpt.h + ReSTIR)
    sort_rays: bool = True  # trace-local re-sort of CLOSEST waves
                            # (ops/raysort): rays enter the BVH tracers in
                            # (direction bucket, origin-morton) order and
                            # dead lanes compact to block tails; the
                            # caller's lane order never changes. Occlusion
                            # waves stay unsorted — with 128-lane sub-block
                            # gating the 10M-row sort machinery costs more
                            # than it buys there (measured 1987 / 2104 /
                            # 2406 ms/spp for closest-only / none / both).
                            # (reference: eRemapThreads/coherent-sampling,
                            # bdpt_util.hlsli:76-83)
    indirect_only: bool = False  # drop camera-visible emission and direct
                                 # lighting (path lengths <= 2): the ReSTIR
                                 # DI pass supplies those when composed by
                                 # RenderSession / --integrator=restir
    defer_shadows: bool = True  # batch every bounce's NEE shadow rays into
                                # ONE occlusion wave after the bounce loop
                                # (reference: eDeferShadowRays +
                                # trace_shadows kernel, bdpt.hlsl:304-326);
                                # cross-bounce batching amortizes candidate
                                # prep and lets one sort cohere all shadow
                                # rays together
    presample_lights: int = 0  # >0: draw this many light samples ONCE per
                               # frame into a tile and let every NEE lane
                               # pick one with a single row gather instead
                               # of per-lane CDF searches (reference:
                               # ePresampleLights + presample_lights kernel,
                               # bdpt.hlsl:86-99, PresampledLightPoint
                               # bdpt.h:92-100). Unbiased: tile entries are
                               # iid draws from the light distribution.
    clamp_indirect: float = 0.0  # >0: clamp the luminance of INDIRECT
                                 # contributions (path length >= 2) to this
                                 # value — the standard production firefly
                                 # suppressor (biased, bounded). 0 = off.
    shadow_rr: float = 0.0  # >0: Russian-roulette NEE shadow rays by
                            # unoccluded contribution — a candidate whose
                            # luminance is L survives with
                            # p = clip(L/shadow_rr, 0.05, 1) and carries
                            # 1/p (unbiased). Kills the long tail of
                            # negligible env/area candidates BEFORE the
                            # deferred wave; dead lanes fail every AABB
                            # pretest so whole sub-blocks skip their
                            # matmuls even in the unsorted shadow wave.
    debug_path_edges: int = 0  # >0: keep only contributions whose path has
                               # exactly this many edges — the estimator
                               # microscope (reference:
                               # ePathLengthContribution debug mode,
                               # bdpt.h:177-193; the per-length views sum
                               # to the full image)
    lvc_connections: int = 0  # BDPT only. >0: replace the deterministic
                              # all-pairs subpath connections with this many
                              # reservoir-resampled candidates drawn from
                              # the POOLED light-vertex cache (reference:
                              # connect_lvc, path.hlsli:682-822 +
                              # eLVC/eLVCReservoirs flags)
    coherent_tiles: int = 0  # >0 (requires presample_lights): each
                             # coherence granule of lanes draws its NEE
                             # samples from ONE block-shared group of this
                             # many consecutive tile rows, with the tile
                             # sorted so consecutive rows are nearby
                             # (env rows by direction, area rows by
                             # position morton). Per-pixel estimator is
                             # unchanged (every row still has pdf 1/T);
                             # within a granule the shadow rays aim at <=
                             # this many targets, so occlusion-wave blocks
                             # get tight candidate sets. TPU analog of the
                             # reference's wave-coherent tile sampling
                             # (WaveReadLaneFirst, path.hlsli:316-318,
                             # 378-387 under eCoherentSampling).
    coherent_block: int = 2048  # lanes per coherence granule; matches the
                                # Pallas tracer's ray-block size so one
                                # granule == one trace block
    tex_filter: str = "trilinear"  # "trilinear" (8 gathers/tap, the
                                   # reference's hardware filter) |
                                   # "stochastic" (4 gathers/tap: pick the
                                   # mip by the blend fraction per sample;
                                   # E == trilinear, so progressive
                                   # renders converge identically)
    entry_group: int = 0  # Pallas tracer hierarchical candidate prep for
                          # SORTED/secondary closest waves: block entries
                          # are computed against groups of this many
                          # DFS-adjacent leaves and expanded after the
                          # argsort (pallas_trace.ENTRY_GROUP semantics).
                          # 0 = the pallas_trace module default. Static
                          # jit key — flipping the module global under a
                          # cached trace is silently ignored (jax's trace
                          # cache is keyed by fn identity + avals, NOT
                          # module globals; measured round 4).
    entry_group_primary: int = 0  # same, for the UNSORTED primary-peel
                                  # closest wave (coherent blocks tolerate
                                  # coarser entries: g=4 measured -17% on
                                  # the isolated primary at K=256)
    entry_group_shadow: int = 0  # same, for occlusion waves (the deferred
                                 # NEE wave is 5x wider than a closest
                                 # wave, so its entry-pass cost dominates
                                 # prep; coherent-tile targets keep its
                                 # blocks tight enough for coarse entries)
    ring: int = -1  # Pallas tracer deferred-merge commit path (r4 kernel
                    # restructure, pallas_trace.RING semantics): commits
                    # write per-visit minima into a scratch slot merged one
                    # visit late, and the pretest gate word is carried a
                    # visit ahead — removes the best_ref read-modify-write
                    # serialization between MXU and VPU. -1 = module
                    # default, 0 = off, 1 = on, 2 = on + sub-pair MXU/VPU
                    # interleave (phase-split commits through a scratch
                    # ring so sub s+1's matmul streams during sub s's
                    # epilogue). Static jit key (see entry_group note on
                    # why module-global flips are unsafe under cached
                    # traces).
    gs: int = -1  # Pallas tracer group streaming (pallas_trace.GS): the
                  # candidate unit becomes this many id-consecutive leaves
                  # fetched in ONE DMA with unrolled member commits — the
                  # per-visit fixed costs amortize so small-K slabs pay
                  # off. -1 = module default, 1 = off, 2/4/8 = group size.
                  # Static jit key.
    gs_primary: int = -2  # same, for the UNSORTED primary-peel wave only
                          # (-2 = follow ``gs``): coherent waves measured
                          # the big group-stream wins (atrium primary
                          # 64.7 -> 51.5 ms at K=256/gs=4) while sorted
                          # secondary waves prefer gs=1
    gs_shadow: int = -2   # same, for occlusion waves (the deferred NEE
                          # wave is coherent-tiled, so groups help there
                          # like the primary)
    gs_gate: int = -1  # member-gated group DMAs (pallas_trace.GS_GATE):
                       # fetch each group member under its own pretest-
                       # word-gated DMA so unreachable members cost no
                       # HBM traffic. -1 = module default, 0 = off,
                       # 1 = on. Static jit key.
    binned_secondary: int = 0  # >0: trace SORTED closest waves (bounce
                               # 1+) through the binned pair-stream tracer
                               # (ops/binned.py) with this many rays per
                               # pair group; the coherent primary peel and
                               # occlusion waves stay on the block kernel.
                               # Requires sort_rays (the sort is what
                               # makes g-neighbor rays want the same
                               # leaves). 0 = off. Static jit key.
    binned_shadow: int = 0  # >0: occlusion waves through the binned
                            # pipeline at this group size (coherent-tile
                            # NEE clusters shadow targets, so caller-order
                            # groups are already coherent). 0 = off.
    binned_pcap: int = 16  # binned tracer: max leaves per pair group
                           # (overflow drops pairs -> misses; size with
                           # headroom from tools/perf_binned.py stats)
    binned_bounces: int = 0  # bounce-indexed block/binned MIX: this many
                             # EARLY post-primary bounces trace their
                             # closest wave through the UNSORTED binned
                             # tracer (it wins dense incoherent waves
                             # 1.11-1.47x and needs no trace-local sort),
                             # while the primary peel and the sparse
                             # late-bounce tail stay on the block kernel
                             # (whose early exit makes 3-8%-alive waves
                             # near-free — the binned emit tax there is
                             # what killed the all-binned e2e). Peeled
                             # bounces leave the lax.scan, so compile
                             # time grows with the count. 0 = off.
    binned_mcap_num: int = 0  # binned tracer pair capacity numerator:
                              # mcap = n * num / 8 (0 = the module default
                              # n // 2). Sized from perf_binned stats;
                              # sentinel-padded kernel steps charge ~1.1us
                              # each, so oversizing costs real time
    binned_em: str = "ray"  # binned tracer pair emission: "ray" =
                            # per-ray slab tests reduced to group bits;
                            # "group" = conservative per-group interval-
                            # arithmetic tests (g-fold fewer tests; may
                            # emit extra pairs the kernel rejects)
    binned_sb: int = 1  # binned tracer superbins: bins of ONE leaf per
                        # Pallas grid step — amortizes the ~1.1 us
                        # per-grid-step pipeline fixed cost (measured r5,
                        # tools/profile_binned_stages.py) over sb bins at
                        # the price of longer per-leaf run padding
    wave_caps: tuple = ()  # cross-bounce stream compaction (BASELINE
                           # config 5; the TPU answer to the reference's
                           # SIMT lane retirement): entry b caps bounce
                           # b's wavefront at that fraction of the launch
                           # width. Between bounces the wave compacts to
                           # the cap — dead lanes drop first; if more
                           # lanes are alive than the cap, a uniform
                           # random subset survives carrying the
                           # n_alive/cap splitting weight (unbiased, RR-
                           # style). () = scan over full-width waves.
                           # Late bounces run a fraction of the lanes
                           # (atrium: 3-8% alive by bounce 3) so trace +
                           # shade + NEE costs shrink proportionally.


# below this triangle count "auto" tests every triangle on the MXU instead of
# walking the BVH: measured on TPU v5e, gather-based traversal runs at
# ~0.15 Mrays/s (gathers cost ~5ns/row) while dense Plucker matmuls exceed
# 20 Mrays/s on Cornell-sized scenes
MXU_TRI_THRESHOLD = 16384


def resolved_tracer(scene: SceneData, cfg: RenderConfig) -> str:
    if cfg.tracer == "auto":
        if scene.geo.num_triangles <= MXU_TRI_THRESHOLD:
            return "mxu"
        # the Pallas kernel needs a real TPU; virtual-CPU meshes use the
        # XLA packet path
        import jax

        return "pallas" if jax.default_backend() == "tpu" else "packet"
    return cfg.tracer


def _trace_fns(scene: SceneData, cfg: RenderConfig):
    """Closest-hit / any-hit tracer pair (see _trace_fns3)."""
    closest, _, occluded = _trace_fns3(scene, cfg)
    return closest, occluded


def _trace_fns3(scene: SceneData, cfg: RenderConfig):
    closest, closest_u, occluded, _ = _trace_fns4(scene, cfg)
    return closest, closest_u, occluded


def _trace_fns4(scene: SceneData, cfg: RenderConfig):
    """(closest, closest_unsorted, occluded, closest_binned_peel) tracers
    — the 4th is the unsorted binned closest for the bounce-indexed mix
    (cfg.binned_bounces), or None. ``auto`` picks the MXU
    dense path for small scenes and packet traversal for large ones;
    ``brute`` is the exact oracle used by tests. Analytic spheres are merged
    in by a dense quadratic pass over every tracer (reference: procedural
    sphere commits inside the RayQuery loop, intersection.hlsli:105-117).

    ``closest_unsorted`` skips the trace-local re-sort (ops/raysort): the
    PRIMARY wave is already tile-coherent and its sort key degenerates (all
    origins are the camera, so only the 5 direction bits act), so the
    integrator peels bounce 0 onto this variant and saves the ~60 ms/wave
    sort machinery. Identical results — the sort never changes hits."""
    closest, occluded = _trace_fns_tris(scene, cfg)
    closest_u = closest
    gs_p_differs = cfg.gs_primary != -2 and cfg.gs_primary != cfg.gs
    if (
        (cfg.entry_group_primary != cfg.entry_group or gs_p_differs)
        and resolved_tracer(scene, cfg) == "pallas"
    ):
        # the unsorted primary peel gets its own (coarser) entry grouping
        # and/or group-stream factor (coherent waves love groups)
        closest_u, _ = _trace_fns_tris(
            scene,
            dataclasses.replace(
                cfg, entry_group=cfg.entry_group_primary,
                gs=cfg.gs_primary if gs_p_differs else cfg.gs,
            ),
        )
    if (
        cfg.binned_shadow > 0
        and resolved_tracer(scene, cfg) == "pallas"
    ):
        from stratum_tpu.ops import binned as sbinned

        def occluded(o, d, t, _occ_block=occluded):  # noqa: F811
            return sbinned.pallas_occluded_binned(
                scene.fat_bvh, scene.leaf_feat_packed, o, d, t,
                g=cfg.binned_shadow, pcap=cfg.binned_pcap,
                sb=cfg.binned_sb, em=cfg.binned_em,
                mcap=(o.shape[0] * cfg.binned_mcap_num // 8
                      if cfg.binned_mcap_num else None),
            )

    closest_in = closest
    if (
        cfg.binned_secondary > 0
        and resolved_tracer(scene, cfg) == "pallas"
    ):
        # sorted closest waves ride the binned pair-stream tracer; the
        # raysort wrapper below supplies the coherence it needs
        from stratum_tpu.ops import binned as sbinned

        def closest_in(o, d, tm=None):  # noqa: F811
            return sbinned.pallas_closest_binned(
                scene.fat_bvh, scene.leaf_feat_packed, o, d, t_max=tm,
                g=cfg.binned_secondary, pcap=cfg.binned_pcap,
                sb=cfg.binned_sb, em=cfg.binned_em,
                mcap=(o.shape[0] * cfg.binned_mcap_num // 8
                      if cfg.binned_mcap_num else None),
                slot_payload=scene.slot_payload,
            )

    closest_b = None
    if (
        cfg.binned_bounces > 0
        and resolved_tracer(scene, cfg) == "pallas"
    ):
        # bounce-indexed mix: the peeled early bounces trace through the
        # UNSORTED binned tracer (the emit is its own binning; measured
        # 250.7 vs the sorted block kernel's 273.7 ms on the dense
        # secondary wave, r5 session 2)
        from stratum_tpu.ops import binned as sbinned

        g_b = cfg.binned_secondary if cfg.binned_secondary > 0 else 8

        def closest_b(o, d, tm=None):
            return sbinned.pallas_closest_binned(
                scene.fat_bvh, scene.leaf_feat_packed, o, d, t_max=tm,
                g=g_b, pcap=cfg.binned_pcap, sb=cfg.binned_sb,
                em=cfg.binned_em,
                mcap=(o.shape[0] * cfg.binned_mcap_num // 8
                      if cfg.binned_mcap_num else None),
                slot_payload=scene.slot_payload,
            )

    if cfg.sort_rays and resolved_tracer(scene, cfg) in ("pallas", "packet"):
        from stratum_tpu.ops import raysort

        lo = jnp.min(scene.geo.positions, axis=0)
        hi = jnp.max(scene.geo.positions, axis=0)
        closest, _ = raysort.sorted_trace_fns(closest_in, occluded, lo, hi)
    if (
        scene.slot_payload is not None
        and resolved_tracer(scene, cfg) == "pallas"
    ):
        # slot-mode hits (see pallas_closest slot_payload): resolve
        # tri/bary + the fused shading/material payload with ONE
        # caller-order row gather, after any trace-local unsort
        from stratum_tpu.ops import pallas_trace as spallas

        def _fin(fn):
            def g(o, d, tm=None):
                return spallas.finalize_hit(
                    scene.slot_payload, o, d, fn(o, d, tm)
                )

            return g

        closest = _fin(closest)
        closest_u = _fin(closest_u)
        if closest_b is not None:
            closest_b = _fin(closest_b)
    if scene.spheres.num_spheres == 0:
        return closest, closest_u, occluded, closest_b
    from stratum_tpu.ops import spheres as sspheres
    from stratum_tpu.ops.intersect import HitRecord

    sph = scene.spheres
    t_offset = scene.geo.num_triangles  # sphere sid -> packed row T + sid

    def with_spheres(closest_fn):
        def closest2(o, d, tm=None):
            h = closest_fn(o, d, tm)
            t_s, sid, uv = sspheres.intersect_spheres(
                sph.center, sph.radius, o, d, t_max=tm
            )
            closer = t_s < h.t
            return HitRecord(
                t=jnp.where(closer, t_s, h.t),
                tri=jnp.where(closer, t_offset + sid, h.tri),
                bary=jnp.where(closer[..., None], uv, h.bary),
            )

        return closest2

    def occluded2(o, d, t):
        return occluded(o, d, t) | sspheres.occluded_spheres(
            sph.center, sph.radius, o, d, t
        )

    return (
        with_spheres(closest), with_spheres(closest_u), occluded2,
        with_spheres(closest_b) if closest_b is not None else None,
    )


def _trace_fns_tris(scene: SceneData, cfg: RenderConfig):
    from stratum_tpu.ops import bvh as sbvh
    from stratum_tpu.ops import mxu as smxu
    from stratum_tpu.ops import packet as spacket

    geo = scene.geo
    tracer = resolved_tracer(scene, cfg)
    if tracer == "mxu":
        return (
            lambda o, d, tm=None: smxu.intersect_mxu(
                o, d, scene.tri_features, t_max=tm
            ),
            lambda o, d, t: smxu.occluded_mxu(o, d, t, scene.tri_features),
        )
    if tracer == "pallas":
        from stratum_tpu.ops import pallas_trace as spallas

        # block 2048 with one sub-block per 128 lanes measured best on the
        # atrium (tools/sweep_kernel_variants.py): per-block fixed costs
        # amortize over 16 sub-blocks while each leaf only pays for the
        # sub-blocks that want it
        blk = 2048
        eg_c = cfg.entry_group if cfg.entry_group > 0 else None
        eg_o = cfg.entry_group_shadow if cfg.entry_group_shadow > 0 else None
        rng_m = None if cfg.ring < 0 else int(cfg.ring)
        gs_m = None if cfg.gs < 0 else int(cfg.gs)
        gs_o = gs_m if cfg.gs_shadow == -2 else (
            None if cfg.gs_shadow < 0 else int(cfg.gs_shadow)
        )
        gs_g = None if cfg.gs_gate < 0 else bool(cfg.gs_gate)
        return (
            lambda o, d, tm=None: spallas.pallas_closest(
                scene.fat_bvh, scene.leaf_feat_packed, o, d, t_max=tm,
                block=blk, slot_payload=scene.slot_payload,
                entry_group=eg_c, ring=rng_m, gs=gs_m, gs_gate=gs_g,
            ),
            lambda o, d, t: spallas.pallas_occluded(
                scene.fat_bvh, scene.leaf_feat_packed, o, d, t, block=blk,
                entry_group=eg_o, ring=rng_m, gs=gs_o, gs_gate=gs_g,
            ),
        )
    if tracer == "packet":
        # block size = one screen tile so block frusta stay compact
        dims = scamera.tile_dims(cfg.width, cfg.height)
        blk = max(512, min(dims[0] * dims[1] if dims else 2048, 4096))
        return (
            lambda o, d, tm=None: spacket.packet_closest(
                scene.fat_bvh, o, d, t_max=tm, block=blk
            ),
            lambda o, d, t: spacket.packet_occluded(
                scene.fat_bvh, o, d, t, block=blk
            ),
        )
    if tracer == "bvh":
        return (
            lambda o, d, tm=None: sbvh.traverse_closest(
                scene.bvh, o, d, t_max=tm
            ),
            lambda o, d, t: sbvh.traverse_occluded(scene.bvh, o, d, t),
        )
    if tracer == "null":
        # profiling fixture: synthetic hits with zero traversal cost, so
        # (end-to-end - null-tracer) isolates the shading/NEE overhead
        # (tools/profile_e2e.py). Varies tri per lane to defeat constant
        # folding of the shading gathers.
        num_tris = geo.num_triangles

        def null_closest(o, d, tm=None):
            lanes = jnp.arange(o.shape[0], dtype=jnp.int32)
            return intersect.HitRecord(
                t=jnp.full(o.shape[:1], 1.0, jnp.float32),
                tri=lanes % max(num_tris, 1),
                bary=jnp.full((o.shape[0], 2), 0.3, jnp.float32),
            )

        return null_closest, lambda o, d, t: jnp.zeros(o.shape[:1], bool)
    if tracer == "brute":
        return (
            lambda o, d, tm=None: intersect.intersect_brute_force(
                o, d, geo.positions, geo.indices, t_max=tm
            ),
            lambda o, d, t: intersect.occluded_brute_force(
                o, d, t, geo.positions, geo.indices
            ),
        )
    raise ValueError(f"unknown tracer {cfg.tracer!r}")


# resolve coherent presample-tile rows with per-granule selects instead of
# a [N]-row gather. MEASURED NEGATIVE on-chip (atrium bench config: 1366 vs
# 1180 ms/spp): the C unrolled select-accumulate passes over [G, B, W]
# cost far more HBM traffic than the one row gather they replace — unlike
# the slot-payload fusion, the tile gather was already a single op.
# Module-level knob for process A/Bs (a cached jit ignores runtime flips).
GRANULE_TILE_SELECT = False


def mis_power_heuristic(pdf_a, pdf_b):
    """Power heuristic beta=2 (reference: ``mis()``, path.hlsli:8-15)."""
    a2 = pdf_a * pdf_a
    return smath.safe_div(a2, a2 + pdf_b * pdf_b)


def _ray_jitter(px, py, seed):
    st = srng.rng_init(px, py, seed, offset=0)
    u, st = srng.next_floats(st, 2)
    return u, st


def trace_direct(scene: SceneData, view, cfg: RenderConfig, seed):
    """One sample/pixel of direct lighting with NEE only — the M1 integrator
    (baseline config 1). Returns radiance [H*W, 3]."""
    px, py = scamera.pixel_grid(cfg.width, cfg.height)
    jitter, st = _ray_jitter(px, py, seed)
    origin, direction = scamera.generate_rays(
        view, px, py, jitter, cfg.width, cfg.height
    )
    geo = scene.geo
    trace_closest, trace_occluded = _trace_fns(scene, cfg)
    hit = trace_closest(origin, direction)
    sp = make_shading_point(geo, hit.tri, hit.bary, direction)
    mat = load_material(scene.materials, sp.material)
    miss = ~hit.hit
    radiance = jnp.where(
        miss[..., None],
        slights.eval_environment(scene, direction),
        jnp.where(sp.front_face[..., None], mat.emission, 0.0),
    )

    # NEE: one light sample per pixel
    u, st = srng.next_floats(st, 3)
    ls = slights.sample_light(scene, u[..., 0], u[..., 1], u[..., 2])
    to_light = jnp.where(
        ls.is_env[..., None], ls.position, ls.position - sp.position
    )
    dist = jnp.where(ls.is_env, intersect.T_MAX * 0.5, smath.length(to_light))
    wi = jnp.where(
        ls.is_env[..., None], ls.position, to_light / dist[..., None]
    )
    cos_surf = smath.dot(wi, sp.shading_normal)
    # area lights emit from their front face only (reference: eval_emission
    # gates on the hit orientation, path.hlsli:847-894)
    cos_light = jnp.where(ls.is_env, 1.0, jnp.maximum(smath.dot(-wi, ls.normal), 0.0))
    # geometry term converts the area pdf to solid angle; env pdf is already W
    g = jnp.where(
        ls.is_env, 1.0, smath.safe_div(cos_light, dist * dist)
    )
    pdf_w = jnp.where(ls.is_env, ls.pdf_area, smath.safe_div(ls.pdf_area, g))
    f = mat.base_color * smath.INV_PI  # Lambertian (M1)
    contrib = (
        f
        * ls.radiance
        * (jnp.maximum(cos_surf, 0.0) / jnp.maximum(pdf_w, 1e-12))[..., None]
    )
    candidate = (
        hit.hit
        & (cos_surf > 0.0)
        & (jnp.max(contrib, axis=-1) > 0.0)
        & (pdf_w > 1e-12)
    )
    shadow_origin = intersect.ray_offset(sp.position, sp.geom_normal)
    occluded = trace_occluded(shadow_origin, wi, dist)
    radiance = radiance + jnp.where(
        (candidate & ~occluded)[..., None], contrib, 0.0
    )
    return radiance


@partial(jax.jit, static_argnums=(2,))
def render_direct(scene: SceneData, view, cfg: RenderConfig, seed):
    """Jitted single-sample direct-lighting image [H, W, 3]."""
    rad = trace_direct(scene, view, cfg, seed)
    return rad.reshape(cfg.height, cfg.width, 3)


def render_direct_progressive(scene, view, cfg: RenderConfig, spp: int, seed0=0):
    """Average ``spp`` independent seeds (reference: progressive accumulation
    in temporal_accumulation.hlsl's no-reprojection mode)."""
    acc = jnp.zeros((cfg.height, cfg.width, 3), jnp.float32)
    for s in range(spp):
        acc = acc + render_direct(scene, view, cfg, seed0 + s)
    return acc / spp


# ---------------------------------------------------------------------------
# path tracer (M3): wavefront bounce loop with NEE + MIS + Russian roulette
# ---------------------------------------------------------------------------

def _bsdf_fns(cfg: RenderConfig):
    from stratum_tpu.render import bsdf as sbsdf

    if cfg.bsdf == "lambert":
        return sbsdf.lambert_eval, sbsdf.lambert_sample
    if cfg.bsdf == "disney":
        from stratum_tpu.render import disney

        return disney.disney_eval, disney.disney_sample
    raise ValueError(f"unknown bsdf {cfg.bsdf!r}")


def _firefly_clamp(cfg: RenderConfig, term, depth, min_depth):
    """Clamp an indirect contribution's luminance to cfg.clamp_indirect
    (production firefly suppression; compile-time no-op when disabled)."""
    if cfg.clamp_indirect <= 0:
        return term
    lum = smath.luminance(term)
    scale = jnp.where(
        (depth >= min_depth) & (lum > cfg.clamp_indirect),
        cfg.clamp_indirect / jnp.maximum(lum, 1e-20),
        1.0,
    )
    return term * scale[..., None]


def _shadow_ray_rr(cfg: RenderConfig, contrib, candidate, st):
    """Russian roulette on NEE shadow rays (cfg.shadow_rr): survive with
    probability proportional to the unoccluded contribution's luminance,
    survivors carry 1/p. Unbiased; compile-time no-op when disabled (the
    RNG stream is untouched so default renders stay bit-identical)."""
    if cfg.shadow_rr <= 0:
        return contrib, candidate, st
    p = jnp.clip(
        smath.luminance(contrib) / cfg.shadow_rr, 0.05, 1.0
    )
    u, st = srng.next_floats(st, 1)
    keep = u[..., 0] < p
    contrib = contrib / p[..., None]
    return contrib, candidate & keep, st


def trace_path(scene: SceneData, view, cfg: RenderConfig, seed, px=None, py=None):
    """One path-traced sample per pixel. The reference megakernel loop
    ``while(beta>0) next_vertex()`` (path.hlsli:954-1075) restructured as a
    dense per-bounce wavefront; every iteration intersects, adds MIS-weighted
    emission, runs NEE with a deferred-style shadow batch, samples the BSDF
    and continues masked-dead lanes.

    ``px``/``py`` default to the full pixel grid; a sharded caller passes its
    tile of pixel coords instead (parallel/mesh.py) — because the RNG stream
    is keyed by absolute pixel coords, any tiling produces bit-identical
    radiance. Returns radiance [num_pixels, 3].
    """
    bsdf_eval, bsdf_sample = _bsdf_fns(cfg)
    geo = scene.geo
    # scene bounds (geometry + analytic spheres) for env-shadow clipping
    scene_lo = jnp.min(geo.positions, axis=0)
    scene_hi = jnp.max(geo.positions, axis=0)
    if scene.spheres.num_spheres > 0:
        r = scene.spheres.radius[:, None]
        scene_lo = jnp.minimum(
            scene_lo, jnp.min(scene.spheres.center - r, axis=0)
        )
        scene_hi = jnp.maximum(
            scene_hi, jnp.max(scene.spheres.center + r, axis=0)
        )
    (trace_closest, trace_closest_u, trace_occluded,
     trace_closest_b) = _trace_fns4(scene, cfg)
    # deferring shadow rays pays off by amortizing the BVH tracers'
    # candidate prep across bounces; the dense MXU/brute paths have no prep
    # and only gain scatter traffic (measured: Cornell 4.5 -> 3.1 Mrays/s)
    defer_shadows = cfg.defer_shadows and resolved_tracer(scene, cfg) in (
        "pallas", "packet",
    )
    cfg = dataclasses.replace(cfg, defer_shadows=defer_shadows)
    # participating media are present iff the density brick is non-trivial
    # (static shape check: empty_media uses a 1^3 brick)
    has_media = scene.media.density.shape[1] > 1
    if has_media:
        from stratum_tpu.render import medium as smedium
    if px is None:
        px, py = scamera.pixel_grid(cfg.width, cfg.height)
    jitter, st = _ray_jitter(px, py, seed)
    origin, direction = scamera.generate_rays(
        view, px, py, jitter, cfg.width, cfg.height
    )
    n = origin.shape[0]
    radiance = jnp.zeros((n, 3), jnp.float32)
    beta = jnp.ones((n, 3), jnp.float32)
    alive = jnp.ones((n,), bool)
    prev_pdf_w = jnp.full((n,), -1.0, jnp.float32)  # <0 => delta/camera vertex
    # ray-cone state: accumulated path length; the per-pixel spread angle
    # drives texture mip selection (reference: RayDifferential + ray-cone
    # LOD, path.hlsli:224-244, image_value.h:81-97)
    cone_dist = jnp.zeros((n,), jnp.float32)
    cone_angle = 2.0 * jnp.tan(view.projection.vertical_fov * 0.5) / cfg.height
    # ray counters (reference: atomic total/shadow counters ->
    # rays/sec display, Node/BDPT.cpp:197-202, 385-391)
    n_rays = jnp.zeros((), jnp.int64 if jax.config.jax_enable_x64 else jnp.uint32)

    # presampled light tile (reference: presample_lights, bdpt.hlsl:86-99):
    # T iid light samples drawn once per frame; NEE lanes pick one row each.
    # r4 auto-disabled the tile for few-light env-free scenes to save its
    # 23 ms/bounce gather — MEASURED -20% E2E on cornell (r5 bisect,
    # tools/bisect_r4_regressions.py: forced-on 1003-1008 ms/spp vs
    # auto-off 1292; the whole BENCH_r04 cornell regression): the tile
    # also replaces per-lane CDF searches + sample construction, which
    # cost far more than the gather it saves. The auto-disable is REMOVED;
    # cfg.presample_lights is honored as given (the few-light _light_row
    # select helper in render/lights.py stays — it wins wherever rows are
    # fetched outside the tile, e.g. light_pdf_area on emissive hits).
    presample_on = cfg.use_nee and cfg.presample_lights > 0
    if presample_on:
        t_tile = cfg.presample_lights
        # the tile is a FRAME-level table; with a per-lane seed array
        # (render_path_lanes) the batch shares the first sample's tile —
        # cross-sample correlation only, never bias (each lane's estimator
        # conditions on the tile the same way every pixel already does)
        tile_seed = jnp.asarray(seed, jnp.uint32).reshape(-1)[0]
        st_tile = srng.rng_init(
            jnp.arange(t_tile, dtype=jnp.uint32),
            np.uint32(0x1EA51E57), tile_seed,
        )
        ut, _ = srng.next_floats(st_tile, 3)
        tl = slights.sample_light(scene, ut[..., 0], ut[..., 1], ut[..., 2])
        light_tile = jnp.concatenate(
            [
                tl.position, tl.normal, tl.radiance,
                tl.pdf_area[:, None],
                tl.is_env.astype(jnp.float32)[:, None],
                tl.tri.astype(jnp.float32)[:, None],
                jnp.zeros((t_tile, 4), jnp.float32),
            ],
            axis=-1,
        )  # [T, 16]
        if cfg.coherent_tiles > 0:
            # order tile rows so consecutive rows are spatially close:
            # area rows by position morton, env rows (grouped last) by
            # direction morton — a coherence group of consecutive rows is
            # then a tight bundle of shadow-ray targets
            if t_tile % cfg.coherent_tiles != 0:
                raise ValueError(
                    "presample_lights must be a multiple of coherent_tiles"
                )
            from stratum_tpu.ops.bvh import morton3

            q_area = (tl.position - scene_lo) / jnp.maximum(
                scene_hi - scene_lo, 1e-9
            )
            q_env = tl.position * 0.5 + 0.5  # unit direction -> [0,1]^3
            q = jnp.where(tl.is_env[:, None], q_env, q_area)
            key = morton3(jnp.clip(q, 0.0, 1.0)) | (
                tl.is_env.astype(jnp.uint32) << jnp.uint32(31)
            )
            light_tile = light_tile[jnp.argsort(key)]
    else:
        light_tile = None

    # slim carry (see RenderConfig.slim_carry): the per-lane RNG rows and
    # the untextured cone column leave the scan carry; bit-identical
    slim = cfg.slim_carry and not cfg.wave_caps
    textured = scene.textures.resolution > 1

    def bounce(carry, _, px_l=px, py_l=py, closest_fn=None):
        closest_fn = trace_closest if closest_fn is None else closest_fn
        (origin, direction, beta, radiance, alive, prev_pdf_w, st, depth,
         n_rays, cone_dist) = carry
        if slim:
            # st arrives as the scalar dim counter (lane-uniform): rebuild
            # the full uint32[N,4] (px, py, seed, dim) state from closures
            st = srng.rng_init(px_l, py_l, seed, st)
        n_rays = n_rays + jnp.sum(alive, dtype=n_rays.dtype)
        # dead lanes trace a zero-length segment: packet/pallas blocks of
        # dead rays produce no candidates and exit immediately
        seg_max = jnp.where(alive, intersect.T_MAX, 0.0)
        hit = closest_fn(origin, direction, seg_max)
        from stratum_tpu.render import texture as stex

        if cfg.alpha_test and scene.textures.resolution > 1 and (
            scene.textures.uses(stex.SLOT_ALPHA)
        ):
            # transparent hits continue: sample the alpha mask at each hit
            # and re-trace past cut-out texels (bounded retries; the
            # reference does this inside the RayQuery candidate loop)

            for _retry in range(3):
                sp_a = make_shading_point(geo, hit.tri, hit.bary, direction)
                arow = scene.materials.packed[jnp.maximum(sp_a.material, 0)]
                alpha_tex = arow[..., 18].astype(jnp.int32)
                cutoff = arow[..., 19]
                a_val = stex.sample_bilinear(
                    scene.textures, alpha_tex, sp_a.uv
                )[..., 3]
                transparent = (
                    hit.hit & (alpha_tex >= 0) & (a_val < cutoff)
                )
                re_origin = jnp.where(
                    transparent[..., None],
                    origin + direction * (hit.t * 1.0001 + 1e-4)[..., None],
                    origin,
                )
                hit2 = closest_fn(
                    re_origin, direction,
                    jnp.where(transparent, seg_max, 0.0),
                )
                hit = jax.tree.map(
                    lambda new, old: jnp.where(
                        transparent.reshape(
                            transparent.shape + (1,) * (new.ndim - 1)
                        ),
                        new, old,
                    ),
                    hit2, hit,
                )
        if hit.payload is not None:
            # fused path: the tracer already gathered the winner's shading
            # + material rows (SceneData.slot_payload) — zero extra gathers
            from stratum_tpu.render.shading import (
                material_from_row,
                shading_point_from_row,
            )

            sp = shading_point_from_row(
                hit.payload[:, 0:32], hit.tri, hit.bary, direction
            )
            mat = material_from_row(hit.payload[:, 64:88])
            payload_mat_row = hit.payload[:, 64:88]
            payload_ntex = hit.payload[:, 63].astype(jnp.int32)
        elif scene.tri_payload is not None:
            # dense-tracer fusion: one [N, 56] gather by tri id brings the
            # shading row AND its material row (SceneData.tri_payload;
            # the split fetches measured 16 + 10.6 ms/bounce on cornell)
            from stratum_tpu.render.shading import (
                material_from_row,
                shading_point_from_row,
            )

            trow = scene.tri_payload[jnp.maximum(hit.tri, 0)]
            sp = shading_point_from_row(
                trow[:, 0:32], hit.tri, hit.bary, direction
            )
            mat = material_from_row(trow[:, 32:56])
            payload_mat_row = trow[:, 32:56]
            payload_ntex = None
        else:
            sp = make_shading_point(geo, hit.tri, hit.bary, direction)
            mat = load_material(scene.materials, sp.material)
            payload_mat_row = None
            payload_ntex = None
        # texture modulation with ray-cone mip LOD (static no-op for
        # untextured scenes: the sentinel stack has resolution 1)
        if scene.textures.resolution > 1:
            from stratum_tpu.render import texture as stex

            cone_dist = cone_dist + jnp.where(hit.hit & alive, hit.t, 0.0)
            footprint = cone_dist * cone_angle * jnp.sqrt(
                jnp.maximum(sp.uv_area, 0.0)
            )
            lod = stex.ray_cone_lod(scene.textures, footprint)
            if cfg.tex_filter == "stochastic":
                u_tex, st = srng.next_floats(st, 1)
                u_lod = u_tex[..., 0]
            else:
                u_lod = None
            mat = apply_textures(
                mat, scene.materials, scene.textures, sp.material, sp.uv,
                lod, u_lod, mat_row=payload_mat_row,
            )
            sp = sp._replace(
                shading_normal=apply_normal_map(
                    sp, scene.materials, scene.textures, lod,
                    tex_id=payload_ntex,
                )
            )

        # -- media: delta-track the segment up to the surface hit ----------
        # (reference: medium-aware trace loop, intersection.hlsli:240-285)
        if has_media:
            seg_end = jnp.where(hit.hit, hit.t, intersect.T_MAX * 0.5)
            t_scat, m_slot, m_weight, st = smedium.sample_free_flight(
                scene.media, origin, direction, seg_end, st
            )
            in_medium = alive & jnp.isfinite(t_scat)
            m_pos = origin + direction * jnp.where(
                in_medium, t_scat, 0.0
            )[..., None]
            m_g = scene.media.g[jnp.maximum(m_slot, 0)]
        else:
            in_medium = jnp.zeros_like(alive)

        # -- escaped rays: environment with MIS vs NEE ---------------------
        miss = alive & ~hit.hit & ~in_medium
        env_le, env_nee_pdf = slights.env_eval_and_pdf_w_mis(
            scene, direction
        )
        if not cfg.use_nee:
            w_env = jnp.ones_like(env_nee_pdf)
        elif cfg.use_mis:
            w_env = jnp.where(
                prev_pdf_w < 0.0,
                1.0,
                mis_power_heuristic(prev_pdf_w, env_nee_pdf),
            )
        else:
            w_env = jnp.where(prev_pdf_w < 0.0, 1.0, 0.0)
        if cfg.indirect_only:
            # env escapes at depth 0 (camera sees sky) and depth 1 (first-
            # bounce direct, the BSDF-sampling side of the pair ReSTIR DI
            # replaces) belong to the direct pass
            miss = miss & (depth >= 2)
        if cfg.debug_path_edges > 0:
            miss = miss & (depth + 1 == cfg.debug_path_edges)
        radiance = radiance + jnp.where(
            miss[..., None],
            _firefly_clamp(cfg, beta * env_le * w_env[..., None], depth, 2),
            0.0,
        )

        # -- emissive hit with MIS vs NEE (eval_emission, path.hlsli:847-894)
        is_emissive = alive & hit.hit & (sp.light >= 0) & sp.front_face & ~in_medium
        if cfg.indirect_only:
            is_emissive = is_emissive & (depth >= 2)
        if cfg.debug_path_edges > 0:
            is_emissive = is_emissive & (depth + 1 == cfg.debug_path_edges)
        dist2 = smath.length_squared(sp.position - origin)
        cos_light = jnp.abs(smath.dot(direction, sp.geom_normal))
        nee_pdf_area = slights.light_pdf_area(scene, hit.tri, sp.light)
        nee_pdf_w = smath.safe_div(nee_pdf_area * dist2, cos_light)
        if scene.spheres.num_spheres > 0 and not presample_on:
            # sphere-light hits MIS against the cone NEE strategy that
            # would have sampled them (point_on_light_pdf analog for the
            # solid-angle sampler, light.hlsli:154-174); presampled tiles
            # store area samples, so MIS stays in area measure there
            cone_pdf, cone_ok = slights.sphere_cone_pdf_w(
                scene, origin, sp.light
            )
            nee_pdf_w = jnp.where(cone_ok, cone_pdf, nee_pdf_w)
        if not cfg.use_nee:
            # BSDF sampling is the only strategy: full weight everywhere
            w_emit = jnp.ones_like(nee_pdf_w)
        elif cfg.use_mis:
            w_emit = jnp.where(
                prev_pdf_w < 0.0,
                1.0,
                mis_power_heuristic(prev_pdf_w, nee_pdf_w),
            )
        else:
            # NEE without MIS: light hits only count from delta/camera
            # vertices (reference non-MIS estimator split, path.hlsli:16-29)
            w_emit = jnp.where(prev_pdf_w < 0.0, 1.0, 0.0)
        radiance = radiance + jnp.where(
            is_emissive[..., None],
            _firefly_clamp(
                cfg, beta * mat.emission * w_emit[..., None], depth, 2
            ),
            0.0,
        )

        alive = (alive & hit.hit) | in_medium
        ns = sp.shading_normal
        wo_local = smath.to_local(-direction, ns)
        # relative IOR of the transmitted side: eta entering, 1/eta exiting
        # (reference tracks the same via front-face eta flips,
        # disney_glass.hlsli:10-27, path.hlsli:896-952 eta tracking)
        mat = mat._replace(
            eta=jnp.where(
                sp.front_face, mat.eta, 1.0 / jnp.maximum(mat.eta, 1e-6)
            )
        )

        # NEE vertex: the surface hit, or the medium scatter point for lanes
        # that scattered in a volume (reference: next_vertex dispatches
        # surface-vs-medium NEE the same way, path.hlsli:1047-1075)
        if has_media:
            nee_pos = jnp.where(in_medium[..., None], m_pos, sp.position)
            nee_shadow_origin = jnp.where(
                in_medium[..., None],
                m_pos,
                intersect.ray_offset(sp.position, sp.geom_normal),
            )
        else:
            nee_pos = sp.position
            nee_shadow_origin = intersect.ray_offset(
                sp.position, sp.geom_normal
            )

        has_sphere_lights = scene.spheres.num_spheres > 0

        if presample_on and cfg.coherent_tiles > 0:
            # block-shared tile group (re-drawn per bounce): every lane in
            # a coherence granule indexes within the same `coherent_tiles`
            # consecutive rows of the direction/position-sorted tile. Each
            # row keeps probability (C/T)*(1/C) = 1/T, so the per-pixel
            # estimator is untouched; only cross-lane correlation changes.
            n_groups = cfg.presample_lights // cfg.coherent_tiles
            # key each granule by its FIRST lane's absolute pixel coords
            # (not the local lane index): a sharded caller whose per-device
            # tile is a multiple of coherent_block then draws identical
            # groups, keeping sharded == single bit-exact.
            # Everything here is computed at GRANULE width [G] via strided
            # reshapes and broadcast back — the previous px_l[first] /
            # py_l[first] forms were two [N]-row gathers (~7 ns/row at 2M
            # lanes) for values that are constant within each granule.
            nb = cfg.coherent_block
            n_lanes = origin.shape[0]
            n_gran = -(-n_lanes // nb)
            lane_pad = n_gran * nb - n_lanes

            def _first_of_granule(x):
                return jnp.pad(x, (0, lane_pad)).reshape(n_gran, nb)[:, 0]

            gbits = srng.pcg4d(
                jnp.stack(
                    [
                        _first_of_granule(px_l).astype(jnp.uint32),
                        _first_of_granule(py_l).astype(jnp.uint32),
                        # seed may be per-lane (render_path_lanes):
                        # broadcast then take each granule's first lane
                        _first_of_granule(
                            jnp.broadcast_to(
                                jnp.asarray(
                                    depth + seed * 131, jnp.uint32
                                ),
                                (n_lanes,),
                            )
                        ),
                        jnp.full((n_gran,), 0x1D1E5, jnp.uint32),
                    ],
                    axis=-1,
                )
            )[..., 0]
            u_grp = srng._bits_to_float(gbits)
            group_base_g = (
                jnp.minimum(
                    (u_grp * n_groups).astype(jnp.int32), n_groups - 1
                )
                * cfg.coherent_tiles
            )  # [G] per-granule tile-group base row
            group_base = jnp.broadcast_to(
                group_base_g[:, None], (n_gran, nb)
            ).reshape(-1)[:n_lanes]
        else:
            group_base = None

        def sample_nee_light(u3):
            """One NEE light sample from nee_pos: env / area-triangle /
            sphere-light solid-angle cone (light.hlsli:58-121); with
            presampling on, one gather from the per-frame tile instead."""
            if presample_on:
                if (
                    group_base is not None
                    and cfg.coherent_tiles <= 32
                    and GRANULE_TILE_SELECT
                ):
                    # granule-uniform base: gather each granule's C
                    # candidate rows ONCE ([G*C] rows, ~16K instead of 2M)
                    # and resolve the per-lane row with C fused selects —
                    # a [N]-row gather costs ~7 ns/row regardless of
                    # width, so this replaces ~17 ms/bounce with ~1 ms
                    ct = cfg.coherent_tiles
                    off = jnp.minimum(
                        (u3[..., 0] * ct).astype(jnp.int32), ct - 1
                    )
                    rows_g = light_tile[
                        group_base_g[:, None]
                        + jnp.arange(ct, dtype=jnp.int32)[None, :]
                    ]  # [G, C, W]
                    offp = jnp.pad(off, (0, lane_pad)).reshape(
                        n_gran, nb
                    )
                    acc = jnp.zeros(
                        (n_gran, nb, light_tile.shape[1]), jnp.float32
                    )
                    for j in range(ct):
                        acc = acc + jnp.where(
                            (offp == j)[..., None], rows_g[:, j : j + 1, :],
                            0.0,
                        )
                    row = acc.reshape(-1, light_tile.shape[1])[:n_lanes]
                else:
                    if group_base is not None:
                        idx = group_base + jnp.minimum(
                            (u3[..., 0] * cfg.coherent_tiles).astype(
                                jnp.int32
                            ),
                            cfg.coherent_tiles - 1,
                        )
                    else:
                        idx = jnp.minimum(
                            (u3[..., 0] * cfg.presample_lights).astype(
                                jnp.int32
                            ),
                            cfg.presample_lights - 1,
                        )
                    row = light_tile[idx]  # the only gather
                ls = slights.LightSampleRecord(
                    position=row[..., 0:3],
                    normal=row[..., 3:6],
                    radiance=row[..., 6:9],
                    pdf_area=row[..., 9],
                    is_env=row[..., 10] > 0.5,
                    tri=row[..., 11].astype(jnp.int32),
                )
                return ls, jnp.zeros_like(ls.is_env)
            if has_sphere_lights:
                return slights.sample_sphere_light_cone(
                    scene, nee_pos, u3[..., 0], u3[..., 1], u3[..., 2]
                )
            ls = slights.sample_light(
                scene, u3[..., 0], u3[..., 1], u3[..., 2]
            )
            return ls, jnp.zeros_like(ls.is_env)

        def light_sample_geom(ls, pdf_is_w):
            """Direction/distance/pdf of a light sample seen from nee_pos.
            ``pdf_is_w`` lanes (cone-sampled sphere lights) already carry a
            solid-angle pdf."""
            to_light = jnp.where(
                ls.is_env[..., None], ls.position, ls.position - nee_pos
            )
            dist = jnp.where(
                ls.is_env, intersect.T_MAX * 0.5, smath.length(to_light)
            )
            wi = jnp.where(
                ls.is_env[..., None], ls.position,
                to_light / jnp.maximum(dist, 1e-20)[..., None],
            )
            cos_l = jnp.where(
                ls.is_env, 1.0, jnp.maximum(smath.dot(-wi, ls.normal), 0.0)
            )
            g = jnp.where(ls.is_env, 1.0, smath.safe_div(cos_l, dist * dist))
            pdf_w = jnp.where(
                ls.is_env | pdf_is_w,
                ls.pdf_area,
                smath.safe_div(ls.pdf_area, g),
            )
            # clip env shadow segments to the scene-bounds exit: no surface
            # exists past the AABB, so a T_MAX/2 segment only inflates the
            # traversal's candidate set (measured 69 vs 10 leaves/block on
            # the atrium). Exact — occlusion beyond the exit is impossible.
            inv_wi = jnp.where(
                jnp.abs(wi) > 1e-20, 1.0 / wi, jnp.sign(wi) * 1e20 + 1e20
            )
            t_lohi = (scene_lo[None, :] - nee_shadow_origin) * inv_wi
            t_hilo = (scene_hi[None, :] - nee_shadow_origin) * inv_wi
            t_exit = jnp.min(jnp.maximum(t_lohi, t_hilo), axis=-1)
            t_exit = jnp.maximum(t_exit, 0.0) * 1.001 + 1e-3
            dist = jnp.where(ls.is_env, jnp.minimum(dist, t_exit), dist)
            return wi, dist, cos_l, pdf_w

        def eval_scatter(wi):
            """Vertex throughput toward wi (cosine folded in for surfaces;
            albedo x HG phase for medium scatter vertices) and the forward
            solid-angle pdf of BSDF/phase sampling, for MIS."""
            wi_local = smath.to_local(wi, ns)
            ev = bsdf_eval(mat, wo_local, wi_local)
            # shading-normal shadow-terminator softening (path.hlsli:67-98;
            # Chiang-Li-Burley 2019) — no-op where ns == ng
            term = shadow_terminator_factor(sp.geom_normal, ns, wi)
            f = ev.f * (jnp.abs(wi_local[..., 2]) * term)[..., None]
            pdf_fwd = ev.pdf_fwd
            if has_media:
                ph = smedium.hg_phase(m_g, smath.dot(direction, wi))
                f = jnp.where(
                    in_medium[..., None], m_weight * ph[..., None], f
                )
                pdf_fwd = jnp.where(in_medium, ph, pdf_fwd)
            return f, pdf_fwd

        # NEE at depth 0 is exactly the direct lighting ReSTIR DI replaces
        nee_allowed = (
            alive & (depth >= 1) if cfg.indirect_only else alive
        )
        if cfg.debug_path_edges > 0:
            nee_allowed = nee_allowed & (depth + 2 == cfg.debug_path_edges)

        # -- NEE (connect_light, path.hlsli:310-366); with
        # cfg.ris_candidates > 1 the candidate is reservoir-selected by its
        # unshadowed contribution (RIS; reference: connect_light_reservoir,
        # path.hlsli:367-487) and only the winner pays a shadow ray
        if cfg.use_nee and cfg.ris_candidates > 1:
            from stratum_tpu.core import reservoir as sres

            n_lanes = origin.shape[0]
            best = dict(
                contrib=jnp.zeros((n_lanes, 3), jnp.float32),
                wi=jnp.zeros((n_lanes, 3), jnp.float32),
                dist=jnp.zeros((n_lanes,), jnp.float32),
                pdf_w=jnp.zeros((n_lanes,), jnp.float32),
            )
            res = sres.init_reservoir(best, n_lanes)
            for _m in range(cfg.ris_candidates):
                u, st = srng.next_floats(st, 4)
                ls, pdf_is_w = sample_nee_light(u)
                wi, dist, cos_l, pdf_w = light_sample_geom(ls, pdf_is_w)
                f_m, _ = eval_scatter(wi)
                c_m = f_m * ls.radiance * smath.safe_div(
                    jnp.ones_like(pdf_w), pdf_w
                )[..., None]
                c_m = jnp.where((cos_l > 0)[..., None], c_m, 0.0)
                p_hat = smath.luminance(c_m)
                cand = dict(contrib=c_m, wi=wi, dist=dist, pdf_w=pdf_w)
                res = sres.update(res, cand, p_hat, p_hat, u[..., 3])
            kept = res.sample
            wi = kept["wi"]
            dist = kept["dist"]
            w_nee = jnp.where(
                jnp.asarray(cfg.use_mis),
                mis_power_heuristic(kept["pdf_w"], eval_scatter(wi)[1]),
                1.0,
            )
            contrib = (
                beta
                * kept["contrib"]
                * smath.safe_div(
                    res.total_weight,
                    res.m * jnp.maximum(res.target_pdf, 1e-20),
                )[..., None]
                * w_nee[..., None]
            )
            candidate = nee_allowed & (res.target_pdf > 0) & (
                jnp.max(contrib, axis=-1) > 0
            )
            if has_media:
                trans, st = smedium.transmittance(
                    scene.media, nee_shadow_origin, wi, dist, st
                )
                contrib = contrib * trans[..., None]
            contrib = _firefly_clamp(cfg, contrib, depth, 1)
            contrib, candidate, st = _shadow_ray_rr(
                cfg, contrib, candidate, st
            )
            n_rays = n_rays + jnp.sum(candidate, dtype=n_rays.dtype)
            if cfg.defer_shadows:
                shadow_batch = dict(
                    origin=nee_shadow_origin, wi=wi,
                    dist=jnp.where(candidate, dist, 0.0),
                    contrib=jnp.where(candidate[..., None], contrib, 0.0),
                )
            else:
                occluded = trace_occluded(nee_shadow_origin, wi, dist)
                radiance = radiance + jnp.where(
                    (candidate & ~occluded)[..., None], contrib, 0.0
                )
        elif cfg.use_nee:
            u, st = srng.next_floats(st, 3)
            ls, pdf_is_w = sample_nee_light(u)
            wi, dist, cos_l, pdf_w = light_sample_geom(ls, pdf_is_w)
            f, pdf_fwd = eval_scatter(wi)
            w_nee = jnp.where(
                jnp.asarray(cfg.use_mis),
                mis_power_heuristic(pdf_w, pdf_fwd),
                1.0,
            )
            contrib = (
                beta
                * f
                * ls.radiance
                * smath.safe_div(w_nee, pdf_w)[..., None]
            )
            candidate = (
                nee_allowed
                & (pdf_w > 1e-12)
                & (cos_l > 0.0)
                & (jnp.max(contrib, axis=-1) > 0.0)
            )
            if has_media:
                # shadow segments attenuate through volumes (reference:
                # trace_visibility_ray always folds null-collision
                # transmittance, intersection.hlsli:192-239)
                trans, st = smedium.transmittance(
                    scene.media, nee_shadow_origin, wi, dist, st
                )
                contrib = contrib * trans[..., None]
            contrib = _firefly_clamp(cfg, contrib, depth, 1)
            contrib, candidate, st = _shadow_ray_rr(
                cfg, contrib, candidate, st
            )
            n_rays = n_rays + jnp.sum(candidate, dtype=n_rays.dtype)
            if cfg.defer_shadows:
                shadow_batch = dict(
                    origin=nee_shadow_origin, wi=wi,
                    dist=jnp.where(candidate, dist, 0.0),
                    contrib=jnp.where(candidate[..., None], contrib, 0.0),
                )
            else:
                occluded = trace_occluded(nee_shadow_origin, wi, dist)
                radiance = radiance + jnp.where(
                    (candidate & ~occluded)[..., None], contrib, 0.0
                )

        # -- BSDF sampling (sample_direction, path.hlsli:896-952) ----------
        u, st = srng.next_floats(st, 3)
        bs = bsdf_sample(mat, wo_local, u)
        new_dir = smath.to_world(bs.wi, ns)
        term = shadow_terminator_factor(sp.geom_normal, ns, new_dir)
        throughput = bs.f * smath.safe_div(
            jnp.abs(bs.wi[..., 2]) * term, bs.pdf_fwd
        )[..., None]
        new_origin = intersect.ray_offset(
            sp.position, sp.geom_normal * jnp.sign(bs.wi[..., 2:3])
        )
        pdf_next = bs.pdf_fwd
        if has_media:
            # medium continuation: HG-sample a new direction; phase/pdf = 1,
            # throughput = single-scattering albedo
            hg_dir, hg_pdf = smedium.sample_hg(
                m_g, -direction, u[..., 0], u[..., 1]
            )
            new_dir = jnp.where(in_medium[..., None], hg_dir, new_dir)
            throughput = jnp.where(
                in_medium[..., None], m_weight, throughput
            )
            new_origin = jnp.where(in_medium[..., None], m_pos, new_origin)
            pdf_next = jnp.where(in_medium, hg_pdf, pdf_next)
        beta = beta * jnp.where(alive[..., None], throughput, 1.0)
        alive = alive & (pdf_next > 1e-12) & (jnp.max(beta, axis=-1) > 0.0)
        origin = jnp.where(alive[..., None], new_origin, origin)
        direction = jnp.where(alive[..., None], new_dir, direction)
        prev_pdf_w = pdf_next

        # -- Russian roulette (path.hlsli:828-845) -------------------------
        u_rr, st = srng.next_float(st)
        p_cont = jnp.clip(smath.max3(beta), cfg.rr_min_beta, 1.0)
        do_rr = depth >= cfg.rr_depth
        survive = ~do_rr | (u_rr < p_cont)
        beta = jnp.where(
            (do_rr & survive)[..., None], beta / p_cont[..., None], beta
        )
        alive = alive & survive

        # (wavefront coherence: cfg.sort_rays now re-sorts INSIDE the
        # tracers — ops/raysort — so the integrator state never moves)
        if not (cfg.use_nee and cfg.defer_shadows):
            shadow_batch = None
        st_out = st[0, 3] if slim else st
        return (
            origin, direction, beta, radiance, alive, prev_pdf_w, st_out,
            depth + 1, n_rays, cone_dist,
        ), shadow_batch

    carry = (
        origin, direction, beta, radiance, alive, prev_pdf_w,
        st[0, 3] if slim else st,
        jnp.asarray(0), n_rays,
        jnp.zeros((), jnp.float32) if (slim and not textured) else cone_dist,
    )

    if cfg.wave_caps:
        # ---- compacting wavefront (BASELINE config 5 stream compaction):
        # Python-unrolled bounce loop where bounce b runs on a statically
        # capped lane count. Between bounces, dead lanes drop first (the
        # compaction); alive lanes beyond the cap are terminated as a
        # uniform random subset with the survivors carrying the
        # n_alive/cap splitting weight — RR-to-a-budget, unbiased. Each
        # lane's radiance scatters into the full-res image exactly once:
        # when the lane is dropped, or after the final bounce.
        def _budget(b):
            if b == 0:
                return n
            frac = float(
                cfg.wave_caps[b]
                if b < len(cfg.wave_caps)
                else cfg.wave_caps[-1]
            )
            nb = int(np.ceil(n * frac / 256.0)) * 256
            return max(min(nb, n), min(256, n))

        img = jnp.zeros((n, 3), jnp.float32)
        pid = jnp.arange(n, dtype=jnp.int32)
        px_l, py_l = px, py
        shadow_parts = []
        nb_prev = n
        for b in range(cfg.max_bounces + 1):
            carry, shadow_batch = bounce(
                carry, None, px_l=px_l, py_l=py_l,
                closest_fn=trace_closest_u if b == 0 else trace_closest,
            )
            if shadow_batch is not None:
                shadow_parts.append((shadow_batch, pid))
            if b == cfg.max_bounces:
                break
            nb_next = min(_budget(b + 1), nb_prev)
            if nb_next == nb_prev:
                continue
            (origin_c, direction_c, beta_c, rad_c, alive_c, prev_pdf_c,
             st_c, depth_c, n_rays_c, cone_c) = carry
            # selection keyed by (pixel, bounce, seed) — independent of
            # the path-sampling stream so compaction never perturbs a
            # lane's own RNG sequence
            sel_bits = srng.pcg4d(
                jnp.stack(
                    [
                        pid.astype(jnp.uint32),
                        jnp.full(pid.shape, np.uint32(b + 1), jnp.uint32),
                        jnp.broadcast_to(
                            jnp.asarray(seed, jnp.uint32), pid.shape
                        ),
                        jnp.full(pid.shape, np.uint32(0x5E1EC7), jnp.uint32),
                    ],
                    axis=-1,
                )
            )[..., 0]
            key = jnp.where(alive_c, srng._bits_to_float(sel_bits), 2.0)
            order = jnp.argsort(key)
            kept, dropped = order[:nb_next], order[nb_next:]
            img = img.at[pid[dropped]].add(rad_c[dropped])
            n_alive = jnp.sum(alive_c, dtype=jnp.float32)
            split_w = jnp.maximum(n_alive / np.float32(nb_next), 1.0)
            # compact through TWO packed row gathers (one f32, one uint32)
            # instead of 11 per-array gathers — the per-row gather cost is
            # width-independent (~7 ns/row), so 11 separate passes cost
            # ~10x more than the packs (this overhead is what made
            # compaction measure NEGATIVE before)
            fpack = jnp.concatenate(
                [
                    origin_c, direction_c, beta_c, rad_c,
                    prev_pdf_c[:, None], cone_c[:, None],
                ],
                axis=-1,
            )[kept]  # [nb_next, 14]
            upack = jnp.concatenate(
                [
                    st_c,
                    alive_c.astype(jnp.uint32)[:, None],
                    pid.astype(jnp.uint32)[:, None],
                    px_l[:, None].astype(jnp.uint32),
                    py_l[:, None].astype(jnp.uint32),
                ],
                axis=-1,
            )[kept]  # [nb_next, 8]
            carry = (
                fpack[:, 0:3], fpack[:, 3:6], fpack[:, 6:9] * split_w,
                fpack[:, 9:12], upack[:, 4] > 0, fpack[:, 12],
                upack[:, 0:4], depth_c, n_rays_c, fpack[:, 13],
            )
            pid = upack[:, 5].astype(jnp.int32)
            px_l, py_l = upack[:, 6], upack[:, 7]
            nb_prev = nb_next
        radiance_out = img.at[pid].add(carry[3])
        if cfg.use_nee and cfg.defer_shadows and shadow_parts:
            # one occlusion wave over every bounce's rays, like the scan
            # path — but accumulate full-width parts (pid == identity)
            # with a reshape+sum; a .at[].add scatter over the whole
            # concatenation measured +140 ms/spp at ~7M rows
            o_f = jnp.concatenate([sb["origin"] for sb, _ in shadow_parts])
            w_f = jnp.concatenate([sb["wi"] for sb, _ in shadow_parts])
            t_f = jnp.concatenate([sb["dist"] for sb, _ in shadow_parts])
            c_f = jnp.concatenate([sb["contrib"] for sb, _ in shadow_parts])
            occ = trace_occluded(o_f, w_f, t_f)
            hit_contrib = jnp.where((~occ & (t_f > 0))[..., None], c_f, 0.0)
            off = 0
            full, tail_contrib, tail_pid = [], [], []
            for sb, p in shadow_parts:
                w = sb["dist"].shape[0]
                part = lax.dynamic_slice_in_dim(hit_contrib, off, w)
                if w == n:
                    full.append(part)
                else:
                    tail_contrib.append(part)
                    tail_pid.append(p)
                off += w
            if full:
                radiance_out = radiance_out + sum(full)
            if tail_pid:
                radiance_out = radiance_out.at[
                    jnp.concatenate(tail_pid)
                ].add(jnp.concatenate(tail_contrib))
        return radiance_out, carry[8]

    # peel bounce 0 out of the scan: the primary wave is tile-coherent
    # already and every origin is the camera, so the trace-local sort is a
    # pure tax there (~60 ms/spp at 1080p) — bounce 0 runs the unsorted
    # tracer, the scan keeps the sorted one. Same bounce body, same RNG
    # stream: results are bit-identical.
    peel = trace_closest_u is not trace_closest
    peeled_shadow = []
    if peel:
        carry, shadow_b0 = bounce(carry, None, closest_fn=trace_closest_u)
        peeled_shadow.append(shadow_b0)
    scan_len = cfg.max_bounces + (0 if peel else 1)
    # bounce-indexed mix (cfg.binned_bounces): peel the early dense
    # secondary bounces onto the unsorted binned tracer; the sparse tail
    # stays in the scan on the block kernel (early exit)
    peel_b = (
        min(cfg.binned_bounces, scan_len)
        if (peel and trace_closest_b is not None) else 0
    )
    for _pb in range(peel_b):
        carry, shadow_pb = bounce(carry, None, closest_fn=trace_closest_b)
        peeled_shadow.append(shadow_pb)
    carry, shadow_ys = lax.scan(
        bounce, carry, None,
        length=scan_len - peel_b,
        unroll=max(1, cfg.unroll_bounces),
    )
    if peeled_shadow and cfg.use_nee and cfg.defer_shadows:
        shadow_ys = jax.tree.map(
            lambda *parts: jnp.concatenate(
                [p[None] for p in parts[:-1]] + [parts[-1]], axis=0
            ),
            *peeled_shadow, shadow_ys,
        )
    radiance_out = carry[3]

    if cfg.use_nee and cfg.defer_shadows:
        # ---- deferred shadow wave (trace_shadows, bdpt.hlsl:304-326) ------
        # every bounce's NEE rays in ONE occlusion pass; with sort_rays the
        # tracer re-orders them internally (ops/raysort), so lanes stay
        # pixel-ordered here and the accumulation is a bounce-axis sum (a
        # scattered .at[].add costs 100ms+ at 10M rows)
        d_ = cfg.max_bounces + 1
        o_f = shadow_ys["origin"].reshape(d_ * n, 3)
        w_f = shadow_ys["wi"].reshape(d_ * n, 3)
        t_f = shadow_ys["dist"].reshape(d_ * n)
        c_f = shadow_ys["contrib"].reshape(d_ * n, 3)
        occ = trace_occluded(o_f, w_f, t_f)
        hit_contrib = jnp.where(
            (~occ & (t_f > 0))[..., None], c_f, 0.0
        )
        radiance_out = radiance_out + hit_contrib.reshape(
            d_, n, 3
        ).sum(axis=0)
    return radiance_out, carry[8]


@partial(jax.jit, static_argnums=(2,))
def render_path(scene: SceneData, view, cfg: RenderConfig, seed):
    """Jitted single-sample path-traced image [H, W, 3]. Under the packet
    tracer, pixels are traced in compact screen tiles so ray blocks get
    tight frusta; the layout transform is free and results are identical
    (pixel-keyed RNG)."""
    dims = (
        scamera.tile_dims(cfg.width, cfg.height)
        if resolved_tracer(scene, cfg) in ("packet", "pallas")
        else None
    )
    if dims is None:
        rad, _ = trace_path(scene, view, cfg, seed)
        return rad.reshape(cfg.height, cfg.width, 3)
    th, tw = dims
    px, py = scamera.pixel_grid_tiled(cfg.width, cfg.height, th, tw)
    rad, _ = trace_path(scene, view, cfg, seed, px, py)
    return scamera.untile_image(rad, cfg.width, cfg.height, th, tw)


@partial(jax.jit, static_argnums=(2,))
def render_path_with_counts(scene: SceneData, view, cfg: RenderConfig, seed):
    """As render_path but also returns the traced-ray count (closest +
    shadow rays actually alive), for rays/sec reporting."""
    dims = (
        scamera.tile_dims(cfg.width, cfg.height)
        if resolved_tracer(scene, cfg) in ("packet", "pallas")
        else None
    )
    if dims is None:
        rad, n_rays = trace_path(scene, view, cfg, seed)
        return rad.reshape(cfg.height, cfg.width, 3), n_rays
    th, tw = dims
    px, py = scamera.pixel_grid_tiled(cfg.width, cfg.height, th, tw)
    rad, n_rays = trace_path(scene, view, cfg, seed, px, py)
    return scamera.untile_image(rad, cfg.width, cfg.height, th, tw), n_rays


def render_path_progressive(scene, view, cfg: RenderConfig, spp: int, seed0=0):
    acc = jnp.zeros((cfg.height, cfg.width, 3), jnp.float32)
    for s in range(spp):
        acc = acc + render_path(scene, view, cfg, seed0 + s)
    return acc / spp


@partial(jax.jit, static_argnums=(2, 3))
def render_path_batched(scene, view, cfg: RenderConfig, spp: int, seed0=0):
    """All ``spp`` samples in ONE compiled launch: a ``lax.scan`` over sample
    seeds accumulates radiance on-device, so per-sample dispatch and host
    sync vanish from the steady state (the reference amortizes this cost by
    never leaving the GPU between frames; Node/Application.cpp:7-88).
    Bit-identical to averaging ``spp`` ``render_path`` calls (sequential sum,
    same per-sample program). Returns (mean image [H, W, 3], total rays)."""
    dims = (
        scamera.tile_dims(cfg.width, cfg.height)
        if resolved_tracer(scene, cfg) in ("packet", "pallas")
        else None
    )
    if dims is None:
        px = py = None
    else:
        px, py = scamera.pixel_grid_tiled(cfg.width, cfg.height, *dims)

    def sample(carry, seed):
        acc, rays = carry
        rad, n_rays = trace_path(scene, view, cfg, seed, px, py)
        return (acc + rad, rays + n_rays), None

    n = cfg.width * cfg.height
    acc0 = jnp.zeros((n, 3), jnp.float32)
    rays0 = jnp.zeros(
        (), jnp.int64 if jax.config.jax_enable_x64 else jnp.uint32
    )
    seeds = seed0 + jnp.arange(spp, dtype=jnp.int32)
    (acc, rays), _ = lax.scan(sample, (acc0, rays0), seeds)
    acc = acc / spp
    if dims is None:
        return acc.reshape(cfg.height, cfg.width, 3), rays
    return scamera.untile_image(acc, cfg.width, cfg.height, *dims), rays


@partial(jax.jit, static_argnums=(2, 3))
def render_path_lanes(scene, view, cfg: RenderConfig, spp: int, seed0=0):
    """All ``spp`` samples of every pixel in ONE wavefront: the lane axis is
    [spp x pixels], so each bounce traces a single ``spp * num_pix``-ray
    wave. Complementary to :func:`render_path_batched` (a sequential scan
    over samples): same-pixel samples start as near-identical rays, so the
    trace-local sort (ops/raysort) packs them into tighter, more coherent
    blocks — fewer leaf visits per ray — while per-wave fixed costs
    (candidate entry pass, block prep) amortize across the batch. This is
    only possible because the RNG is keyed by (pixel, seed, dimension):
    lane (s, p) computes EXACTLY the single-sample estimator for pixel p
    with seed ``seed0+s``, so the average is the plain progressive mean.
    With presampled NEE the per-frame light tile is built from ``seed0``
    and shared by the whole batch (cross-sample correlation only — the
    same tradeoff coherent_tiles already makes). Memory scales with
    ``spp``; 2-4 is the practical range at 1080p on a 16G chip.
    Returns (mean image [H, W, 3], total rays)."""
    dims = (
        scamera.tile_dims(cfg.width, cfg.height)
        if resolved_tracer(scene, cfg) in ("packet", "pallas")
        else None
    )
    if dims is None:
        px, py = scamera.pixel_grid(cfg.width, cfg.height)
    else:
        px, py = scamera.pixel_grid_tiled(cfg.width, cfg.height, *dims)
    n = cfg.width * cfg.height
    pxs = jnp.tile(px, spp)
    pys = jnp.tile(py, spp)
    seeds = jnp.repeat(
        jnp.uint32(seed0) + jnp.arange(spp, dtype=jnp.uint32), n
    )
    rad, n_rays = trace_path(scene, view, cfg, seeds, pxs, pys)
    acc = rad.reshape(spp, n, 3).mean(axis=0)
    if dims is None:
        return acc.reshape(cfg.height, cfg.width, 3), n_rays
    return scamera.untile_image(acc, cfg.width, cfg.height, *dims), n_rays
