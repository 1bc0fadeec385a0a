"""Multi-chip rendering: pixel-sample tiles sharded over a device mesh.

The reference is strictly single-GPU (SURVEY.md §2.5: one vk::Device, one
queue — src/Core/Device.cpp:126). The TPU-native scaling story replaces that
with SPMD data parallelism over the pixel domain: a 1-D ``jax.sharding.Mesh``,
``shard_map`` of the wavefront integrator over flattened pixel tiles, scene
replicated on every chip. Because the RNG is counter-based and keyed by
absolute pixel coordinates (core/rng.py), every sampling decision of the
sharded render is identical to the single-chip render; results match to
float-reassociation tolerance (~1e-7 — XLA vectorizes reductions differently
per tile shape), the strongest determinism XLA offers across shapes.

Collectives: none are needed during tracing (embarrassingly parallel);
``psum`` shows up only when accumulating cross-device statistics (mean/max
for auto-exposure, compare metrics) — those ride the ICI.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P
try:  # jax >= 0.8: public API (the experimental alias is deprecated);
    # check_rep was renamed check_vma — shim so call sites stay uniform
    from jax import shard_map as _shard_map

    def shard_map(f=None, **kw):
        kw["check_vma"] = kw.pop("check_rep", True)
        return _shard_map(f, **kw)
except ImportError:  # older jax
    from jax.experimental.shard_map import shard_map

from stratum_tpu.render import camera as scamera
from stratum_tpu.render import integrator as sintegrator


def make_mesh(devices=None, axis: str = "tiles") -> Mesh:
    """1-D mesh over all (or the given) devices."""
    devices = jax.devices() if devices is None else devices
    return Mesh(np.asarray(devices), (axis,))


def render_path_sharded(scene, view, cfg, seed, mesh: Mesh):
    """Path-trace one sample/pixel with pixel tiles sharded over ``mesh``.

    Requires width*height divisible by the mesh size. Returns [H, W, 3].
    """
    axis = mesh.axis_names[0]
    n_dev = mesh.devices.size
    num_pixels = cfg.width * cfg.height
    if num_pixels % n_dev:
        raise ValueError(
            f"{cfg.width}x{cfg.height} pixels not divisible by {n_dev} devices"
        )
    px, py = scamera.pixel_grid(cfg.width, cfg.height)

    @partial(
        shard_map,
        mesh=mesh,
        in_specs=(
            jax.tree.map(lambda _: P(), scene),
            jax.tree.map(lambda _: P(), view),
            P(axis),
            P(axis),
        ),
        out_specs=P(axis),
        check_rep=False,
    )
    def tile_render(scene_rep, view_rep, px_tile, py_tile):
        rad, _ = sintegrator.trace_path(
            scene_rep, view_rep, cfg, seed, px_tile, py_tile
        )
        return rad

    rad = tile_render(scene, view, px, py)
    return rad.reshape(cfg.height, cfg.width, 3)


@partial(jax.jit, static_argnums=(2, 4))
def _render_sharded_jit(scene, view, cfg, seed, mesh):
    return render_path_sharded(scene, view, cfg, seed, mesh)


def render_path_lanes_sharded(scene, view, cfg, spp, seed0, mesh: Mesh):
    """Lane-batched sampling (integrator.render_path_lanes) with pixel
    tiles sharded over ``mesh``: each device traces its tile's ``spp``
    samples as extra wavefront lanes. Pixel-keyed RNG + absolute-coord
    coherent-granule keying make this bit-identical to the unsharded
    lane-batched render when the per-device tile is a multiple of
    cfg.coherent_block. Returns (mean image [H, W, 3], total rays)."""
    axis = mesh.axis_names[0]
    n_dev = mesh.devices.size
    num_pixels = cfg.width * cfg.height
    if num_pixels % n_dev:
        raise ValueError(
            f"{cfg.width}x{cfg.height} pixels not divisible by {n_dev} devices"
        )
    px, py = scamera.pixel_grid(cfg.width, cfg.height)

    @partial(
        shard_map,
        mesh=mesh,
        in_specs=(
            jax.tree.map(lambda _: P(), scene),
            jax.tree.map(lambda _: P(), view),
            P(axis),
            P(axis),
        ),
        out_specs=(P(axis), P()),
        check_rep=False,
    )
    def tile_render(scene_rep, view_rep, px_tile, py_tile):
        local = px_tile.shape[0]
        pxs = jnp.tile(px_tile, spp)
        pys = jnp.tile(py_tile, spp)
        seeds = jnp.repeat(
            jnp.uint32(seed0) + jnp.arange(spp, dtype=jnp.uint32), local
        )
        rad, n_rays = sintegrator.trace_path(
            scene_rep, view_rep, cfg, seeds, pxs, pys
        )
        mean = rad.reshape(spp, local, 3).mean(axis=0)
        return mean, jax.lax.psum(n_rays, axis)

    rad, n_rays = tile_render(scene, view, px, py)
    return rad.reshape(cfg.height, cfg.width, 3), n_rays


def render_lt_sharded(scene, view, cfg, seed, mesh: Mesh):
    """Light tracing with light paths sharded over ``mesh``: every device
    traces its slice of the path budget and produces a PARTIAL splat image;
    the images ride the ICI through one ``psum`` — the TPU form of the
    reference's atomic light-trace splats + add_light_trace pass
    (path.hlsli:40-62, bdpt.hlsl:330-338). Returns [H, W, 3]."""
    from stratum_tpu.render import lighttrace as slt

    axis = mesh.axis_names[0]
    n_dev = mesh.devices.size
    num_paths = cfg.width * cfg.height
    if num_paths % n_dev:
        raise ValueError(f"{num_paths} paths not divisible by {n_dev}")
    per_dev = num_paths // n_dev
    lane0 = jnp.arange(n_dev, dtype=jnp.uint32) * np.uint32(per_dev)

    @partial(
        shard_map,
        mesh=mesh,
        in_specs=(
            jax.tree.map(lambda _: P(), scene),
            jax.tree.map(lambda _: P(), view),
            P(axis),
        ),
        out_specs=P(),
        check_rep=False,
    )
    def tile_lt(scene_rep, view_rep, lane0_tile):
        img = slt.trace_light(
            scene_rep, view_rep, cfg, seed, num_paths=per_dev,
            lane0=lane0_tile[0], total_paths=num_paths,
        )
        return jax.lax.psum(img, axis)

    splat = tile_lt(scene, view, lane0)
    emission = slt.trace_emission_only(scene, view, cfg, seed)
    return splat + emission


def render_bdpt_sharded(scene, view, cfg, seed, mesh: Mesh):
    """BDPT with camera pixels AND light paths sharded over ``mesh``.
    Per-pixel strategies (t>=2) stay local to the owning device; the t=1
    splat image is psum'd over the ICI. Returns [H, W, 3]."""
    from stratum_tpu.render import bdpt as sbdpt

    axis = mesh.axis_names[0]
    n_dev = mesh.devices.size
    num_pix = cfg.width * cfg.height
    if num_pix % n_dev:
        raise ValueError(f"{num_pix} pixels not divisible by {n_dev}")
    per_dev = num_pix // n_dev
    px, py = scamera.pixel_grid(cfg.width, cfg.height)
    lane0 = jnp.arange(n_dev, dtype=jnp.uint32) * np.uint32(per_dev)

    @partial(
        shard_map,
        mesh=mesh,
        in_specs=(
            jax.tree.map(lambda _: P(), scene),
            jax.tree.map(lambda _: P(), view),
            P(axis),
            P(axis),
            P(axis),
        ),
        out_specs=(P(axis), P()),
        check_rep=False,
    )
    def tile_bdpt(scene_rep, view_rep, px_tile, py_tile, lane0_tile):
        rad, splat = sbdpt.trace_bdpt(
            scene_rep, view_rep, cfg, seed, px_tile, py_tile,
            lane0=lane0_tile[0], num_light_paths=num_pix,
        )
        return rad, jax.lax.psum(splat, axis)

    rad, splat = tile_bdpt(scene, view, px, py, lane0)
    return (rad + splat).reshape(cfg.height, cfg.width, 3)


def render_path_progressive_sharded(scene, view, cfg, spp: int, mesh, seed0=0):
    acc = jnp.zeros((cfg.height, cfg.width, 3), jnp.float32)
    for s in range(spp):
        acc = acc + _render_sharded_jit(scene, view, cfg, seed0 + s, mesh)
    return acc / spp


def render_gbuffer_sharded(scene, view, prev_view, cfg, mesh: Mesh):
    """First-hit G-buffer with pixel tiles sharded over ``mesh``; returns
    image-shaped buffers whose rows live on the owning devices."""
    from stratum_tpu.render import aov as saov

    axis = mesh.axis_names[0]
    n_dev = mesh.devices.size
    if (cfg.width * cfg.height) % n_dev:
        raise ValueError(
            f"{cfg.width}x{cfg.height} pixels not divisible by {n_dev}"
        )
    px, py = scamera.pixel_grid(cfg.width, cfg.height)

    @partial(
        shard_map,
        mesh=mesh,
        in_specs=(
            jax.tree.map(lambda _: P(), scene),
            jax.tree.map(lambda _: P(), view),
            jax.tree.map(lambda _: P(), prev_view),
            P(axis),
            P(axis),
        ),
        out_specs=P(axis),
        check_rep=False,
    )
    def tile_gbuf(scene_rep, view_rep, prev_rep, px_tile, py_tile):
        return saov.gbuffer_flat(
            scene_rep, view_rep, prev_rep, cfg, px_tile, py_tile
        )

    flat = tile_gbuf(scene, view, prev_view, px, py)
    h, w = cfg.height, cfg.width
    return saov.GBuffer(
        albedo=flat.albedo.reshape(h, w, 3),
        normal=flat.normal.reshape(h, w, 3),
        depth=flat.depth.reshape(h, w),
        instance=flat.instance.reshape(h, w),
        prev_uv=flat.prev_uv.reshape(h, w, 2),
    )


def denoise_sharded(state, radiance, gbuf, dcfg, mesh: Mesh):
    """SVGF with image rows sharded over ``mesh``: inputs are device_put
    row-sharded and the filter runs under jit — GSPMD partitions the dense
    image math and inserts halo exchanges for the shifted taps (the
    reference's single-GPU dispatch has no analog; this is the TPU way to
    keep the whole frame pipeline on-device)."""
    from jax.sharding import NamedSharding
    from stratum_tpu.render import denoise as sdenoise

    axis = mesh.axis_names[0]
    row = NamedSharding(mesh, P(axis))

    def put(x):
        return jax.device_put(x, row)

    state = jax.tree.map(put, state)
    gbuf = jax.tree.map(put, gbuf)
    radiance = put(radiance)
    return _denoise_jit(state, radiance, gbuf, dcfg)


@partial(jax.jit, static_argnums=(3,))
def _denoise_jit(state, radiance, gbuf, dcfg):
    from stratum_tpu.render import denoise as sdenoise

    return sdenoise.denoise(state, radiance, gbuf, dcfg)


def restir_di_sharded(
    scene, view, cfg, state, seed, mesh: Mesh, candidates: int = 4,
    history_limit: float = 20.0, prev_view=None, spatial_taps: int = 0,
):
    """ReSTIR DI (render/restir.py) with the per-pixel reservoir state
    sharded over ``mesh`` pixel tiles. The stateful hazard is temporal
    reprojection: a hit's previous-frame pixel can land in ANY tile, so
    each device all-gathers the packed reservoir table ([N,16] f32 over
    the ICI) before the history fetch — reservoir rows then gather by
    absolute pixel id exactly as on one chip. With ``spatial_taps`` > 0
    the world-space hash grid is built per tile, so neighbor candidates
    stay tile-local (a valid reservoir-reuse estimator — any unbiased
    neighbor set is — but not bit-identical to the single-chip neighbor
    choice; taps=0 and the temporal path are bit-exact, test-covered).
    Returns (new sharded RestirState, direct radiance [H, W, 3])."""
    from stratum_tpu.render import restir as srestir

    axis = mesh.axis_names[0]
    n_dev = mesh.devices.size
    num_pixels = cfg.width * cfg.height
    if num_pixels % n_dev:
        raise ValueError(
            f"{cfg.width}x{cfg.height} pixels not divisible by {n_dev} devices"
        )
    px, py = scamera.pixel_grid(cfg.width, cfg.height)

    @partial(
        shard_map,
        mesh=mesh,
        in_specs=(
            jax.tree.map(lambda _: P(), scene),
            jax.tree.map(lambda _: P(), view),
            jax.tree.map(lambda _: P(axis), state),
            P(axis),
            P(axis),
        ),
        out_specs=(
            jax.tree.map(lambda _: P(axis), state),
            P(axis),
        ),
        check_rep=False,
    )
    def tile_restir(scene_rep, view_rep, state_tile, px_tile, py_tile):
        if prev_view is not None:
            packed = srestir._pack_state(state_tile)
            hist_full = jax.lax.all_gather(packed, axis, axis=0, tiled=True)
        else:
            hist_full = None
        return srestir._restir_flat(
            scene_rep, view_rep, cfg, state_tile, hist_full, px_tile,
            py_tile, seed, candidates, history_limit, prev_view,
            spatial_taps,
        )

    new_state, direct = tile_restir(scene, view, state, px, py)
    return new_state, direct.reshape(cfg.height, cfg.width, 3)


@partial(jax.jit, static_argnums=(2, 5, 6, 9))
def restir_di_sharded_jit(scene, view, cfg, state, seed, mesh,
                          candidates=4, history_limit=20.0, prev_view=None,
                          spatial_taps=0):
    return restir_di_sharded(
        scene, view, cfg, state, seed, mesh, candidates, history_limit,
        prev_view, spatial_taps,
    )


def adaptive_round_sharded(
    scene, view, cfg, accum, accum_sq, count, L, seed, mesh: Mesh,
    qmc="rand",
):
    """One adaptive-sampling round (render/adaptive._adaptive_round) with
    the top-L trace sharded over ``mesh``. The per-pixel state stays
    REPLICATED: the smoothed-variance score and the global top-L selection
    are deterministic in the state, so every device computes the identical
    pixel list; each device then traces its L/n_dev slice of that list
    (pixel-keyed RNG makes the scattered subset sample exactly what the
    single-chip round would), the [L,3] radiance all-gathers back, and
    every replica applies the same scatter-add — bit-identical to the
    single-chip round. ``qmc`` is a jit cache key (see _adaptive_round)."""
    n_dev = mesh.devices.size
    if L % n_dev:
        raise ValueError(f"L={L} not divisible by {n_dev} devices")
    return _adaptive_round_sharded_jit(
        scene, view, cfg, accum, accum_sq, count, L, seed, mesh, qmc
    )


@partial(jax.jit, static_argnums=(2, 6, 8, 9))
def _adaptive_round_sharded_jit(scene, view, cfg, accum, accum_sq, count,
                                L, seed, mesh, qmc):
    from stratum_tpu.core import math as smath
    from stratum_tpu.render import adaptive as sadaptive
    from stratum_tpu.render import integrator as sintegrator

    axis = mesh.axis_names[0]
    idx, px, py = sadaptive._topk_pixels(cfg, accum, accum_sq, count, L)

    @partial(
        shard_map,
        mesh=mesh,
        in_specs=(
            jax.tree.map(lambda _: P(), scene),
            jax.tree.map(lambda _: P(), view),
            P(axis),
            P(axis),
        ),
        out_specs=P(axis),
        check_rep=False,
    )
    def tile_trace(scene_rep, view_rep, px_tile, py_tile):
        rad, _ = sintegrator.trace_path(
            scene_rep, view_rep, cfg, seed, px_tile, py_tile
        )
        return rad

    rad = tile_trace(scene, view, px, py)  # [L,3]; resharded by the adds
    accum = accum.at[idx].add(rad)
    accum_sq = accum_sq.at[idx].add(smath.luminance(rad) ** 2)
    count = count.at[idx].add(1.0)
    return accum, accum_sq, count


def render_adaptive_sharded(
    scene, view, cfg, total_rays_budget_spp: float, mesh: Mesh,
    pilot: int = 2, frac: float = 0.25, seed0: int = 0,
):
    """render/adaptive.render_adaptive with every traced wave sharded over
    ``mesh``: uniform pilot rounds ride render_path_sharded, adaptive
    rounds ride adaptive_round_sharded; L is rounded to a device multiple.
    Returns (image [H, W, 3], AdaptiveState) matching the single-chip
    render bit-for-bit when L is unchanged by the rounding."""
    from stratum_tpu.core import rng as srng
    from stratum_tpu.render import adaptive as sadaptive
    from stratum_tpu.core import math as smath

    n = cfg.width * cfg.height
    n_dev = mesh.devices.size
    st = sadaptive.init_state(n)
    accum, accum_sq, count = st.accum, st.accum_sq, st.count
    spent = 0.0
    seed = seed0
    for _ in range(min(pilot, int(total_rays_budget_spp))):
        rad = _render_sharded_jit(scene, view, cfg, seed, mesh)
        rad = rad.reshape(n, 3)
        accum = accum + rad
        accum_sq = accum_sq + smath.luminance(rad) ** 2
        count = count + 1.0
        spent += 1.0
        seed += 1
    L = max(int(round(n * frac)), 1)
    L = max(-(-L // n_dev) * n_dev, n_dev)  # device multiple
    while spent + L / n <= total_rays_budget_spp + 1e-6:
        accum, accum_sq, count = adaptive_round_sharded(
            scene, view, cfg, accum, accum_sq, count, L, seed, mesh,
            srng.QMC,
        )
        spent += L / n
        seed += 1
    img = accum / jnp.maximum(count, 1.0)[:, None]
    state = sadaptive.AdaptiveState(accum, accum_sq, count)
    return img.reshape(cfg.height, cfg.width, 3), state


def session_frame_sharded(
    scene, view, prev_view, cfg, dcfg, dstate, seed, mesh: Mesh
):
    """One full interactive-style frame — render + G-buffer + SVGF — with
    every stage sharded over ``mesh``. Returns (new_denoise_state, image)."""
    rad = _render_sharded_jit(scene, view, cfg, seed, mesh)
    gbuf = render_gbuffer_sharded(scene, view, prev_view, cfg, mesh)
    return denoise_sharded(dstate, rad, gbuf, dcfg, mesh)
