"""Device scene schema: the single source of truth for scene data layouts.

TPU-native analog of the reference's shared C++/HLSL scene headers
(src/Shaders/scene.h, src/Shaders/materials/disney_data.h and the flattened
``SceneData`` built by src/Node/Scene.cpp:299-684). Where the reference packs
bitfields into ``uint4`` records and byte-serialized material streams for a
bindless GPU descriptor world, the TPU-native layout is plain struct-of-arrays
pytrees: every field is a padded, statically-shaped ``jnp`` array so a
``SceneData`` can be passed straight into jit'ted render functions, donated,
and sharded (replicated) across a device mesh.

Conventions:
- Geometry is flattened to **world space** at scene-flatten time (the
  reference instead builds a TLAS of object-space BLASes and lets the driver
  transform rays, Core/AccelerationStructure.*). World-space flattening makes
  traversal transform-free, which is what a dense SIMD wavefront wants.
- Triangle arrays are padded to a multiple of ``TRI_PAD`` with degenerate
  triangles (all three indices = 0 pointing at a padded origin vertex) which
  can never be hit (Moller-Trumbore determinant = 0).
- ``-1`` is the universal "no entry" sentinel (no light, no texture), mirroring
  the reference's INVALID_INSTANCE (scene.h:23).
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp
import numpy as np

from stratum_tpu.core.distribution import Dist1D, Dist2D, build_dist1d, build_dist2d
from stratum_tpu.ops.bvh import BVHData

TRI_PAD = 128  # pad triangle count to the TPU lane width
VERT_PAD = 8

# instance types (reference scene.h:13-15)
INSTANCE_TRIANGLES = 0
INSTANCE_SPHERE = 1
INSTANCE_VOLUME = 2


class GeometrySoA(NamedTuple):
    """Merged world-space triangle soup (reference: merged vertex/index
    buffers + PackedVertexData, scene.h:81-94, built at Scene.cpp:643-683)."""

    positions: jnp.ndarray  # f32 [V, 3] world space
    normals: jnp.ndarray  # f32 [V, 3] world space shading normals (unit)
    uvs: jnp.ndarray  # f32 [V, 2]
    indices: jnp.ndarray  # i32 [T, 3]
    tri_material: jnp.ndarray  # i32 [T] material row (-1 on padding)
    tri_light: jnp.ndarray  # i32 [T] light row or -1
    tri_instance: jnp.ndarray  # i32 [T] owning instance id (visibility/pick)
    # one-gather shading row [T, 32]: p0|e1|e2|n0|n1|n2|uv0|uv1|uv2|
    # material|light|instance|pad (XLA gathers cost ~5ms per OP almost
    # independent of row width — consolidating 13 gathers into 1 is the
    # single biggest shading speedup measured on TPU)
    packed_tri: jnp.ndarray  # f32 [T, 32]

    @property
    def num_triangles(self) -> int:
        return self.indices.shape[0]

    @property
    def num_vertices(self) -> int:
        return self.positions.shape[0]


class DisneyMaterials(NamedTuple):
    """SoA Disney BSDF parameters, one row per unique material
    (reference: DisneyMaterialData 3xfloat4, materials/disney_data.h:1-45;
    dedup + serialization at Scene.cpp:387-396). Texture indices index the
    scene texture stack; -1 means "constant only" (image_value.h semantics:
    value = factor x optional texture)."""

    base_color: jnp.ndarray  # f32 [M, 3]
    emission: jnp.ndarray  # f32 [M, 3]
    metallic: jnp.ndarray  # f32 [M]
    roughness: jnp.ndarray  # f32 [M]
    anisotropic: jnp.ndarray  # f32 [M]
    subsurface: jnp.ndarray  # f32 [M]
    clearcoat: jnp.ndarray  # f32 [M]
    clearcoat_gloss: jnp.ndarray  # f32 [M]
    transmission: jnp.ndarray  # f32 [M]
    eta: jnp.ndarray  # f32 [M]
    base_color_tex: jnp.ndarray  # i32 [M] texture id or -1
    emission_tex: jnp.ndarray  # i32 [M]
    rough_metal_tex: jnp.ndarray  # i32 [M] (g=roughness, b=metallic; glTF ORM)
    normal_tex: jnp.ndarray  # i32 [M]
    alpha_tex: jnp.ndarray  # i32 [M] alpha mask for alpha test
    alpha_cutoff: jnp.ndarray  # f32 [M]
    packed: jnp.ndarray  # f32 [M, 24] one-gather row of all of the above

    @property
    def num_materials(self) -> int:
        return self.base_color.shape[0]


class SphereSoA(NamedTuple):
    """Analytic sphere primitives (reference: INSTANCE_SPHERE procedural
    AABBs with exact ray_sphere hits, scene.h:13-15 +
    intersection.hlsli:105-117). Radius <= 0 marks padding rows; shading
    data for sphere hits comes from rows APPENDED to ``packed_tri`` (the
    sphere sid's row sits at index num_triangles + sid with the sphere
    flag set at slot 27)."""

    center: jnp.ndarray  # f32 [S, 3] world space
    radius: jnp.ndarray  # f32 [S]
    material: jnp.ndarray  # i32 [S]
    light: jnp.ndarray  # i32 [S] light row or -1
    instance: jnp.ndarray  # i32 [S]

    @property
    def num_spheres(self) -> int:
        return self.radius.shape[0]


def empty_spheres() -> SphereSoA:
    return SphereSoA(
        center=jnp.zeros((0, 3), jnp.float32),
        radius=jnp.zeros((0,), jnp.float32),
        material=jnp.zeros((0,), jnp.int32),
        light=jnp.full((0,), -1, jnp.int32),
        instance=jnp.zeros((0,), jnp.int32),
    )


def pack_sphere_rows(center, radius, material, light, instance) -> np.ndarray:
    """[S, 32] shading rows for analytic spheres, appended to packed_tri:
    [0:3]=center, [3]=radius, [24]=material, [25]=light, [26]=instance,
    [27]=1.0 (sphere flag). make_shading_point reconstructs position/
    normal/uv from (row, bary=(phi/2pi, theta/pi))."""
    s = radius.shape[0]
    rows = np.zeros((s, 32), np.float32)
    rows[:, 0:3] = center
    rows[:, 3] = radius
    rows[:, 24] = material
    rows[:, 25] = light
    rows[:, 26] = instance
    rows[:, 27] = 1.0
    return rows


class LightData(NamedTuple):
    """Emissive-triangle light table + power distribution (reference: light
    instance map + power CDF, Scene.cpp:602-612, sampled by
    Shaders/common/light.hlsli:24-35)."""

    tri_index: jnp.ndarray  # i32 [L] triangle row of each light
    area: jnp.ndarray  # f32 [L] world-space area
    power: jnp.ndarray  # f32 [L] emitted power (for power-weighted sampling)
    power_dist: Dist1D  # over L
    num_lights: jnp.ndarray  # i32 scalar (0 => no area lights)
    env_probability: jnp.ndarray  # f32 scalar: P(sample env | sampling a light)
    # one-gather sampling row [L, 16]: p0|e1|e2|Le|area|sel_pdf|tri|pad
    packed: jnp.ndarray  # f32 [L, 16]


class Environment(NamedTuple):
    """Environment map + importance-sampling tables (reference:
    Shaders/environment.h:48-144). A 1x1 image is a constant environment.

    Two interchangeable samplers are carried: the 2D CDF tables (``dist``,
    environment.h:48-70) and a luminance*sin(theta) mip pyramid
    (``lum_mips``) for the reference's hierarchical texel descent
    (sample_texel, bdpt_util.hlsli:85-180) — select via
    render.lights.ENV_SAMPLER."""

    emission: jnp.ndarray  # f32 [He, We, 3] equirect radiance
    dist: Dist2D  # luminance * sin(theta) importance tables
    lum_mips: jnp.ndarray  # f32 [rows] flat sum-pyramid atlas (pow2 dims)
    # rgb radiance + the dist2d joint uv pdf in ONE row, so the per-bounce
    # escape path (radiance + MIS pdf) costs ONE gather instead of three
    # (emission + marginal pdf + conditional pdf): XLA row gathers cost
    # ~7 ns/row regardless of width, so op count is everything
    emission_pdf: jnp.ndarray  # f32 [He, We, 4]


class SceneData(NamedTuple):
    """Everything a render kernel needs, as one pytree
    (reference: SceneData, Node/Scene.hpp:46-69; the ``bvh`` member plays the
    role of the TLAS, Scene.cpp:614-629)."""

    geo: GeometrySoA
    materials: DisneyMaterials
    lights: LightData
    env: Environment
    bvh: BVHData
    textures: "TextureStack"  # render/texture.py (4096-image bindless analog)
    tri_features: jnp.ndarray  # f32 [T,10,4] Plucker blocks (ops/mxu.py)
    fat_bvh: "FatBVH"  # ops/packet.py block-traversal structure
    leaf_feat_packed: jnp.ndarray  # f32 [L,16,4K] Pallas DMA slabs
    media: "MediumData"  # render/medium.py volume stack (gVolumeCount analog)
    spheres: SphereSoA  # analytic sphere primitives (ops/spheres.py)
    # per-instance motion transform: current world -> PREVIOUS world (for
    # motion vectors / temporal reprojection; reference: motion transforms,
    # Scene.cpp:398-427 + scene.h InstanceData motion). Identity when the
    # scene was flattened without a prev_time.
    instance_motion: jnp.ndarray  # f32 [I, 3, 4]
    # fused per-SLOT hit payload [L*K, 88] f32 (slot = leaf*K + k, the
    # Pallas tracer's winner id): cols 0-31 packed_tri shading row of the
    # slot's triangle, 32-61 its Moller-Trumbore a/u/v feature coeffs
    # (f-major: col 32+f*3+q), 62 tri id as f32 (exact below 2^24; -1 =
    # padding slot), 63 the material's normal-texture id, 64-87 the
    # triangle's material row
    # (DisneyMaterials.packed). ONE [N, 88]-row gather by slot replaces the
    # tracer's feature + tri-id gathers AND the integrator's shading +
    # material gathers: XLA row gathers cost ~7 ns/row REGARDLESS OF WIDTH
    # (a [2M,96] gather == a [2M,32] gather == 24 ms), so four 14-24 ms
    # gathers per bounce collapse into one. ~600 B/triangle of HBM;
    # None when the scene has no fat BVH.
    slot_payload: jnp.ndarray | None = None
    # fused per-TRI hit payload [T(+S), 56] f32 for the DENSE tracer paths
    # (MXU / packet / brute — hits carry tri ids, not BVH slots): cols
    # 0-31 the packed_tri shading row, 32-55 the triangle's material row.
    # One gather replaces the integrator's shading + material gathers
    # (the cornell attribution measured them at 16 + 10.6 ms/bounce)
    tri_payload: jnp.ndarray | None = None


# ---------------------------------------------------------------------------
# host-side builders (numpy in, device arrays out)
# ---------------------------------------------------------------------------

def _pad_to(n: int, mult: int) -> int:
    return ((n + mult - 1) // mult) * mult


def default_material_arrays(n: int) -> dict:
    return dict(
        base_color=np.full((n, 3), 0.8, np.float32),
        emission=np.zeros((n, 3), np.float32),
        metallic=np.zeros((n,), np.float32),
        roughness=np.ones((n,), np.float32),
        anisotropic=np.zeros((n,), np.float32),
        subsurface=np.zeros((n,), np.float32),
        clearcoat=np.zeros((n,), np.float32),
        clearcoat_gloss=np.ones((n,), np.float32),
        transmission=np.zeros((n,), np.float32),
        eta=np.full((n,), 1.5, np.float32),
        base_color_tex=np.full((n,), -1, np.int32),
        emission_tex=np.full((n,), -1, np.int32),
        rough_metal_tex=np.full((n,), -1, np.int32),
        normal_tex=np.full((n,), -1, np.int32),
        alpha_tex=np.full((n,), -1, np.int32),
        alpha_cutoff=np.full((n,), 0.5, np.float32),
    )


def finalize_materials(arrs: dict) -> DisneyMaterials:
    """Field dict (numpy) -> DisneyMaterials with the packed one-gather row
    (same rationale as GeometrySoA.packed_tri)."""
    n = arrs["base_color"].shape[0]
    packed = np.zeros((n, 24), np.float32)
    packed[:, 0:3] = arrs["base_color"]
    packed[:, 3:6] = arrs["emission"]
    for i, f in enumerate((
        "metallic", "roughness", "anisotropic", "subsurface", "clearcoat",
        "clearcoat_gloss", "transmission", "eta",
    )):
        packed[:, 6 + i] = arrs[f]
    for i, f in enumerate((
        "base_color_tex", "emission_tex", "rough_metal_tex", "normal_tex",
        "alpha_tex",
    )):
        packed[:, 14 + i] = arrs[f]
    packed[:, 19] = arrs["alpha_cutoff"]
    return DisneyMaterials(
        packed=jnp.asarray(packed),
        **{k: jnp.asarray(v) for k, v in arrs.items()},
    )


def make_materials(**fields) -> DisneyMaterials:
    """Build a DisneyMaterials from per-field numpy arrays; missing fields get
    defaults. All fields must share the leading length M."""
    lengths = {np.shape(v)[0] for v in fields.values()}
    if len(lengths) != 1:
        raise ValueError(f"inconsistent material field lengths: {lengths}")
    n = lengths.pop()
    arrs = default_material_arrays(n)
    for k, v in fields.items():
        if k not in arrs:
            raise KeyError(f"unknown material field {k!r}")
        arrs[k] = np.asarray(v, arrs[k].dtype).reshape(arrs[k].shape)
    return finalize_materials(arrs)


def env_mip_dims(he: int, we: int):
    """Static level dims for the env luminance pyramid, finest first:
    [(H2, W2), (H2/2, W2/2), ..., (1, 1)] with H2/W2 = next pow2."""
    h2 = 1
    while h2 < he:
        h2 *= 2
    w2 = 1
    while w2 < we:
        w2 *= 2
    dims = [(h2, w2)]
    while dims[-1] != (1, 1):
        h, w = dims[-1]
        dims.append((max(h // 2, 1), max(w // 2, 1)))
    return dims


def build_env_mips(lum: np.ndarray) -> np.ndarray:
    """luminance*sin(theta) [He, We] -> flat SUM-pyramid atlas (pow2 dims,
    finest level first). Sums (not means) so 2x2 child weights at any
    level are proportional to contained energy — the quantity the
    hierarchical descent splits on (bdpt_util.hlsli:96-120)."""
    he, we = lum.shape
    dims = env_mip_dims(he, we)
    h2, w2 = dims[0]
    base = np.zeros((h2, w2), np.float32)
    # area-resample into the pow2 canvas preserving total energy
    ys = (np.arange(h2) * he) // h2
    xs = (np.arange(w2) * we) // w2
    base[:, :] = lum[ys][:, xs]
    # bake the equirect sin(theta) row weight at the finest level; sums
    # carry it coarser (the reference multiplies per level, :103-116)
    base *= np.sin(np.pi * (np.arange(h2) + 0.5) / h2)[:, None]
    levels = [base]
    for h, w in dims[1:]:
        prev = levels[-1]
        ph, pw = prev.shape
        levels.append(
            prev.reshape(h, ph // h, w, pw // w).sum(axis=(1, 3))
        )
    return np.concatenate([l.reshape(-1) for l in levels])


def pack_emission_pdf(emission, dist: Dist2D) -> jnp.ndarray:
    """[He, We, 4] = rgb radiance | dist2d joint uv pdf (the fused
    one-gather row for the escape path; Environment.emission_pdf)."""
    joint = (
        jnp.asarray(dist.marginal.pdf)[:, None] * jnp.asarray(dist.cond_pdf)
    )
    return jnp.concatenate(
        [jnp.asarray(emission), joint[..., None]], axis=-1
    )


def make_environment(emission, dist: Dist2D, lum_mips) -> Environment:
    """Environment with the fused emission+pdf row precomputed."""
    emission = jnp.asarray(emission)
    return Environment(
        emission=emission,
        dist=dist,
        lum_mips=jnp.asarray(lum_mips),
        emission_pdf=pack_emission_pdf(emission, dist),
    )


def constant_environment(rgb=(0.0, 0.0, 0.0)) -> Environment:
    img = np.broadcast_to(np.asarray(rgb, np.float32), (1, 1, 3)).copy()
    return make_environment(
        emission=img,
        dist=build_dist2d(np.ones((1, 1), np.float32)),
        lum_mips=build_env_mips(np.ones((1, 1), np.float32)),
    )


def build_geometry(
    positions: np.ndarray,
    normals: np.ndarray,
    uvs: np.ndarray,
    indices: np.ndarray,
    tri_material: np.ndarray,
    tri_instance: np.ndarray | None = None,
) -> tuple[np.ndarray, ...]:
    """Pad host-side geometry arrays (returns numpy; light assignment happens
    in flatten before upload)."""
    v = positions.shape[0]
    t = indices.shape[0]
    vp = max(_pad_to(v, VERT_PAD), VERT_PAD)
    tp = max(_pad_to(t, TRI_PAD), TRI_PAD)
    pos = np.zeros((vp, 3), np.float32)
    pos[:v] = positions
    nrm = np.zeros((vp, 3), np.float32)
    nrm[:v] = normals
    nrm[v:, 2] = 1.0
    uv = np.zeros((vp, 2), np.float32)
    uv[:v] = uvs
    idx = np.zeros((tp, 3), np.int32)
    idx[:t] = indices
    mat = np.full((tp,), -1, np.int32)
    mat[:t] = tri_material
    inst = np.zeros((tp,), np.int32)
    if tri_instance is not None:
        inst[:t] = tri_instance
    return pos, nrm, uv, idx, mat, inst


def pack_tri_rows(positions, normals, uvs, indices, tri_material, tri_light,
                  tri_instance):
    """Build the [T, 32] one-gather shading rows (host numpy)."""
    t = indices.shape[0]
    p0 = positions[indices[:, 0]]
    p1 = positions[indices[:, 1]]
    p2 = positions[indices[:, 2]]
    rows = np.zeros((t, 32), np.float32)
    rows[:, 0:3] = p0
    rows[:, 3:6] = p1 - p0
    rows[:, 6:9] = p2 - p0
    rows[:, 9:12] = normals[indices[:, 0]]
    rows[:, 12:15] = normals[indices[:, 1]]
    rows[:, 15:18] = normals[indices[:, 2]]
    rows[:, 18:20] = uvs[indices[:, 0]]
    rows[:, 20:22] = uvs[indices[:, 1]]
    rows[:, 22:24] = uvs[indices[:, 2]]
    rows[:, 24] = tri_material
    rows[:, 25] = tri_light
    rows[:, 26] = tri_instance
    return rows


def triangle_areas(positions: np.ndarray, indices: np.ndarray) -> np.ndarray:
    p0 = positions[indices[:, 0]]
    e1 = positions[indices[:, 1]] - p0
    e2 = positions[indices[:, 2]] - p0
    return 0.5 * np.linalg.norm(np.cross(e1, e2), axis=-1)


def build_lights(
    positions: np.ndarray,
    indices: np.ndarray,
    tri_material: np.ndarray,
    emission: np.ndarray,
    env_probability: float = 0.0,
    sphere_center: np.ndarray | None = None,
    sphere_radius: np.ndarray | None = None,
    sphere_material: np.ndarray | None = None,
) -> tuple:
    """Find emissive triangles AND emissive analytic spheres, build the
    power distribution (reference: Scene.cpp:602-612; sphere lights =
    light.hlsli:58-121). Light row slot 15 is the type flag (0 triangle,
    1 sphere; sphere rows: slot 0:3 = center, 3 = radius, 12 = 4 pi r^2).
    Returns (LightData, tri_light[T], sphere_light[S])."""
    t = indices.shape[0]
    tri_light = np.full((t,), -1, np.int32)
    valid = tri_material >= 0
    lum = np.zeros((t,), np.float32)
    lum[valid] = emission[tri_material[valid]].mean(axis=-1)
    light_tris = np.nonzero(lum > 0.0)[0].astype(np.int32)
    nl = len(light_tris)
    s = 0 if sphere_radius is None else sphere_radius.shape[0]
    sphere_light = np.full((s,), -1, np.int32)
    if s:
        light_sph = np.nonzero(
            (emission[np.maximum(sphere_material, 0)].mean(axis=-1) > 0)
            & (sphere_radius > 0)
        )[0].astype(np.int32)
    else:
        light_sph = np.zeros((0,), np.int32)
    ns = len(light_sph)
    ntot = nl + ns
    npad = max(_pad_to(max(ntot, 1), 8), 8)
    tri_light[light_tris] = np.arange(nl, dtype=np.int32)
    sphere_light[light_sph] = nl + np.arange(ns, dtype=np.int32)
    areas = np.zeros((npad,), np.float32)
    powers = np.zeros((npad,), np.float32)
    tri_idx = np.zeros((npad,), np.int32)
    packed = np.zeros((npad, 16), np.float32)
    if nl:
        a = triangle_areas(positions, indices[light_tris])
        areas[:nl] = a
        powers[:nl] = lum[light_tris] * a * np.pi  # two-sided handled at eval
        tri_idx[:nl] = light_tris
        p0 = positions[indices[light_tris, 0]]
        p1 = positions[indices[light_tris, 1]]
        p2 = positions[indices[light_tris, 2]]
        packed[:nl, 0:3] = p0
        packed[:nl, 3:6] = p1 - p0
        packed[:nl, 6:9] = p2 - p0
        packed[:nl, 9:12] = emission[tri_material[light_tris]]
    if ns:
        r = sphere_radius[light_sph]
        a = 4.0 * np.pi * r * r
        le = emission[sphere_material[light_sph]]
        areas[nl:ntot] = a
        powers[nl:ntot] = le.mean(axis=-1) * a * np.pi
        tri_idx[nl:ntot] = -2 - light_sph  # encoded: not a triangle row
        packed[nl:ntot, 0:3] = sphere_center[light_sph]
        packed[nl:ntot, 3] = r
        packed[nl:ntot, 9:12] = le
        packed[nl:ntot, 15] = 1.0
    weights = powers if powers.sum() > 0 else np.ones((npad,), np.float32)
    power_dist = build_dist1d(weights)
    packed[:, 12] = areas
    packed[:, 13] = np.asarray(power_dist.pdf) / npad  # discrete mass
    packed[:, 14] = tri_idx
    return (
        LightData(
            tri_index=jnp.asarray(tri_idx),
            area=jnp.asarray(areas),
            power=jnp.asarray(powers),
            power_dist=power_dist,
            num_lights=jnp.asarray(ntot, jnp.int32),
            env_probability=jnp.asarray(env_probability, jnp.float32),
            packed=jnp.asarray(packed),
        ),
        tri_light,
        sphere_light,
    )
