"""Shading-point reconstruction from hit records.

TPU-native analog of the reference's ShadingData construction
(src/Shaders/common/shading_data.hlsli:2-63 ``make_triangle_shading_data``):
barycentric interpolation of the packed vertex data, geometric normal from the
cross product, front-face handling, and material parameter fetch (the
ImageValue ``load()`` of image_value.h, constants-only until the texture stack
lands).
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from stratum_tpu.core import math as smath
from stratum_tpu.scene.schema import DisneyMaterials, GeometrySoA


class ShadingPoint(NamedTuple):
    position: jnp.ndarray  # f32 [N,3]
    geom_normal: jnp.ndarray  # f32 [N,3] oriented toward the incoming ray
    shading_normal: jnp.ndarray  # f32 [N,3] same orientation
    uv: jnp.ndarray  # f32 [N,2]
    material: jnp.ndarray  # i32 [N] material row (-1 if miss)
    light: jnp.ndarray  # i32 [N] light row (-1 if none)
    instance: jnp.ndarray  # i32 [N]
    front_face: jnp.ndarray  # bool [N] true if ray hit the front side
    area: jnp.ndarray  # f32 [N] triangle area (for pdf conversions)
    tangent: jnp.ndarray  # f32 [N,3] uv-aligned tangent (normal mapping)
    uv_area: jnp.ndarray  # f32 [N] uv area per world area (ray-cone LOD)


def make_shading_point(
    geo: GeometrySoA, tri, bary, direction
) -> ShadingPoint:
    """Reconstruct surface data for hit triangles. ``tri`` may be -1 (miss);
    outputs are garbage there and must be masked by the caller.

    Reads ONE packed [32]-float row per hit instead of 13 separate vertex /
    attribute gathers: XLA gathers on TPU cost ~5 ms per op nearly
    independent of row width, so op count is everything."""
    safe_tri = jnp.maximum(tri, 0)
    row = geo.packed_tri[safe_tri]  # [N, 32] — the only gather
    return shading_point_from_row(row, tri, bary, direction)


def shading_point_from_row(row, tri, bary, direction) -> ShadingPoint:
    """ShadingPoint from an already-gathered packed [N, 32] shading row —
    the zero-gather path for tracers that return the fused slot payload
    (SceneData.slot_payload cols 0-31). ``tri`` only masks misses (-1)."""
    p0 = row[..., 0:3]
    e1 = row[..., 3:6]
    e2 = row[..., 6:9]
    u = bary[..., 0:1]
    v = bary[..., 1:2]
    w = 1.0 - u - v
    position = p0 + u * e1 + v * e2
    ng_raw = jnp.cross(e1, e2)
    area = 0.5 * smath.length(ng_raw)
    ng = smath.normalize(ng_raw)
    n0 = row[..., 9:12]
    n1 = row[..., 12:15]
    n2 = row[..., 15:18]
    ns = smath.normalize(w * n0 + u * n1 + v * n2)
    # orient the shading normal with the geometric normal
    ns = jnp.where(smath.dot(ns, ng)[..., None] < 0.0, -ns, ns)
    t0 = row[..., 18:20]
    t1 = row[..., 20:22]
    t2 = row[..., 22:24]
    uv = w * t0 + u * t1 + v * t2
    mat_row = row[..., 24].astype(jnp.int32)
    light_row = row[..., 25].astype(jnp.int32)
    inst_row = row[..., 26].astype(jnp.int32)
    # uv-space tangent (dP/du) for normal mapping
    # (reference: dPdu/dPdv construction, shading_data.hlsli:2-63)
    duv1 = t1 - t0
    duv2 = t2 - t0
    det = duv1[..., 0] * duv2[..., 1] - duv1[..., 1] * duv2[..., 0]
    inv_det = smath.safe_div(1.0, det)
    tangent = (
        e1 * (duv2[..., 1] * inv_det)[..., None]
        - e2 * (duv1[..., 1] * inv_det)[..., None]
    )
    # degenerate uvs: fall back to any frame
    t_fallback, _ = smath.make_orthonormal(ns)
    tangent = jnp.where(
        (jnp.abs(det) > 1e-12)[..., None],
        smath.normalize(tangent),
        t_fallback,
    )
    # uv area per world area: sqrt drives the ray-cone mip LOD
    # (uv_screen_size, shading_data.h:10-37)
    uv_area = smath.safe_div(jnp.abs(det) * 0.5, jnp.maximum(area, 1e-20))

    # -- analytic sphere rows (appended after the padded triangles; row
    # slot 27 is the sphere flag — reference sphere shading data,
    # shading_data.hlsli:93-105). bary carries (phi/2pi, theta/pi).
    is_sphere = row[..., 27] > 0.5
    center = p0
    radius = row[..., 3]
    sph_n = smath.spherical_uv_to_cartesian(bary)
    sph_pos = center + sph_n * radius[..., None]
    sph_tangent, _ = smath.make_orthonormal(sph_n)
    position = jnp.where(is_sphere[..., None], sph_pos, position)
    ng = jnp.where(is_sphere[..., None], sph_n, ng)
    ns = jnp.where(is_sphere[..., None], sph_n, ns)
    uv = jnp.where(is_sphere[..., None], bary, uv)
    area = jnp.where(
        is_sphere, 4.0 * jnp.pi * radius * radius, area
    )
    tangent = jnp.where(is_sphere[..., None], sph_tangent, tangent)
    uv_area = jnp.where(
        is_sphere,
        smath.safe_div(1.0, jnp.maximum(4.0 * jnp.pi * radius * radius, 1e-20)),
        uv_area,
    )

    front = smath.dot(direction, ng) < 0.0
    sign = jnp.where(front, 1.0, -1.0)[..., None]
    return ShadingPoint(
        position=position,
        geom_normal=ng * sign,
        shading_normal=ns * sign,
        uv=uv,
        material=jnp.where(tri >= 0, mat_row, -1),
        light=jnp.where(tri >= 0, light_row, -1),
        instance=jnp.where(tri >= 0, inst_row, -1),
        front_face=front,
        area=area,
        tangent=tangent,
        uv_area=uv_area,
    )


def apply_normal_map(sp: ShadingPoint, materials, textures, lod=None,
                     tex_id=None):
    """Perturb the shading normal by the material's tangent-space normal map
    with tangent re-orthonormalization (reference: DisneyMaterial::load
    bump path, disney_material.hlsli:46-79). Returns the new shading normal
    (unchanged where no normal texture). ``tex_id``: already-gathered
    normal-texture ids (fused slot payload col 63) — skips the gather."""
    from stratum_tpu.render import texture as stex

    if not textures.uses(stex.SLOT_NORMAL):
        return sp.shading_normal  # no normal map anywhere in the scene
    if tex_id is None:
        r = jnp.maximum(sp.material, 0)
        tex_id = materials.normal_tex[r]
    nm = stex.sample_bilinear(textures, tex_id, sp.uv, lod)
    n_ts = smath.normalize(nm[..., :3] * 2.0 - 1.0)
    n = sp.shading_normal
    # Gram-Schmidt the tangent against the (possibly interpolated) normal
    t = smath.normalize(
        sp.tangent - n * smath.dotk(sp.tangent, n)
    )
    b = jnp.cross(n, t)
    n_new = smath.normalize(
        t * n_ts[..., 0:1] + b * n_ts[..., 1:2] + n * n_ts[..., 2:3]
    )
    has_map = tex_id >= 0
    return jnp.where(has_map[..., None], n_new, n)


class MaterialSample(NamedTuple):
    """Per-hit Disney parameters gathered from material rows (reference:
    DisneyMaterial::load, materials/disney_material.hlsli:46-79)."""

    base_color: jnp.ndarray  # [N,3]
    emission: jnp.ndarray  # [N,3]
    metallic: jnp.ndarray  # [N]
    roughness: jnp.ndarray  # [N]
    anisotropic: jnp.ndarray  # [N]
    subsurface: jnp.ndarray  # [N]
    clearcoat: jnp.ndarray  # [N]
    clearcoat_gloss: jnp.ndarray  # [N]
    transmission: jnp.ndarray  # [N]
    eta: jnp.ndarray  # [N]


def apply_textures(
    mat: MaterialSample,
    materials: DisneyMaterials,
    textures,
    material_row,
    uv,
    lod=None,
    u_lod=None,
    mat_row=None,
) -> MaterialSample:
    """Modulate constant material parameters by their textures
    (the ImageValue ``factor x texture`` composition, image_value.h:33-97;
    roughness/metallic ride the glTF ORM layout: G=roughness B=metallic,
    as converted by the reference's material_convert kernels).
    ``mat_row``: already-gathered packed material rows (the fused slot
    payload) — skips this function's own gather."""
    from stratum_tpu.render import texture as stex

    if mat_row is None:
        r = jnp.maximum(material_row, 0)
        mat_row = materials.packed[r]
    row = mat_row
    # each slot is sampled only if SOME material in the scene binds it
    # (static slot_mask): a tap for an unbound slot costs the same 8
    # gathers x num_lanes as a real one and returns 1.0 everywhere
    if textures.uses(stex.SLOT_BASE_COLOR):
        bc = stex.sample_bilinear(
            textures, row[..., 14].astype(jnp.int32), uv, lod, u_lod
        )
        mat = mat._replace(base_color=mat.base_color * bc[..., :3])
    if textures.uses(stex.SLOT_EMISSION):
        em = stex.sample_bilinear(
            textures, row[..., 15].astype(jnp.int32), uv, lod, u_lod
        )
        mat = mat._replace(emission=mat.emission * em[..., :3])
    if textures.uses(stex.SLOT_ROUGH_METAL):
        rm = stex.sample_bilinear(
            textures, row[..., 16].astype(jnp.int32), uv, lod, u_lod
        )
        mat = mat._replace(
            roughness=jnp.clip(mat.roughness * rm[..., 1], 1e-3, 1.0),
            metallic=jnp.clip(mat.metallic * rm[..., 2], 0.0, 1.0),
        )
    return mat


def load_material(materials: DisneyMaterials, material_row) -> MaterialSample:
    """Gather material constants per hit from the packed row (ONE gather op
    instead of ten; see GeometrySoA.packed_tri for the rationale). Row -1
    yields row 0 + caller masking."""
    r = jnp.maximum(material_row, 0)
    row = materials.packed[r]
    return material_from_row(row)


def material_from_row(row) -> MaterialSample:
    """MaterialSample from an already-gathered packed [N, 24] material row
    (the fused slot payload's cols 64-87)."""
    return MaterialSample(
        base_color=row[..., 0:3],
        emission=row[..., 3:6],
        metallic=row[..., 6],
        roughness=row[..., 7],
        anisotropic=row[..., 8],
        subsurface=row[..., 9],
        clearcoat=row[..., 10],
        clearcoat_gloss=row[..., 11],
        transmission=row[..., 12],
        eta=row[..., 13],
    )


def shadow_terminator_factor(ng, ns, wi):
    """Shading-normal shadow-terminator softening (Chiang, Li, Burley,
    "Taming the Shadow Terminator", SIGGRAPH 2019 talk) — the published
    technique behind the reference's shading-normal correction
    (src/Shaders/common/path.hlsli:67-98). Shading normals make the
    BSDF-weighted cosine overshoot near the geometric horizon; the cubic
    G = g + g^2 - g^3 of g = |ng.wi| / (|ns.wi| |ng.ns|) rolls illumination
    off smoothly instead of clipping to a hard black terminator.

    Returns a [N] multiplier in [0, 1]; exactly 1 when ns == ng.
    """
    num = jnp.abs(smath.dot(ng, wi))
    den = jnp.abs(smath.dot(ns, wi)) * jnp.abs(smath.dot(ng, ns))
    g = jnp.clip(smath.safe_div(num, den), 0.0, 1.0)
    return g * (1.0 + g - g * g)


def adjoint_ns_factor(ng, ns, wo, wi):
    """Shading-normal non-symmetry correction for importance transport
    (Veach 1997 eq. 5.17; the adjoint factor of path.hlsli:67-98): light
    (adjoint) paths weighting by |ns.wi| must be corrected by
    |ns.wo||ng.wi| / (|ng.wo||ns.wi|) so light and camera transport agree.
    Clamped to [0, 4] against horizon blowups (standard practice).
    """
    num = jnp.abs(smath.dot(ns, wo)) * jnp.abs(smath.dot(ng, wi))
    den = jnp.abs(smath.dot(ng, wo)) * jnp.abs(smath.dot(ns, wi))
    return jnp.clip(smath.safe_div(num, den), 0.0, 4.0)
