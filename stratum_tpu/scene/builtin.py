"""Built-in test scenes (Cornell box, furnace) used by tests and benchmarks.

The reference ships no scene files; its test workflow is loading external
assets. For a hermetic test pyramid (SURVEY.md §4) we need analytic scenes
with known solutions: the Cornell box (golden images + estimator consistency)
and the furnace (white-furnace energy conservation for BSDFs).
"""

from __future__ import annotations

import numpy as np

from stratum_tpu.scene.graph import (
    CameraComponent,
    EnvironmentComponent,
    MeshPrimitive,
    NodeGraph,
    SpherePrimitive,
    TransformComponent,
)
from stratum_tpu.scene.material import Material


def _quad(p0, p1, p2, p3):
    """Two triangles for quad p0..p3 (counter-clockwise)."""
    pos = np.asarray([p0, p1, p2, p3], np.float32)
    idx = np.asarray([[0, 1, 2], [0, 2, 3]], np.int32)
    return pos, idx


def _box(pmin, pmax):
    """Axis-aligned box as 12 triangles with outward normals."""
    x0, y0, z0 = pmin
    x1, y1, z1 = pmax
    quads = [
        _quad((x0, y0, z0), (x1, y0, z0), (x1, y1, z0), (x0, y1, z0)),  # -z
        _quad((x1, y0, z1), (x0, y0, z1), (x0, y1, z1), (x1, y1, z1)),  # +z
        _quad((x0, y0, z1), (x0, y0, z0), (x0, y1, z0), (x0, y1, z1)),  # -x
        _quad((x1, y0, z0), (x1, y0, z1), (x1, y1, z1), (x1, y1, z0)),  # +x
        _quad((x0, y0, z1), (x1, y0, z1), (x1, y0, z0), (x0, y0, z0)),  # -y
        _quad((x0, y1, z0), (x1, y1, z0), (x1, y1, z1), (x0, y1, z1)),  # +y
    ]
    pos = np.concatenate([q[0] for q in quads])
    idx = np.concatenate([q[1] + 4 * i for i, q in enumerate(quads)])
    return pos, idx


def _rot_y(deg: float) -> np.ndarray:
    a = np.radians(deg)
    c, s = np.cos(a), np.sin(a)
    return np.asarray([[c, 0, s], [0, 1, 0], [-s, 0, c]], np.float32)


def cornell_box(light_scale: float = 1.0, boxes: bool = True) -> NodeGraph:
    """The classic Cornell box in the canonical 0..555 coordinates, camera on
    -z looking down +z."""
    g = NodeGraph()
    white = Material(base_color=np.asarray([0.73, 0.73, 0.73], np.float32))
    red = Material(base_color=np.asarray([0.65, 0.05, 0.05], np.float32))
    green = Material(base_color=np.asarray([0.12, 0.45, 0.15], np.float32))
    light = Material(
        base_color=np.zeros(3, np.float32),
        emission=np.asarray([15.0, 15.0, 15.0], np.float32) * light_scale,
    )

    def add(name, quads, mat):
        pos = np.concatenate([q[0] for q in quads])
        idx = np.concatenate([q[1] + 4 * i for i, q in enumerate(quads)])
        n = g.root.add_child(name)
        n.make_component(MeshPrimitive(positions=pos, indices=idx, material=mat))
        return n

    s = 555.0
    add("floor", [_quad((0, 0, 0), (s, 0, 0), (s, 0, s), (0, 0, s))], white)
    add("ceiling", [_quad((0, s, 0), (0, s, s), (s, s, s), (s, s, 0))], white)
    add("back", [_quad((0, 0, s), (s, 0, s), (s, s, s), (0, s, s))], white)
    add("right", [_quad((s, 0, 0), (s, s, 0), (s, s, s), (s, 0, s))], green)
    add("left", [_quad((0, 0, 0), (0, 0, s), (0, s, s), (0, s, 0))], red)
    # downward-facing emissive quad (normal -y)
    y = s - 1e-2
    add(
        "light",
        [_quad((213, y, 227), (343, y, 227), (343, y, 332), (213, y, 332))],
        light,
    )
    if boxes:
        pos, idx = _box((0, 0, 0), (165, 330, 165))
        tall = g.root.add_child("tall_box")
        m = np.eye(3, 4, dtype=np.float32)
        m[:, :3] = _rot_y(15.0)
        m[:, 3] = (265, 0, 296)
        tall.make_component(TransformComponent(matrix=m))
        tall.make_component(MeshPrimitive(positions=pos, indices=idx, material=white))
        pos, idx = _box((0, 0, 0), (165, 165, 165))
        short = g.root.add_child("short_box")
        m = np.eye(3, 4, dtype=np.float32)
        m[:, :3] = _rot_y(-18.0)
        m[:, 3] = (130, 0, 65)
        short.make_component(TransformComponent(matrix=m))
        short.make_component(MeshPrimitive(positions=pos, indices=idx, material=white))

    cam = g.root.add_child("camera")
    m = np.eye(3, 4, dtype=np.float32)
    m[:, 3] = (278.0, 273.0, -800.0)
    cam.make_component(TransformComponent(matrix=m))
    cam.make_component(CameraComponent(fovy=np.radians(38.0)))
    return g


def material_spheres(stacks: int = 24, slices: int = 48) -> NodeGraph:
    """Three spheres (diffuse, metal, glass) on a floor under an area light +
    gray environment — the Disney BSDF showcase/regression scene."""
    g = NodeGraph()
    floor = g.root.add_child("floor")
    s = 20.0
    pos, idx = _quad((-s, 0, -s), (-s, 0, s), (s, 0, s), (s, 0, -s))
    floor.make_component(
        MeshPrimitive(
            positions=pos,
            indices=idx,
            material=Material(base_color=np.full(3, 0.5, np.float32)),
        )
    )
    mats = [
        Material(base_color=np.asarray([0.7, 0.3, 0.3], np.float32)),
        Material(
            base_color=np.asarray([0.9, 0.7, 0.3], np.float32),
            metallic=1.0,
            roughness=0.25,
        ),
        Material(
            base_color=np.ones(3, np.float32),
            transmission=1.0,
            roughness=0.05,
            eta=1.5,
        ),
    ]
    for i, m in enumerate(mats):
        n = g.root.add_child(f"sphere_{i}")
        t = np.eye(3, 4, dtype=np.float32)
        t[:, 3] = ((i - 1) * 2.4, 1.0, 0.0)
        n.make_component(TransformComponent(matrix=t))
        n.make_component(
            SpherePrimitive(radius=1.0, material=m, stacks=stacks, slices=slices)
        )
    light = g.root.add_child("light")
    y = 6.0
    lpos, lidx = _quad((-2, y, -2), (2, y, -2), (2, y, 2), (-2, y, 2))
    light.make_component(
        MeshPrimitive(
            positions=lpos,
            indices=lidx,
            material=Material(
                base_color=np.zeros(3, np.float32),
                emission=np.full(3, 10.0, np.float32),
            ),
        )
    )
    env = g.root.add_child("env")
    env.make_component(EnvironmentComponent(color=np.full(3, 0.2, np.float32)))
    cam = g.root.add_child("camera")
    m = np.eye(3, 4, dtype=np.float32)
    # look slightly down at the spheres from the front
    from stratum_tpu.core import transform as xform

    c2w = np.asarray(xform.look_at((0.0, 2.2, -7.0), (0.0, 1.0, 0.0)))
    cam.make_component(TransformComponent(matrix=c2w))
    cam.make_component(CameraComponent(fovy=np.radians(45.0)))
    return g


def atrium(columns: int = 6, stacks: int = 24, slices: int = 48) -> NodeGraph:
    """Sponza-class procedural benchmark scene (~260K triangles with the
    defaults): a colonnaded atrium — floor, walls, two rows of columns
    (dense spheres stacked into pillars), a vaulted arcade of boxes, an
    emissive sky strip and an environment. No external assets needed, but
    the triangle count, occlusion complexity and mixed materials match the
    role Sponza plays in the reference benchmarks (BASELINE.json configs)."""
    g = NodeGraph()
    rngm = np.random.default_rng(7)
    stone = Material(base_color=np.asarray([0.55, 0.5, 0.45], np.float32))
    red_cloth = Material(base_color=np.asarray([0.5, 0.1, 0.08], np.float32))
    brass = Material(
        base_color=np.asarray([0.8, 0.6, 0.3], np.float32),
        metallic=1.0,
        roughness=0.35,
    )

    def add_mesh(name, pos, idx, mat, matrix=None):
        n = g.root.add_child(name)
        if matrix is not None:
            n.make_component(TransformComponent(matrix=matrix))
        n.make_component(MeshPrimitive(positions=pos, indices=idx, material=mat))

    # hall: floor + side walls + far wall
    hw, hh, hl = 12.0, 10.0, 40.0
    add_mesh("floor", *_quad((-hw, 0, -hl), (-hw, 0, hl), (hw, 0, hl), (hw, 0, -hl)), stone)
    add_mesh("wall_l", *_quad((-hw, 0, -hl), (-hw, hh, -hl), (-hw, hh, hl), (-hw, 0, hl)), stone)
    add_mesh("wall_r", *_quad((hw, 0, -hl), (hw, 0, hl), (hw, hh, hl), (hw, hh, -hl)), stone)
    add_mesh("wall_far", *_quad((-hw, 0, hl), (-hw, hh, hl), (hw, hh, hl), (hw, 0, hl)), stone)

    # two colonnades of stacked-sphere pillars (the triangle mass)
    from stratum_tpu.scene.flatten import tessellate_sphere

    sph_pos, sph_nrm, sph_uv, sph_idx = tessellate_sphere(1.0, stacks, slices)
    k = 0
    for side in (-1.0, 1.0):
        for i in range(columns):
            z = -hl + (i + 0.5) * (2 * hl / columns)
            for level in range(5):
                m = np.eye(3, 4, dtype=np.float32)
                r = 0.8 if level % 2 == 0 else 0.65
                m[:, :3] *= r
                m[:, 3] = (side * (hw - 2.0), 0.9 + level * 1.7, z)
                mat = [stone, red_cloth, brass][k % 3]
                k += 1
                add_mesh(
                    f"col_{side}_{i}_{level}",
                    sph_pos, sph_idx, mat, matrix=m,
                )

    # arcade of boxes along the ceiling edges
    for i in range(columns * 2):
        z = -hl + (i + 0.5) * (hl / columns)
        for side in (-1.0, 1.0):
            pos, idx = _box((-1.2, 0, -1.2), (1.2, 0.8, 1.2))
            m = np.eye(3, 4, dtype=np.float32)
            m[:, 3] = (side * (hw - 2.0), hh - 1.2, z)
            add_mesh(f"arch_{side}_{i}", pos, idx, stone, matrix=m)

    # sky strip light down the middle of the ceiling
    y = hh - 1e-2
    add_mesh(
        "sky_light",
        *_quad((-3, y, -hl), (3, y, -hl), (3, y, hl), (-3, y, hl)),
        Material(
            base_color=np.zeros(3, np.float32),
            emission=np.asarray([6.0, 6.5, 7.0], np.float32),
        ),
    )
    env = g.root.add_child("env")
    env.make_component(EnvironmentComponent(color=np.full(3, 0.05, np.float32)))

    cam = g.root.add_child("camera")
    from stratum_tpu.core import transform as xform

    c2w = np.asarray(xform.look_at((0.0, 4.0, -hl + 2.0), (0.0, 4.0, hl)))
    cam.make_component(TransformComponent(matrix=c2w))
    cam.make_component(CameraComponent(fovy=np.radians(55.0)))
    return g


def smoky_cornell(res: int = 32, sigma: float = 0.02) -> NodeGraph:
    """Cornell box (no boxes) with a heterogeneous smoke plume: density is
    a deterministic swirling column (radial falloff around a sinusoidally
    displaced axis, thinning with height) — a hermetic stand-in for a
    loaded .vol/.nvdb cloud that exercises Woodcock delta tracking,
    ratio-tracked shadows and HG scattering end-to-end (reference:
    medium.hlsli:74-168 delta tracking against NanoVDB grids)."""
    g = cornell_box(boxes=False)
    z = np.linspace(0.0, 1.0, res, dtype=np.float32)
    zz, yy, xx = np.meshgrid(z, z, z, indexing="ij")  # [D, H, W] = (z, y, x)
    # plume axis wiggles with height; radius grows and density thins upward
    ax = 0.5 + 0.18 * np.sin(6.0 * yy)
    az = 0.5 + 0.18 * np.cos(5.0 * yy + 1.3)
    r2 = (xx - ax) ** 2 + (zz - az) ** 2
    radius = 0.10 + 0.22 * yy
    core = np.exp(-r2 / np.maximum(radius**2, 1e-6))
    ripple = 0.75 + 0.25 * np.sin(12.0 * xx + 9.0 * zz + 7.0 * yy)
    density = (sigma * core * ripple * (1.0 - 0.6 * yy)).astype(np.float32)
    from stratum_tpu.scene.graph import MediumComponent

    smoke = g.root.add_child("smoke")
    smoke.make_component(
        MediumComponent(
            density=density,
            box_lo=np.asarray([80.0, 0.0, 80.0], np.float32),
            box_hi=np.asarray([475.0, 460.0, 475.0], np.float32),
            albedo=np.asarray([0.85, 0.85, 0.9], np.float32),
            g=0.3,
        )
    )
    return g


def furnace(
    albedo: float = 0.8, radiance: float = 0.5, stacks: int = 16, slices: int = 32
) -> NodeGraph:
    """White furnace: a sphere in a constant environment. Any energy-
    conserving BSDF must render exactly the environment radiance everywhere:
    L = radiance * albedo / (1 - albedo) * ... for path tracing the full
    series converges to `radiance` when albedo-weighted bounces sum the
    geometric series; used as an energy-conservation oracle."""
    g = NodeGraph()
    sph = g.root.add_child("sphere")
    sph.make_component(
        SpherePrimitive(
            radius=1.0,
            material=Material(base_color=np.full(3, albedo, np.float32)),
            stacks=stacks,
            slices=slices,
        )
    )
    env = g.root.add_child("env")
    env.make_component(
        EnvironmentComponent(color=np.full(3, radiance, np.float32))
    )
    cam = g.root.add_child("camera")
    m = np.eye(3, 4, dtype=np.float32)
    m[:, 3] = (0.0, 0.0, -4.0)
    cam.make_component(TransformComponent(matrix=m))
    cam.make_component(CameraComponent(fovy=np.radians(45.0)))
    return g
