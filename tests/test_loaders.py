"""Mitsuba XML / serialized / PLY loader tests on synthetic assets
(reference parity: load_mitsuba.cpp, load_serialized.cpp, assimp PLY)."""

import numpy as np
import pytest

from stratum_tpu.scene import flatten
from stratum_tpu.scene.graph import NodeGraph
from stratum_tpu.scene.loaders.mitsuba import load_mitsuba, parse_spectrum
from stratum_tpu.scene.loaders.ply import load_ply_mesh
from stratum_tpu.scene.loaders.serialized import (
    load_serialized_mesh,
    write_serialized,
)


def test_parse_spectrum_forms():
    np.testing.assert_allclose(parse_spectrum("0.5"), [0.5, 0.5, 0.5])
    np.testing.assert_allclose(parse_spectrum("0.1 0.2 0.3"), [0.1, 0.2, 0.3])
    # flat spectrum integrates to a nearly-gray color with luminance ~v
    rgb = parse_spectrum("400:1.0, 700:1.0")
    assert rgb.shape == (3,)
    lum = rgb @ np.asarray([0.2126, 0.7152, 0.0722])
    assert lum == pytest.approx(1.0, rel=0.15)


def test_serialized_roundtrip(tmp_path, rng_np):
    pos = rng_np.random((10, 3)).astype(np.float32)
    nrm = rng_np.random((10, 3)).astype(np.float32)
    uv = rng_np.random((10, 2)).astype(np.float32)
    idx = rng_np.integers(0, 10, (6, 3)).astype(np.int32)
    p = tmp_path / "m.serialized"
    write_serialized(p, pos, idx, nrm, uv)
    pos2, nrm2, uv2, idx2 = load_serialized_mesh(p)
    np.testing.assert_allclose(pos2, pos)
    np.testing.assert_allclose(nrm2, nrm)
    np.testing.assert_allclose(uv2, uv)
    np.testing.assert_array_equal(idx2, idx)


def test_ply_ascii(tmp_path):
    p = tmp_path / "t.ply"
    p.write_text(
        "ply\nformat ascii 1.0\n"
        "element vertex 4\n"
        "property float x\nproperty float y\nproperty float z\n"
        "element face 1\n"
        "property list uchar int vertex_indices\n"
        "end_header\n"
        "0 0 0\n1 0 0\n1 1 0\n0 1 0\n"
        "4 0 1 2 3\n"
    )
    pos, nrm, uv, idx = load_ply_mesh(p)
    assert pos.shape == (4, 3)
    assert idx.shape == (2, 3)  # quad fan-triangulated


def test_ply_binary(tmp_path):
    pos = np.asarray([[0, 0, 0], [1, 0, 0], [0, 1, 0]], np.float32)
    header = (
        "ply\nformat binary_little_endian 1.0\n"
        "element vertex 3\n"
        "property float x\nproperty float y\nproperty float z\n"
        "element face 1\n"
        "property list uchar uint vertex_indices\n"
        "end_header\n"
    ).encode()
    body = pos.tobytes() + bytes([3]) + np.asarray([0, 1, 2], np.uint32).tobytes()
    p = tmp_path / "b.ply"
    p.write_bytes(header + body)
    pos2, _, _, idx = load_ply_mesh(p)
    np.testing.assert_allclose(pos2, pos)
    np.testing.assert_array_equal(idx, [[0, 1, 2]])


def test_mitsuba_scene(tmp_path):
    xml = """<scene version="0.6.0">
      <sensor type="perspective">
        <float name="fov" value="40"/>
        <transform name="toWorld">
          <lookat origin="0 1 -5" target="0 1 0" up="0 1 0"/>
        </transform>
      </sensor>
      <bsdf type="diffuse" id="white">
        <rgb name="reflectance" value="0.7 0.7 0.7"/>
      </bsdf>
      <bsdf type="roughconductor" id="metal">
        <float name="alpha" value="0.04"/>
      </bsdf>
      <shape type="rectangle">
        <ref id="white"/>
        <transform name="toWorld">
          <scale value="3"/>
          <rotate x="1" angle="-90"/>
        </transform>
      </shape>
      <shape type="sphere">
        <float name="radius" value="0.5"/>
        <ref id="metal"/>
      </shape>
      <shape type="rectangle">
        <transform name="toWorld">
          <translate y="3"/>
          <rotate x="1" angle="90"/>
        </transform>
        <emitter type="area">
          <rgb name="radiance" value="10 10 10"/>
        </emitter>
      </shape>
      <emitter type="constant">
        <rgb name="radiance" value="0.1 0.1 0.1"/>
      </emitter>
    </scene>"""
    p = tmp_path / "scene.xml"
    p.write_text(xml)
    g = NodeGraph()
    load_mitsuba(g.root, p)
    scene, stats = flatten.flatten(g.root)
    assert stats.num_lights == 2  # emissive rectangle
    assert stats.num_instances == 3
    # metallic sphere material present
    met = np.asarray(scene.materials.metallic)
    assert (met == 1.0).any()
    rough = np.asarray(scene.materials.roughness)
    assert np.any(np.isclose(rough, 0.2))  # sqrt(0.04)
    # camera found
    found = flatten.find_camera(g.root)
    assert found is not None
    c2w = found[0].to_world()
    np.testing.assert_allclose(c2w[:, 3], [0, 1, -5], atol=1e-5)
    # constant env present
    em = np.asarray(scene.env.emission)
    np.testing.assert_allclose(em.ravel()[0], 0.1, atol=1e-6)


def test_mitsuba_dielectric(tmp_path):
    xml = """<scene version="3.0.0">
      <shape type="cube">
        <bsdf type="dielectric">
          <float name="intIOR" value="1.33"/>
          <float name="extIOR" value="1.0"/>
        </bsdf>
      </shape>
    </scene>"""
    p = tmp_path / "d.xml"
    p.write_text(xml)
    g = NodeGraph()
    load_mitsuba(g.root, p)
    scene, _ = flatten.flatten(g.root)
    assert np.asarray(scene.materials.transmission)[0] == 1.0
    np.testing.assert_allclose(np.asarray(scene.materials.eta)[0], 1.33, rtol=1e-5)


def test_vol_grid_roundtrip(tmp_path, rng_np):
    """Mitsuba .vol write/read roundtrip + MediumComponent creation
    (reference: load_volumes.cpp)."""
    from stratum_tpu.scene.graph import MediumComponent
    from stratum_tpu.scene.loaders.volumes import (
        load_vol_grid,
        load_volume,
        write_vol_grid,
    )

    d = rng_np.random((6, 5, 4)).astype(np.float32)
    p = tmp_path / "g.vol"
    write_vol_grid(p, d, (0, 0, 0), (1, 2, 3))
    data, lo, hi = load_vol_grid(p)
    np.testing.assert_allclose(data[..., 0], d)
    np.testing.assert_allclose(hi, [1, 2, 3])
    g = NodeGraph()
    n = load_volume(g.root, p, g=0.3, density_scale=2.0)
    mc = n.find(MediumComponent)
    np.testing.assert_allclose(mc.density, d * 2.0)
    assert mc.g == 0.3


def test_stl_binary_and_ascii_roundtrip(tmp_path):
    """STL loader (assimp-path parity for the formats that matter,
    load_assimp.cpp): binary and ASCII parse to the same mesh."""
    import struct

    import numpy as np

    from stratum_tpu.scene.loaders.stl import load_stl_mesh

    tris = np.asarray(
        [
            [[0, 0, 0], [1, 0, 0], [0, 1, 0]],
            [[1, 0, 0], [1, 1, 0], [0, 1, 0]],
        ],
        np.float32,
    )
    normals = np.asarray([[0, 0, 1], [0, 0, 1]], np.float32)
    # binary
    buf = b"\x00" * 80 + struct.pack("<I", 2)
    for n, t in zip(normals, tris):
        buf += n.tobytes() + t.tobytes() + b"\x00\x00"
    b = tmp_path / "m.stl"
    b.write_bytes(buf)
    pb, nb, _, ib = load_stl_mesh(b)
    assert ib.shape == (2, 3) and pb.shape[0] == 4
    # ascii
    lines = ["solid m"]
    for n, t in zip(normals, tris):
        lines.append(f"facet normal {n[0]} {n[1]} {n[2]}")
        lines.append("outer loop")
        for v in t:
            lines.append(f"vertex {v[0]} {v[1]} {v[2]}")
        lines.append("endloop")
        lines.append("endfacet")
    lines.append("endsolid m")
    a = tmp_path / "a.stl"
    a.write_text("\n".join(lines))
    pa, na, _, ia = load_stl_mesh(a)
    np.testing.assert_allclose(np.sort(pa, axis=0), np.sort(pb, axis=0))
    assert ia.shape == ib.shape


def test_nvdb_grid_roundtrip(tmp_path, rng_np):
    """NanoVDB .nvdb write/read roundtrip: leaf-walk dense splat with the
    index->world transform (reference: load_volumes.cpp:17-52 via NanoVDB
    io::readGrid; layout per the public 32.3 spec)."""
    from stratum_tpu.scene.graph import MediumComponent
    from stratum_tpu.scene.loaders.volumes import (
        load_nvdb_grid,
        load_volume,
        write_nvdb_grid,
    )

    d = np.zeros((20, 17, 33), np.float32)
    d[3:12, 2:15, 5:30] = rng_np.random((9, 13, 25)).astype(np.float32) + 0.1
    p = tmp_path / "g.nvdb"
    lo0 = np.array([-1.0, -2.0, -3.0])
    hi0 = np.array([4.0, 5.0, 6.0])
    write_nvdb_grid(p, d, lo0, hi0)
    out, lo, hi = load_nvdb_grid(p)
    # dense reconstruction covers the active-leaf extent exactly
    zz, yy, xx = (min(a, b) for a, b in zip(out.shape, d.shape))
    np.testing.assert_array_equal(out[:zz, :yy, :xx], d[:zz, :yy, :xx])
    np.testing.assert_allclose(lo, lo0)
    # world box maps the leaf extent through voxel size
    vox = (hi0 - lo0) / np.array([33, 17, 20])
    expect_hi = lo0 + np.array(
        [out.shape[2], out.shape[1], out.shape[0]]
    ) * vox
    np.testing.assert_allclose(hi, expect_hi, rtol=1e-5)
    # sparse: all-zero leaves are not stored
    import os

    assert os.path.getsize(p) < 16 + 176 + 8 + 672 + 64 + 64 + 2144 * (
        2 * 2 * 4 + 1
    )
    g = NodeGraph()
    n = load_volume(g.root, p, density_scale=3.0)
    mc = n.find(MediumComponent)
    np.testing.assert_allclose(
        mc.density[:zz, :yy, :xx], d[:zz, :yy, :xx] * 3.0, rtol=1e-6
    )


def test_nvdb_empty_grid(tmp_path):
    from stratum_tpu.scene.loaders.volumes import (
        load_nvdb_grid,
        write_nvdb_grid,
    )

    p = tmp_path / "e.nvdb"
    write_nvdb_grid(p, np.zeros((8, 8, 8), np.float32), (0, 0, 0), (1, 1, 1))
    out, lo, hi = load_nvdb_grid(p)
    assert float(np.max(out)) == 0.0


def test_fbx_roundtrip(tmp_path):
    """Binary FBX write/load: geometry, per-vertex normals/uvs, material
    color, euler transform (reference: assimp FBX ingestion,
    load_assimp.cpp:14-41)."""
    from stratum_tpu.scene.graph import MeshPrimitive
    from stratum_tpu.scene.loaders.fbx import load_fbx, write_fbx

    pos = np.array(
        [[0, 0, 0], [1, 0, 0], [1, 1, 0], [0, 1, 0]], np.float32
    )
    idx = np.array([[0, 1, 2], [0, 2, 3]], np.int32)
    nrm = np.tile([[0.0, 0.0, 1.0]], (4, 1)).astype(np.float32)
    uv = np.array([[0, 0], [1, 0], [1, 1], [0, 1]], np.float32)
    p = tmp_path / "quad.fbx"
    write_fbx(p, [dict(
        name="quad", positions=pos, indices=idx, normals=nrm, uvs=uv,
        translation=(2.0, 3.0, 4.0), rotation_deg=(0.0, 90.0, 0.0),
        diffuse=(0.2, 0.4, 0.6), emissive=(1.0, 2.0, 3.0),
    )])
    g = NodeGraph()
    root = load_fbx(g.root, p)
    meshes = [
        (n, n.find(MeshPrimitive))
        for n in root.descendants() if n.find(MeshPrimitive)
    ]
    assert len(meshes) == 1
    node, mp = meshes[0]
    np.testing.assert_allclose(mp.positions, pos)
    np.testing.assert_array_equal(mp.indices, idx)
    np.testing.assert_allclose(mp.normals, nrm)
    np.testing.assert_allclose(mp.uvs, uv, atol=1e-6)
    np.testing.assert_allclose(mp.material.base_color, [0.2, 0.4, 0.6],
                               rtol=1e-5)
    np.testing.assert_allclose(mp.material.emission, [1.0, 2.0, 3.0],
                               rtol=1e-5)
    # Lcl Rotation (0,90,0) + translation (2,3,4)
    w = node.parent.to_world()
    np.testing.assert_allclose(w[:, 3], [2.0, 3.0, 4.0], atol=1e-6)
    np.testing.assert_allclose(w[:, 0], [0.0, 0.0, -1.0], atol=1e-6)


def test_fbx_polygon_fan_and_slots(tmp_path):
    """Quads fan-triangulate; ByPolygon material slots split primitives."""
    from stratum_tpu.scene.graph import MeshPrimitive
    from stratum_tpu.scene.loaders.fbx import (
        FbxNode, _triangulate, load_fbx, write_fbx,
    )

    # hand-build a Geometry record with one quad polygon
    verts = np.arange(12, dtype=np.float64)
    pvi = np.array([0, 1, 2, ~np.int64(3)], np.int64)
    geo = FbxNode("Geometry", [1, "g", "Mesh"], [
        FbxNode("Vertices", [verts], []),
        FbxNode("PolygonVertexIndex", [pvi], []),
    ])
    pos, idx, nrm, uv, slot = _triangulate(geo)
    assert idx.tolist() == [[0, 1, 2], [0, 2, 3]]
    assert (slot == 0).all()


def test_vdb_descope_error_path(tmp_path):
    """.vdb is formally descoped (README "Scope"): the loader must refuse
    with the nanovdb_convert recipe, not mis-parse (reference reads it via
    the OpenVDB library, load_volumes.cpp:112-135)."""
    import pytest

    from stratum_tpu.scene.graph import NodeGraph
    from stratum_tpu.scene.loaders.volumes import load_volume

    p = tmp_path / "cloud.vdb"
    p.write_bytes(b" BDV\x00\x00\x00\x00" + b"\x00" * 64)
    g = NodeGraph()
    with pytest.raises(ValueError, match="nanovdb_convert"):
        load_volume(g.root, p)


def test_blend_descope_error_path(tmp_path):
    """.blend is formally descoped: the CLI scene dispatch must refuse
    with the export recipe (reference: assimp importer,
    load_assimp.cpp:14-41)."""
    import pytest

    from stratum_tpu.cli import build_scene
    from stratum_tpu.utils.flags import Options

    p = tmp_path / "scene.blend"
    p.write_bytes(b"BLENDER-v404" + b"\x00" * 32)
    with pytest.raises(ValueError, match="glTF"):
        build_scene(Options([f"--scene={p}"]))
