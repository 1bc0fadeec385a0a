"""glTF loader tests on synthetic in-memory assets (reference:
Node/loaders/load_gltf.cpp parity)."""

import base64
import json
import struct

import numpy as np

from stratum_tpu.scene import flatten
from stratum_tpu.scene.graph import NodeGraph
from stratum_tpu.scene.loaders.gltf import load_gltf


def _minimal_gltf(tmp_path, glb=False):
    pos = np.asarray(
        [[0, 0, 0], [1, 0, 0], [0, 1, 0], [1, 1, 0]], np.float32
    )
    idx = np.asarray([0, 1, 2, 2, 1, 3], np.uint16)
    raw = pos.tobytes() + idx.tobytes()
    doc = {
        "asset": {"version": "2.0"},
        "scene": 0,
        "scenes": [{"nodes": [0]}],
        "nodes": [
            {
                "mesh": 0,
                "translation": [2.0, 0.0, 0.0],
                "name": "quad",
            }
        ],
        "meshes": [
            {
                "primitives": [
                    {
                        "attributes": {"POSITION": 0},
                        "indices": 1,
                        "material": 0,
                    }
                ]
            }
        ],
        "materials": [
            {
                "name": "redish",
                "pbrMetallicRoughness": {
                    "baseColorFactor": [0.8, 0.1, 0.1, 1.0],
                    "metallicFactor": 0.0,
                    "roughnessFactor": 0.4,
                },
                "emissiveFactor": [1.0, 1.0, 1.0],
                "extensions": {
                    "KHR_materials_emissive_strength": {"emissiveStrength": 5.0},
                    "KHR_materials_ior": {"ior": 1.33},
                },
            }
        ],
        "buffers": [{"byteLength": len(raw)}],
        "bufferViews": [
            {"buffer": 0, "byteOffset": 0, "byteLength": 48},
            {"buffer": 0, "byteOffset": 48, "byteLength": 12},
        ],
        "accessors": [
            {
                "bufferView": 0,
                "componentType": 5126,
                "count": 4,
                "type": "VEC3",
            },
            {
                "bufferView": 1,
                "componentType": 5123,
                "count": 6,
                "type": "SCALAR",
            },
        ],
    }
    if glb:
        payload = json.dumps(doc).encode()
        payload += b" " * (-len(payload) % 4)
        binc = raw + b"\0" * (-len(raw) % 4)
        body = (
            struct.pack("<II", len(payload), 0x4E4F534A)
            + payload
            + struct.pack("<II", len(binc), 0x004E4942)
            + binc
        )
        blob = struct.pack("<4sII", b"glTF", 2, 12 + len(body)) + body
        p = tmp_path / "t.glb"
        p.write_bytes(blob)
    else:
        doc["buffers"][0]["uri"] = (
            "data:application/octet-stream;base64,"
            + base64.b64encode(raw).decode()
        )
        p = tmp_path / "t.gltf"
        p.write_text(json.dumps(doc))
    return p


def _check(g):
    scene, stats = flatten.flatten(g.root)
    assert stats.num_triangles == 2
    pos = np.asarray(scene.geo.positions)[:4]
    assert pos[:, 0].min() >= 2.0  # translation applied
    bc = np.asarray(scene.materials.base_color)[0]
    np.testing.assert_allclose(bc, [0.8, 0.1, 0.1], rtol=1e-6)
    np.testing.assert_allclose(
        np.asarray(scene.materials.emission)[0], 5.0, rtol=1e-6
    )
    np.testing.assert_allclose(np.asarray(scene.materials.eta)[0], 1.33)
    assert stats.num_lights == 2  # emissive quad is a light


def test_load_gltf_json(tmp_path):
    g = NodeGraph()
    load_gltf(g.root, _minimal_gltf(tmp_path, glb=False))
    _check(g)


def test_load_glb(tmp_path):
    g = NodeGraph()
    load_gltf(g.root, _minimal_gltf(tmp_path, glb=True))
    _check(g)
