"""Scene graph, flattening, and OBJ loader tests
(reference behaviors: NodeGraph.hpp queries, Scene.cpp flattening,
load_obj.cpp parsing)."""

import numpy as np
import pytest

from stratum_tpu.scene import builtin, flatten, schema
from stratum_tpu.scene.graph import (
    EventPriority,
    MeshPrimitive,
    NodeGraph,
    TransformComponent,
)
from stratum_tpu.scene.loaders.obj import load_obj
from stratum_tpu.scene.material import Material


def test_node_hierarchy_and_components():
    g = NodeGraph()
    a = g.root.add_child("a")
    b = a.add_child("b")
    tc = a.make_component(TransformComponent())
    assert b.find_in_ancestor(TransformComponent) is tc
    assert b.find(TransformComponent) is None
    names = [n.name for n in g.root.descendants()]
    assert names == ["root", "a", "b"]
    with pytest.raises(ValueError):
        a.make_component(TransformComponent())


def test_node_erase_reparents():
    g = NodeGraph()
    a = g.root.add_child("a")
    b = a.add_child("b")
    a.erase(recurse=False)
    assert b.parent is g.root
    assert not a.alive
    assert b.alive


def test_event_priority_order():
    g = NodeGraph()
    n = g.root.add_child("n")
    seen = []
    g.on_update.add(n, lambda: seen.append("last"), EventPriority.LAST)
    g.on_update.add(n, lambda: seen.append("first"), EventPriority.FIRST)
    g.on_update()
    assert seen == ["first", "last"]
    n.erase()
    seen.clear()
    g.on_update()
    assert seen == []  # dead-node listeners dropped


def test_transform_accumulation():
    g = NodeGraph()
    a = g.root.add_child("a")
    m = np.eye(3, 4, dtype=np.float32)
    m[:, 3] = (1, 2, 3)
    a.make_component(TransformComponent(matrix=m))
    b = a.add_child("b")
    m2 = np.eye(3, 4, dtype=np.float32)
    m2[:, 3] = (10, 0, 0)
    b.make_component(TransformComponent(matrix=m2))
    w = b.to_world()
    np.testing.assert_allclose(w[:, 3], (11, 2, 3))


def test_flatten_cornell():
    g = builtin.cornell_box()
    scene, stats = flatten.flatten(g.root)
    assert stats.num_lights == 2  # light quad = 2 triangles
    assert stats.num_materials == 4
    assert stats.num_triangles == 6 * 2 + 2 * 12
    # padding is a multiple of the lane width
    assert scene.geo.indices.shape[0] % schema.TRI_PAD == 0
    # light rows map back to emissive triangles
    tri_light = np.asarray(scene.geo.tri_light)
    lit = np.nonzero(tri_light >= 0)[0]
    assert len(lit) == 2
    em = np.asarray(scene.materials.emission)
    mat = np.asarray(scene.geo.tri_material)
    assert (em[mat[lit]] > 0).all()
    # light power = mean emission * area * pi
    area = np.asarray(scene.lights.area)[:2]
    np.testing.assert_allclose(area.sum(), 130 * 105, rtol=1e-5)


def test_flatten_applies_transforms():
    g = NodeGraph()
    n = g.root.add_child("tri")
    m = np.eye(3, 4, dtype=np.float32)
    m[:, 3] = (5, 0, 0)
    n.make_component(TransformComponent(matrix=m))
    n.make_component(
        MeshPrimitive(
            positions=np.asarray([[0, 0, 0], [1, 0, 0], [0, 1, 0]], np.float32),
            indices=np.asarray([[0, 1, 2]], np.int32),
            material=Material(),
        )
    )
    scene, stats = flatten.flatten(g.root)
    pos = np.asarray(scene.geo.positions)[:3]
    np.testing.assert_allclose(pos[:, 0].min(), 5.0)


def test_obj_loader(tmp_path):
    obj = tmp_path / "tri.obj"
    obj.write_text(
        "mtllib tri.mtl\n"
        "v 0 0 0\nv 1 0 0\nv 1 1 0\nv 0 1 0\n"
        "vt 0 0\nvt 1 0\nvt 1 1\nvt 0 1\n"
        "usemtl redmat\n"
        "f 1/1 2/2 3/3 4/4\n"  # quad -> 2 tris
    )
    (tmp_path / "tri.mtl").write_text(
        "newmtl redmat\nKd 1 0 0\nNs 10\n"
    )
    g = NodeGraph()
    load_obj(g.root, obj)
    scene, stats = flatten.flatten(g.root)
    assert stats.num_triangles == 2
    np.testing.assert_allclose(
        np.asarray(scene.materials.base_color)[0], [1, 0, 0]
    )
    # Ns=10 -> roughness sqrt(2/12)
    np.testing.assert_allclose(
        np.asarray(scene.materials.roughness)[0], np.sqrt(2 / 12), rtol=1e-5
    )


def test_obj_negative_indices(tmp_path):
    obj = tmp_path / "neg.obj"
    obj.write_text(
        "v 0 0 0\nv 1 0 0\nv 0 1 0\n" "f -3 -2 -1\n"
    )
    g = NodeGraph()
    load_obj(g.root, obj)
    scene, stats = flatten.flatten(g.root)
    assert stats.num_triangles == 1


def test_env_dists_disk_cache(tmp_path):
    """Env sampling tables are cached beside the asset as <file>.dists.npz
    (reference: load_environment, environment.h:99-144): first flatten
    writes it, a second flatten reads it (proved by tampering the cached
    marginal pdf), and a stale key rebuilds."""
    from stratum_tpu.io.image import save_image
    from stratum_tpu.scene.graph import EnvironmentComponent, NodeGraph

    rng = np.random.default_rng(3)
    img = rng.uniform(0.1, 2.0, (16, 32, 3)).astype(np.float32)
    path = tmp_path / "sky.hdr"
    save_image(path, img)

    def build():
        from stratum_tpu.io.image import load_image

        g = NodeGraph()
        g.root.add_child("env").make_component(
            EnvironmentComponent(
                color=np.ones(3, np.float32),
                image=load_image(path, srgb=None)[..., :3],
                source_path=str(path),
            )
        )
        # a camera + one triangle so flatten has geometry
        tri = g.root.add_child("tri")
        tri.make_component(MeshPrimitive(
            positions=np.asarray(
                [[0, 0, 0], [1, 0, 0], [0, 1, 0]], np.float32
            ),
            indices=np.asarray([[0, 1, 2]], np.int32),
        ))
        scene, _ = flatten.flatten(g.root)
        return scene

    cache = tmp_path / "sky.hdr.dists.npz"
    s1 = build()
    assert cache.exists()

    # tamper: double the cached marginal pdf; a cache hit must surface it
    z = dict(np.load(cache))
    z["m_pdf"] = z["m_pdf"] * 2.0
    np.savez(cache, **z)
    s2 = build()
    np.testing.assert_allclose(
        np.asarray(s2.env.dist.marginal.pdf),
        np.asarray(s1.env.dist.marginal.pdf) * 2.0,
    )

    # stale key (different image content) rebuilds and rewrites
    z["key"] = z["key"] + 1
    np.savez(cache, **z)
    s3 = build()
    np.testing.assert_allclose(
        np.asarray(s3.env.dist.marginal.pdf),
        np.asarray(s1.env.dist.marginal.pdf),
    )
