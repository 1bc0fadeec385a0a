"""Scene inspector: node tree + component/stat report as a CLI.

TPU-native analog of the reference's ImGui Inspector
(src/Node/Inspector.{hpp,cpp}: node-graph tree UI with per-component GUI
callbacks) and the Scene stats panel (Node/Scene.cpp:284-297: instance /
light / material counts). Offline: prints the tree, the flattened device
buffers with shapes/bytes, materials and lights.

Usage:
    python -m stratum_tpu.tools.inspect --scene=cornell [--flatten]
"""

from __future__ import annotations

import sys


def _tree(node, depth=0, lines=None):
    lines = [] if lines is None else lines
    comps = ", ".join(type(c).__name__ for c in node.components.values())
    lines.append(f"{'  ' * depth}{node.name}" + (f"  [{comps}]" if comps else ""))
    for c in node.children:
        _tree(c, depth + 1, lines)
    return lines


def main(argv=None) -> int:
    from stratum_tpu.utils.flags import Options

    opts = Options(sys.argv[1:] if argv is None else argv)
    import jax

    if not opts.has("tpu"):
        jax.config.update("jax_platforms", "cpu")
    import numpy as np

    from stratum_tpu.cli import build_scene

    g = build_scene(opts)
    print("\n".join(_tree(g.root)))

    if not (opts.has("flatten") or opts.has("pick")):
        return 0
    from stratum_tpu.scene import flatten as sflatten

    scene, stats = sflatten.flatten(g.root)

    if opts.has("pick"):
        # --pick=x,y: pixel -> instance/prim/depth readback (reference:
        # Inspector selection via VisibilityInfo pick, Node/BDPT.cpp:360-371)
        from stratum_tpu.render import aov as saov
        from stratum_tpu.render import camera as scamera
        from stratum_tpu.render.integrator import RenderConfig

        x, y = (int(v) for v in opts.get_str("pick").split(","))
        width = opts.get_int("width", 512)
        height = opts.get_int("height", 512)
        node, cam = sflatten.find_camera(g.root)
        view = scamera.make_view(node.to_world(), cam.fovy, width, height)
        cfg = RenderConfig(width=width, height=height)
        r = saov.pick(scene, view, cfg, x, y)
        inst = int(r.instance[0])
        names = stats.instance_names
        pos = np.asarray(r.position[0])
        print(
            f"\npick ({x},{y}): instance={inst}"
            + (f" ({names[inst]})" if 0 <= inst < len(names) else "")
            + f" prim={int(r.prim[0])} material={int(r.material[0])}"
            f" depth={float(r.depth[0]):.4f}"
            f" pos=({pos[0]:.3f},{pos[1]:.3f},{pos[2]:.3f})"
        )

    if not opts.has("flatten"):
        return 0
    print(
        f"\ninstances {stats.num_instances}  triangles {stats.num_triangles}"
        f"  vertices {stats.num_vertices}  materials {stats.num_materials}"
        f"  lights {stats.num_lights}"
    )
    total = 0
    print("\ndevice buffers:")
    for leaf, path in zip(
        jax.tree.leaves(scene),
        jax.tree_util.tree_flatten_with_path(scene)[0],
    ):
        name = jax.tree_util.keystr(path[0])
        nbytes = leaf.size * leaf.dtype.itemsize
        total += nbytes
        if nbytes >= 1 << 16:
            print(f"  {name:<55s} {str(leaf.shape):>18s} {nbytes / 1e6:8.2f} MB")
    print(f"total device memory: {total / 1e6:.1f} MB")

    print("\nmaterials:")
    m = scene.materials
    for i in range(int(m.num_materials)):
        bc = np.asarray(m.base_color[i])
        em = np.asarray(m.emission[i])
        print(
            f"  [{i}] base=({bc[0]:.2f},{bc[1]:.2f},{bc[2]:.2f})"
            f" metal={float(m.metallic[i]):.2f}"
            f" rough={float(m.roughness[i]):.2f}"
            f" trans={float(m.transmission[i]):.2f}"
            + (f" Le={em.max():.1f}" if em.max() > 0 else "")
        )
    nl = int(scene.lights.num_lights)
    print(f"\nlights: {nl} emissive triangles, total power "
          f"{float(np.asarray(scene.lights.power).sum()):.1f}")

    if scene.fat_bvh is not None:
        # traversal-cost telemetry: a visited leaf charges the full K-slab
        # DMA+matmul regardless of fill (ops/pallas_trace.py), so fill is
        # matmul efficiency and total box area tracks false-positive visits
        fb = scene.fat_bvh
        tri = np.asarray(fb.leaf_tri)
        fill = float((tri >= 0).mean())
        d = np.maximum(
            np.asarray(fb.leaf_hi) - np.asarray(fb.leaf_lo), 0.0
        )
        area = float(
            (2 * (d[:, 0] * d[:, 1] + d[:, 1] * d[:, 2] + d[:, 2] * d[:, 0]))
            .sum()
        )
        print(
            f"\nBVH: {fb.num_leaves} fat leaves x K={fb.leaf_size}, "
            f"slot fill {fill:.1%}, total leaf surface area {area:.3g}"
        )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
