"""Regenerate golden images (run manually after INTENTIONAL rendering
changes; the diff in git shows what changed). Goldens live in tests/golden/
as float32 .npy radiance — the ImageComparer-as-pytest workflow from
SURVEY.md §4."""

import os
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/stratum_jax_cache")

import jax

jax.config.update("jax_platforms", "cpu")

from stratum_tpu.utils import jaxcache  # noqa: E402

jaxcache.enable()

import numpy as np  # noqa: E402

GOLDEN = Path(__file__).parent / "golden"


def configs():
    from stratum_tpu.render import camera, integrator
    from stratum_tpu.scene import builtin, flatten

    out = {}

    def add(name, graph, spp=16, **cfg_kw):
        scene, _ = flatten.flatten(graph.root)
        node, cam = flatten.find_camera(graph.root)
        view = camera.make_view(node.to_world(), cam.fovy, 48, 48)
        cfg = integrator.RenderConfig(
            width=48, height=48, rr_depth=100, **cfg_kw
        )
        out[name] = (scene, view, cfg, spp)

    add("cornell_path", builtin.cornell_box(), max_bounces=3)
    add("cornell_disney", builtin.cornell_box(), max_bounces=3, bsdf="disney")
    add(
        "spheres_disney",
        builtin.material_spheres(stacks=12, slices=24),
        spp=8,
        max_bounces=4,
        bsdf="disney",
    )
    # textured asset through the REAL file loaders (OBJ + MTL + PNG + HDR
    # env): baseline config 4's coverage — texture stack, sRGB decode,
    # mip LOD, env importance sampling (VERDICT r2 weak items 4/5)
    import tempfile

    from stratum_tpu.scene import sample_assets

    g, _info = sample_assets.load_colonnade(
        Path(tempfile.gettempdir()) / "stratum_colonnade_golden",
        columns=3, seg=12, rings=6, tex_res=64, env_res=64,
    )
    add(
        "colonnade_textured", g, spp=8, max_bounces=2, bsdf="disney",
        presample_lights=256,
    )
    # heterogeneous smoke plume: delta tracking + ratio-tracked shadows +
    # HG scattering through the hermetic procedural cloud (VERDICT r2
    # volume-tier done-criterion: a smoke golden renders)
    add("cornell_smoke", builtin.smoky_cornell(sigma=0.05), spp=8,
        max_bounces=3)
    return out


def render(scene, view, cfg, spp):
    from stratum_tpu.render import integrator

    return np.asarray(
        integrator.render_path_progressive(scene, view, cfg, spp)
    )


def main():
    GOLDEN.mkdir(exist_ok=True)
    for name, (scene, view, cfg, spp) in configs().items():
        img = render(scene, view, cfg, spp)
        np.save(GOLDEN / f"{name}.npy", img)
        print(f"wrote {name}: mean={img.mean():.4f}")


if __name__ == "__main__":
    main()
