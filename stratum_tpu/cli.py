"""Command-line renderer.

TPU-native analog of the reference's app wiring (src/main.cpp + the CLI
option surface of Core/Instance.cpp:57-70 and Node/BDPT.cpp:54-127): load or
build a scene, flatten it, render progressively, tonemap, write the image,
print an inspector-style stats report. Offline by design — the interactive
window/ImGui layer of the reference maps to this CLI + the library API.

Usage:
    python -m stratum_tpu.cli --scene=cornell --width=512 --height=512 \
        --spp=64 --out=cornell.png --tonemap=aces --exposure=0
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

import numpy as np


def build_scene(opts):
    from stratum_tpu.scene import builtin
    from stratum_tpu.scene.loaders.obj import load_obj
    from stratum_tpu.scene.graph import (
        CameraComponent,
        NodeGraph,
        TransformComponent,
    )

    name = opts.get_str("scene", "cornell")
    if name == "cornell":
        return builtin.cornell_box()
    if name == "furnace":
        return builtin.furnace()
    if name == "spheres":
        return builtin.material_spheres()
    if name == "atrium":
        return builtin.atrium()
    path = Path(name)
    if not path.exists():
        raise FileNotFoundError(f"scene {name!r} not found")
    g = NodeGraph()
    ext = path.suffix.lower()
    if ext == ".obj":
        load_obj(g.root, path)
    elif ext in (".gltf", ".glb"):
        from stratum_tpu.scene.loaders.gltf import load_gltf

        load_gltf(g.root, path)
    elif ext == ".xml":
        from stratum_tpu.scene.loaders.mitsuba import load_mitsuba

        load_mitsuba(g.root, path)
    elif ext == ".ply":
        from stratum_tpu.scene.loaders.ply import load_ply_mesh
        from stratum_tpu.scene.graph import MeshPrimitive

        pos, nrm, uvs, idx = load_ply_mesh(path)
        g.root.add_child(path.stem).make_component(
            MeshPrimitive(positions=pos, indices=idx, normals=nrm, uvs=uvs)
        )
    elif ext == ".stl":
        from stratum_tpu.scene.loaders.stl import load_stl

        load_stl(g.root, path)
    elif ext == ".fbx":
        from stratum_tpu.scene.loaders.fbx import load_fbx

        load_fbx(g.root, path)
    elif ext == ".blend":
        # formally descoped (README "Scope"): .blend is a dump of
        # Blender's in-memory DNA structs — even assimp's importer
        # (reference load_assimp.cpp:14-41) is marginal. Export instead.
        raise ValueError(
            f"{path}: .blend is unsupported — export from Blender as "
            "glTF/GLB (best fidelity) or OBJ/FBX and load that instead"
        )
    else:
        raise ValueError(f"unsupported scene extension {ext!r}")
    return g


def ensure_camera(g, opts, scene_aabb):
    """Find a camera or synthesize one framing the scene (reference:
    setup_camera, src/main.cpp:69-89 with cameraPosX/... flags)."""
    from stratum_tpu.scene import flatten as sflatten
    from stratum_tpu.scene.graph import CameraComponent, TransformComponent

    found = sflatten.find_camera(g.root)
    if found is not None and not opts.has("cameraPosX"):
        node, cam = found
        return node.to_world(), cam.fovy
    lo, hi = scene_aabb
    center = (lo + hi) / 2
    extent = float(np.linalg.norm(hi - lo))
    eye = np.asarray(
        [
            opts.get_float("cameraPosX", center[0]),
            opts.get_float("cameraPosY", center[1]),
            opts.get_float("cameraPosZ", center[2] - 1.5 * extent),
        ],
        np.float32,
    )
    fovy = np.radians(opts.get_float("fovy", 70.0))
    from stratum_tpu.core import transform as xform

    c2w = np.asarray(xform.look_at(eye, center))
    return c2w, fovy


def main(argv=None) -> int:
    from stratum_tpu.utils.flags import Options

    opts = Options(sys.argv[1:] if argv is None else argv)
    if opts.has("help"):
        print(__doc__)
        return 0

    # heavy imports after flag parsing
    import jax

    if opts.has("cpu"):
        jax.config.update("jax_platforms", "cpu")
    from stratum_tpu.utils import jaxcache

    jaxcache.enable(opts.get_str("compileCache", "") or None)
    from stratum_tpu.scene import flatten as sflatten
    from stratum_tpu.render import camera as scamera
    from stratum_tpu.render import integrator as sintegrator
    from stratum_tpu.render import tonemap as stonemap
    from stratum_tpu.io.image import save_image

    t0 = time.time()
    g = build_scene(opts)
    # plugins: python modules with a register(graph, opts) hook
    # (reference: dynamic_library plugin loading, src/main.cpp:11-24)
    for vol in opts.find_all("volume"):
        from stratum_tpu.scene.loaders.volumes import load_volume

        load_volume(g.root, vol, density_scale=opts.get_float("densityScale", 1.0))
    if opts.has("envmap"):
        # equirect HDR/EXR/PFM environment light (reference: Environment
        # material + importance tables, Shaders/environment.h:48-93)
        from stratum_tpu.io.image import load_image
        from stratum_tpu.scene.graph import EnvironmentComponent

        g.root.add_child("envmap").make_component(
            EnvironmentComponent(
                color=np.full(3, opts.get_float("envScale", 1.0), np.float32),
                image=load_image(opts.get_str("envmap"), srgb=None)[..., :3],
                source_path=opts.get_str("envmap"),
            )
        )
    for plug in opts.find_all("plugin"):
        import importlib

        mod = importlib.import_module(plug)
        if hasattr(mod, "register"):
            mod.register(g, opts)
    anim_time = opts.get_float("time", None) if opts.has("time") else None
    prev_time = (
        opts.get_float("prevTime", None) if opts.has("prevTime") else None
    )
    scene, stats = sflatten.flatten(
        g.root, time=anim_time, prev_time=prev_time,
        # reference: gEnvironmentSampleProbability (bdpt.h push constant) —
        # the env-vs-area split of NEE light sampling
        env_probability=opts.get_float("envProb", 0.5),
    )
    lo = np.asarray(scene.geo.positions).min(axis=0)
    hi = np.asarray(scene.geo.positions).max(axis=0)
    t_flatten = time.time() - t0

    width = opts.get_int("width", 512)
    height = opts.get_int("height", 512)
    spp = opts.get_int("spp", 16)
    seed = opts.get_int("seed", 0)
    c2w, fovy = ensure_camera(g, opts, (lo, hi))
    view = scamera.make_view(c2w, fovy, width, height)

    # --quality: the time-to-quality preset (beyond-reference knobs whose
    # composition measured 2.5-5.5x lower RMSE at equal budget on cornell,
    # tools/quality_bench.py): Kronecker lattice sampler + unbiased
    # shadow-ray RR (tau=0.05, -9% wall at identical mean) + adaptive
    # sample allocation. Explicit flags still override each piece. The
    # bench keeps these OFF so Mrays/s stays comparable to the reference's
    # ray counters.
    quality = opts.get_bool("quality", False)

    # full parameter surface (reference: every BDPT option is a CLI flag,
    # Node/BDPT.cpp:54-127)
    cfg = sintegrator.RenderConfig(
        width=width,
        height=height,
        max_bounces=opts.get_int("maxBounces", 4),
        use_nee=opts.get_bool("nee", True),
        use_mis=opts.get_bool("mis", True),
        bsdf=opts.get_str("bsdf", "disney"),
        rr_depth=opts.get_int("rrDepth", 2),
        rr_min_beta=opts.get_float("rrMinBeta", 0.05),
        tracer=opts.get_str("tracer", "auto"),
        alpha_test=opts.get_bool("alphaTest", False),
        ris_candidates=opts.get_int("ris", 1)
        if opts.get_str("integrator", "path") != "restir" else 1,
        sort_rays=opts.get_bool("sortRays", True),
        defer_shadows=opts.get_bool("deferShadows", True),
        presample_lights=opts.get_int("presampleLights", 0),
        coherent_tiles=opts.get_int("coherentTiles", 0),
        # --lvcConnections=R: BDPT light-vertex-cache reservoir connections
        # (R candidates/vertex) instead of deterministic pairing
        lvc_connections=opts.get_int("lvcConnections", 0),
        # --shadowRr=L: RR NEE shadow rays whose unoccluded contribution
        # luminance is below L (survivors carry 1/p; unbiased)
        shadow_rr=opts.get_float("shadowRr", 0.05 if quality else 0.0),
        # --clampIndirect=L: firefly suppression (biased, bounded)
        clamp_indirect=opts.get_float("clampIndirect", 0.0),
        # --texFilter=stochastic: one mip per sample picked by the blend
        # fraction (half the texture gathers, E == trilinear)
        tex_filter=opts.get_str("texFilter", "trilinear"),
        # --waveCaps=1,1,0.5,0.125: cross-bounce stream compaction caps
        # (fraction of the launch width per bounce); see RenderConfig
        wave_caps=tuple(
            float(x)
            for x in opts.get_str("waveCaps", "").split(",")
            if x.strip()
        ),
    )
    integrator_name = opts.get_str("integrator", "path")
    # env NEE sampler: 2D CDF tables (environment.h:48-70) or hierarchical
    # mip texel descent (sample_texel, bdpt_util.hlsli:85-180). Trace-time
    # global like ops.pallas_trace.MT_MODE — set once before rendering and
    # RESTORED on exit: main() is also callable in-process (tests, library
    # embedders), where a leaked global would silently change every later
    # render in the process (a kron run once poisoned the golden suite).
    from stratum_tpu.core import rng as srng
    from stratum_tpu.render import lights as slights

    prev_env_sampler = slights.ENV_SAMPLER
    prev_qmc = srng.QMC
    slights.ENV_SAMPLER = opts.get_str("envSampler", slights.ENV_SAMPLER)
    # --sampler=kron: Cranley-Patterson-rotated Kronecker lattice instead
    # of independent pcg4d draws — lower RMSE at equal spp (core/rng.py)
    srng.QMC = opts.get_str("sampler", "kron" if quality else srng.QMC)
    try:
        return _render_and_write(
            opts, scene, stats, view, cfg, integrator_name, width, height,
            spp, seed, t_flatten,
        )
    finally:
        slights.ENV_SAMPLER = prev_env_sampler
        srng.QMC = prev_qmc


def _render_and_write(
    opts, scene, stats, view, cfg, integrator_name, width, height, spp,
    seed, t_flatten,
):
    from stratum_tpu.io.image import save_image
    from stratum_tpu.render import integrator as sintegrator
    from stratum_tpu.render import tonemap as stonemap

    t0 = time.time()
    if opts.has("debug"):
        # renderer debug views (reference: BDPTDebugMode, bdpt.h:177-193)
        from stratum_tpu.render import debug as sdebug

        img = sdebug.render_debug(
            scene, view, cfg, opts.get_str("debug", "albedo"), seed, spp
        )
    elif integrator_name == "direct":
        img = sintegrator.render_direct_progressive(scene, view, cfg, spp, seed)
    elif integrator_name == "path" and opts.get_bool(
        "adaptive", opts.get_bool("quality", False)
    ):
        # variance-guided adaptive sampling (render/adaptive.py): spp is
        # the AVERAGE per-pixel budget; measured 1.5-1.8x lower RMSE at
        # equal budget vs uniform on Cornell
        from stratum_tpu.render import adaptive as sadaptive

        img, _ = sadaptive.render_adaptive(
            scene, view, cfg, spp,
            pilot=opts.get_int("adaptivePilot", max(2, spp // 4)),
            frac=opts.get_float("adaptiveFrac", 0.25),
            seed0=seed,
        )
    elif integrator_name == "path":
        # one compiled launch for all spp (lax.scan over seeds); per-sample
        # dispatch amortizes away. --sppBatch=N caps lax.scan length (and
        # compile-time unrolling of wave_caps configs) per launch.
        import jax.numpy as jnp

        batch = opts.get_int("sppBatch", spp)
        # --sppLanes=N additionally traces N samples per launch as extra
        # wavefront lanes (render_path_lanes): coherence + amortization,
        # memory scales with N (2-4 practical at 1080p)
        lanes = opts.get_int("sppLanes", 0)
        img = jnp.zeros((cfg.height, cfg.width, 3), jnp.float32)
        done = 0
        while done < spp:
            if lanes > 1:
                b = min(lanes, spp - done)
                mean_b, _ = sintegrator.render_path_lanes(
                    scene, view, cfg, b, seed + done
                )
            else:
                b = min(batch, spp - done)
                mean_b, _ = sintegrator.render_path_batched(
                    scene, view, cfg, b, seed + done
                )
            img = img + mean_b * b
            done += b
        img = img / spp
    elif integrator_name == "lt":
        from stratum_tpu.render import lighttrace

        img = lighttrace.render_lt_progressive(scene, view, cfg, spp, seed)
    elif integrator_name == "bdpt":
        from stratum_tpu.render import bdpt as sbdpt

        if opts.get_bool("lvcReuse", False) and cfg.lvc_connections > 0:
            # --lvcReuse: cross-frame LVC reservoir reuse (reference
            # eLVCReservoirReuse) — the progressive loop threads the
            # hash-grid reservoir state between frames
            import jax as _jax

            acc = None
            state = None
            for s in range(spp):
                frame, state = sbdpt.render_bdpt_reuse(
                    scene, view, cfg, seed + s, state
                )
                acc = frame if acc is None else acc + frame
            img = acc / spp
            _jax.block_until_ready(img)
        else:
            img = sbdpt.render_bdpt_progressive(
                scene, view, cfg, spp, seed,
                chunks=(
                    opts.get_int("bdptChunks", 0) or None
                ),  # default: auto from CHUNK_PIXELS
            )
    elif integrator_name == "restir":
        # ReSTIR DI (reservoirs persist across the spp frames) composed
        # with indirect-only progressive PT (render/session.py does the
        # same composition for interactive use)
        from stratum_tpu.render import session as ssession

        sess = ssession.RenderSession(
            scene, view, cfg,
            use_restir=True,
            restir_candidates=opts.get_int("ris", 4),
            restir_spatial_taps=opts.get_int("spatialTaps", 1),
            # --hashJitter: jitter spatial-tap hash lookups tangentially
            # by up to one cell (reference eHashGridJitter)
            restir_hash_jitter=opts.get_bool("hashJitter", False),
            seed0=seed,
        )
        img = sess.step(spp)
    else:
        raise ValueError(f"unknown integrator {integrator_name!r}")
    if opts.get_bool("denoise", False):
        from stratum_tpu.render import aov as saov
        from stratum_tpu.render import denoise as sdenoise

        gbuf = saov.render_gbuffer(scene, view, view, cfg)
        state = sdenoise.init_state(height, width)
        dcfg = sdenoise.DenoiseConfig(
            atrous_iterations=opts.get_int("atrousIters", 5),
            filter_type=opts.get_str("filterType", "atrous"),
            history_tap=opts.get_int("historyTap", 0),
            debug_mode=opts.get_str("denoiserDebug", "none"),
        )
        state, img = sdenoise.denoise(state, img, gbuf, dcfg)
    img = np.asarray(img)
    t_render = time.time() - t0

    mode = stonemap.TonemapMode(opts.get_str("tonemap", "raw"))
    out = opts.get_str("out", "render.png")
    exposure = opts.get_float("exposure", 0.0)
    if opts.get_bool("autoexposure", False):
        # normalize by the frame max (reference: tonemap reduce_max +
        # exposure EMA, tonemap.hlsl:105-181)
        max_c, _ = stonemap.reduce_max_color(img)
        exposure = exposure - float(np.log2(max(float(max_c), 1e-4)))
    display = np.asarray(
        stonemap.tonemap(img, mode, exposure=exposure)
    )
    save_image(out, display if out.endswith(".png") else img)

    # inspector-style report (reference: Scene.cpp:284-297, BDPT.cpp:222-225)
    rays = width * height * spp
    print(
        f"scene: {stats.num_instances} instances, {stats.num_triangles} tris, "
        f"{stats.num_materials} materials, {stats.num_lights} lights "
        f"(flatten {t_flatten:.2f}s)"
    )
    print(
        f"render: {width}x{height} @ {spp}spp, {integrator_name} integrator, "
        f"{t_render:.2f}s, {rays / max(t_render, 1e-9) / 1e6:.2f} Mcamera-rays/s"
    )
    print(f"wrote {out}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
