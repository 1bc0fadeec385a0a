"""1k-spp cross-estimator convergence artifact (BASELINE.json quality
metric; VERDICT r3 item 5). With no reference renderer runnable offline,
cross-estimator agreement at high spp is the parity evidence: PT, LT and
BDPT share no code path above the tracer (different estimators of the
same integral), so their converged images agreeing at the noise floor is
the strongest available check that each is unbiased and correctly
weighted (reference workflow: ImageComparer MSE vs saved snapshots,
src/Node/ImageComparer.cpp:50-89).

Produces:
  - cornell 512x512: PT vs LT vs BDPT full-GI RMSE at --spp (default 1024)
    + PT-direct vs single-frame-RIS ReSTIR at --spp
  - colonnade 640x360 (textured, file-loaded): PT vs BDPT at --spp
  - RMSE-vs-spp curve (PT, cornell) at 4/16/64/256 vs the 1024-spp PT
    image, with the 1/sqrt(N) fit exponent
  - JSON lines to stdout + resumable accumulators in /tmp/r4_convergence/
    (a tunnel drop resumes instead of restarting; exact because every
    sample's RNG is (pixel, seed, dim)-keyed)

python tools/convergence_bench.py [--spp=1024] [--cpu] [--scenes=cornell,
colonnade] [--ckpt=64]
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/stratum_jax_cache")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from stratum_tpu.utils import jaxcache  # noqa: E402

jaxcache.enable()

CKPT_DIR = Path("/tmp/r4_convergence")


def rmse(a, b):
    import numpy as np

    return float(np.sqrt(np.mean((np.asarray(a) - np.asarray(b)) ** 2)))


def main():
    from stratum_tpu.utils.flags import Options

    opts = Options(sys.argv[1:])
    import jax

    if opts.has("cpu"):
        jax.config.update("jax_platforms", "cpu")
    import numpy as np

    from stratum_tpu.render import bdpt as sbdpt
    from stratum_tpu.render import camera, integrator, lighttrace, restir
    from stratum_tpu.scene import builtin, flatten

    spp = opts.get_int("spp", 1024)
    ckpt_every = opts.get_int("ckpt", 64)
    size = opts.get_int("size", 512)  # cornell render size (CPU smoke: 48)
    scenes = opts.get_str("scenes", "cornell,colonnade").split(",")
    CKPT_DIR.mkdir(exist_ok=True)
    results = {}

    def accumulate(tag, frame_fn, n_spp, shape):
        """Resumable mean of n_spp frames; frame_fn(seed) -> [H,W,3].

        `shape` guards resume: a checkpoint written by a different-size
        run (e.g. a size=48 CPU smoke) is discarded, not summed into.
        """
        ck = CKPT_DIR / f"{tag}.npz"
        done, acc = 0, None
        if ck.exists():
            z = np.load(ck)
            done, acc = int(z["done"]), z["acc"]
            if tuple(acc.shape) != tuple(shape):
                print(f"# {tag}: discarding stale checkpoint "
                      f"{acc.shape} != {shape}", flush=True)
                done, acc = 0, None
            elif done >= n_spp:
                return acc / done
        t0 = time.time()
        for s in range(done, n_spp):
            img = np.asarray(frame_fn(s + 1), np.float64)
            acc = img if acc is None else acc + img
            if (s + 1) % ckpt_every == 0 or s + 1 == n_spp:
                np.savez(ck, done=s + 1, acc=acc)
                el = time.time() - t0
                print(f"# {tag}: {s+1}/{n_spp} spp "
                      f"({el/(s+1-done):.2f} s/spp)", flush=True)
        return acc / n_spp

    if "cornell" in scenes:
        g = builtin.cornell_box()
        scene, _ = flatten.flatten(g.root)
        node, cam = flatten.find_camera(g.root)
        W = H = size
        view = camera.make_view(node.to_world(), cam.fovy, W, H)
        cfg = integrator.RenderConfig(
            width=W, height=H, max_bounces=4, bsdf="disney",
        )

        def pt(seed):
            return integrator.render_path(scene, view, cfg, seed).reshape(
                H, W, 3
            )

        def lt(seed):
            return lighttrace.render_lt(scene, view, cfg, seed)

        def bd(seed):
            return sbdpt.render_bdpt(scene, view, cfg, seed)

        img_pt = accumulate("cornell_pt", pt, spp, (H, W, 3))
        # RMSE-vs-spp curve: INDEPENDENT seed stream (offset 1e6) so the
        # curve points share no samples with the reference image — a
        # shared prefix would underestimate error as n -> spp
        curve = []
        for n in (4, 16, 64, 256):
            if n * 4 > spp:
                break
            part = accumulate(
                f"cornell_pt_{n}", lambda s: pt(s + 1_000_000), n,
                (H, W, 3),
            )
            curve.append((n, rmse(part, img_pt)))
        img_lt = accumulate("cornell_lt", lt, spp, (H, W, 3))
        img_bd = accumulate("cornell_bdpt", bd, spp, (H, W, 3))
        results["cornell"] = {
            "spp": spp,
            "pt_mean": float(img_pt.mean()),
            "rmse_pt_lt": rmse(img_pt, img_lt),
            "rmse_pt_bdpt": rmse(img_pt, img_bd),
            "rmse_lt_bdpt": rmse(img_lt, img_bd),
            "curve_pt": curve,
        }
        if len(curve) > 1:
            import math

            xs = [math.log(n) for n, _ in curve]
            ys = [math.log(r) for _, r in curve]
            nx = len(xs)
            sx, sy = sum(xs), sum(ys)
            sxx = sum(x * x for x in xs)
            sxy = sum(x * y for x, y in zip(xs, ys))
            slope = (nx * sxy - sx * sy) / (nx * sxx - sx * sx)
            results["cornell"]["curve_exponent"] = slope  # expect ~ -0.5
        print(json.dumps({"cornell": results["cornell"]}), flush=True)

        # direct-lighting agreement: PT (bounces=0, NEE) vs single-frame
        # RIS ReSTIR (no temporal history -> plain WRS, unbiased)
        cfg_d = integrator.RenderConfig(
            width=W, height=H, max_bounces=0, bsdf="disney",
        )

        def ptd(seed):
            return integrator.render_path(
                scene, view, cfg_d, seed
            ).reshape(H, W, 3)

        def ris(seed):
            st = restir.init_restir(W * H)
            # restir_di_jit: the unjitted wrapper dispatches the whole
            # pipeline op-by-op (measured 29 s/spp through the tunnel
            # vs 0.4 jitted)
            _, direct = restir.restir_di_jit(
                scene, view, cfg_d, st, seed, 8
            )
            return direct

        img_ptd = accumulate("cornell_pt_direct", ptd, spp, (H, W, 3))
        img_ris = accumulate("cornell_ris", ris, spp, (H, W, 3))
        results["cornell_direct"] = {
            "spp": spp,
            "rmse_ptdirect_ris": rmse(img_ptd, img_ris),
            "ptdirect_mean": float(img_ptd.mean()),
            "ris_mean": float(img_ris.mean()),
        }
        print(json.dumps({"cornell_direct": results["cornell_direct"]}),
              flush=True)

    if "colonnade" in scenes:
        from stratum_tpu.scene import sample_assets

        g, _info = sample_assets.load_colonnade("/tmp/stratum_colonnade_bench")
        scene, _ = flatten.flatten(g.root)
        node, cam = flatten.find_camera(g.root)
        W2, H2 = 640, 360
        view = camera.make_view(node.to_world(), cam.fovy, W2, H2)
        cfg = integrator.RenderConfig(
            width=W2, height=H2, max_bounces=4, bsdf="disney",
            presample_lights=4096, coherent_tiles=16,
        )

        def pt2(seed):
            return integrator.render_path(scene, view, cfg, seed).reshape(
                H2, W2, 3
            )

        cfgb = integrator.RenderConfig(
            width=W2, height=H2, max_bounces=4, bsdf="disney",
        )

        def bd2(seed):
            return sbdpt.render_bdpt_chunked(scene, view, cfgb, seed)

        img_pt2 = accumulate("colonnade_pt", pt2, spp, (H2, W2, 3))
        img_bd2 = accumulate("colonnade_bdpt", bd2, spp, (H2, W2, 3))
        results["colonnade"] = {
            "spp": spp,
            "rmse_pt_bdpt": rmse(img_pt2, img_bd2),
            "pt_mean": float(img_pt2.mean()),
            "bdpt_mean": float(img_bd2.mean()),
        }
        print(json.dumps({"colonnade": results["colonnade"]}), flush=True)

    print(json.dumps({"convergence": results}), flush=True)


if __name__ == "__main__":
    raise SystemExit(main())
