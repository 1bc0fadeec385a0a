"""TPU semantic smoke check: run on the REAL device (no --cpu escape) and
assert properties that the CPU-only test tier cannot see.

The fast test tier forces JAX_PLATFORMS=cpu (tests/conftest.py), so
TPU-only numeric semantics — bf16 default matmul precision, denormal
flush-to-zero through gather/canonicalization, f32 max overflowing in
bf16 — are invisible to it. This harness caught the trace-local-sort
tri-id corruption (denormal bitcast patterns mangled by the XLA:TPU
gather path) that silently removed all indirect lighting from every
sorted TPU render while all 200+ CPU tests stayed green.

Checks (each one is cheap; total ~2 min warm):
1. furnace oracle: env pixels == 0.5 exactly, sphere == 0.4 +- noise
   (the analytic ground truth the suite uses, reference furnace test).
2. indirect light present: atrium mean(mb=4) > mean(mb=1) and ray
   counts strictly grow with max_bounces.
3. cross-tracer agreement: packet vs pallas images within noise.
4. sort invariance: sort_rays on/off produce near-identical images.

Usage: python tools/tpu_check.py  (exit 0 = pass)
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/stratum_jax_cache")

from stratum_tpu.utils import jaxcache  # noqa: E402

jaxcache.enable()


def main() -> int:
    import jax
    import jax.numpy as jnp
    import numpy as np

    from stratum_tpu.render import camera, integrator
    from stratum_tpu.scene import builtin, flatten

    print("platform:", jax.devices()[0].platform, jax.devices()[0])
    failures = []

    # -- 1. furnace oracle --------------------------------------------------
    g = builtin.furnace()
    scene, _ = flatten.flatten(g.root)
    node, cam = flatten.find_camera(g.root)
    W = H = 64
    view = camera.make_view(node.to_world(), cam.fovy, W, H)
    cfg = integrator.RenderConfig(width=W, height=H, max_bounces=4)
    # render_path_progressive returns the MEAN already (acc / spp)
    img = np.asarray(
        integrator.render_path_progressive(scene, view, cfg, 8, 0)
    )
    env_px, sph_px = img[2, 2], img[H // 2, W // 2]
    if not np.allclose(env_px, 0.5, atol=1e-3):
        failures.append(f"furnace env pixel {env_px} != 0.5")
    if not np.allclose(sph_px, 0.4, atol=0.03):
        failures.append(f"furnace sphere pixel {sph_px} != 0.4")
    print(f"furnace: env={env_px[0]:.4f} sphere={sph_px[0]:.4f}")

    # -- 2/3/4. atrium: bounces, tracers, sorting ---------------------------
    g = builtin.atrium()
    scene, _ = flatten.flatten(g.root)
    node, cam = flatten.find_camera(g.root)
    W, H = 192, 108
    view = camera.make_view(node.to_world(), cam.fovy, W, H)

    # STRATUM_CHECK_TRACER=packet lets the harness logic dry-run on CPU
    # (the pallas kernel is TPU-only); on the real chip leave it unset
    tracer_override = os.environ.get("STRATUM_CHECK_TRACER")

    def render(tracer, mb, sort):
        tracer = tracer_override or tracer
        cfg = integrator.RenderConfig(
            width=W, height=H, max_bounces=mb, bsdf="disney",
            tracer=tracer, sort_rays=sort,
        )
        img, n = integrator.render_path_with_counts(scene, view, cfg, 0)
        return np.asarray(img), int(n)

    p1, n1 = render("packet", 1, True)
    p4, n4 = render("packet", 4, True)
    if not (n4 > n1):
        failures.append(f"ray count does not grow with bounces: {n1} -> {n4}")
    if not (p4.mean() > p1.mean() * 1.01):
        failures.append(
            f"no indirect light: mean(mb=4)={p4.mean():.5f} "
            f"vs mean(mb=1)={p1.mean():.5f}"
        )
    print(f"bounces: mb1 mean={p1.mean():.5f} ({n1} rays) "
          f"mb4 mean={p4.mean():.5f} ({n4} rays)")

    q4, _ = render("pallas", 4, True)
    rel = abs(q4.mean() - p4.mean()) / max(p4.mean(), 1e-9)
    if rel > 0.01:
        failures.append(f"packet vs pallas disagree: {rel*100:.2f}%")
    print(f"tracers: packet={p4.mean():.5f} pallas={q4.mean():.5f} "
          f"({rel*100:.3f}%)")

    u4, _ = render("packet", 4, False)
    rel = abs(u4.mean() - p4.mean()) / max(p4.mean(), 1e-9)
    if rel > 0.01:
        failures.append(f"sort on/off disagree: {rel*100:.2f}%")
    print(f"sorting: on={p4.mean():.5f} off={u4.mean():.5f} "
          f"({rel*100:.3f}%)")

    # -- 5. round-3 features on-device: leaf packing, shadow RR, env mip ----
    import dataclasses

    from stratum_tpu.ops import packet as spacket

    spacket.SAH_PACK_ALPHA = 3.0
    scene_p, _ = flatten.flatten(g.root)
    spacket.SAH_PACK_ALPHA = 0.0
    cfgp = integrator.RenderConfig(
        width=W, height=H, max_bounces=4, bsdf="disney",
        tracer=tracer_override or "pallas",
    )
    pk, _ = integrator.render_path_with_counts(scene_p, view, cfgp, 0)
    pk = np.asarray(pk)
    rel = abs(pk.mean() - q4.mean()) / max(q4.mean(), 1e-9)
    if rel > 0.01:
        failures.append(f"packed-leaf BVH disagrees: {rel*100:.2f}%")
    print(f"leaf packing (alpha=3): {pk.mean():.5f} ({rel*100:.3f}%)")

    cfgr = dataclasses.replace(cfgp, shadow_rr=0.05)
    rr, _ = integrator.render_path_with_counts(scene, view, cfgr, 0)
    rr = np.asarray(rr)
    rel = abs(rr.mean() - q4.mean()) / max(q4.mean(), 1e-9)
    if rel > 0.15:  # single sample; RR adds variance, mean should be close
        failures.append(f"shadow-RR mean drifted: {rel*100:.2f}%")
    print(f"shadow RR (tau=0.05): {rr.mean():.5f} ({rel*100:.3f}%)")

    from stratum_tpu.render import lights as slights

    slights.ENV_SAMPLER = "mip"
    mip_render = jax.jit(
        lambda sc, v, seed: integrator.render_path_with_counts.__wrapped__(
            sc, v, cfgp, seed
        )
    )
    em, _ = mip_render(scene, view, 0)
    slights.ENV_SAMPLER = "dist2d"
    em = np.asarray(em)
    rel = abs(em.mean() - q4.mean()) / max(q4.mean(), 1e-9)
    if rel > 0.05:
        failures.append(f"env mip sampler drifted: {rel*100:.2f}%")
    print(f"env mip sampler: {em.mean():.5f} ({rel*100:.3f}%)")

    # -- 6. lane batching on-device: the sorted waves now interleave spp
    # replicas of every pixel; hits/sampling must be lane-order invariant
    lan, _ = integrator.render_path_lanes(scene, view, cfgp, 2, 0)
    lan = np.asarray(lan)
    s0, _ = integrator.render_path_with_counts(scene, view, cfgp, 0)
    s1, _ = integrator.render_path_with_counts(scene, view, cfgp, 1)
    seq = (np.asarray(s0) + np.asarray(s1)) / 2.0
    rel = abs(lan.mean() - seq.mean()) / max(seq.mean(), 1e-9)
    px_rel = np.abs(lan - seq).mean() / max(seq.mean(), 1e-9)
    if px_rel > 0.005:
        failures.append(f"lane batching disagrees: per-px {px_rel*100:.2f}%")
    print(f"lane batching (2): {lan.mean():.5f} vs {seq.mean():.5f} "
          f"(mean {rel*100:.3f}%, per-px {px_rel*100:.3f}%)")

    if failures:
        print("\nFAIL:")
        for f in failures:
            print(" -", f)
        return 1
    print("\nTPU CHECK OK")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
