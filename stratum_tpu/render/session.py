"""RenderSession: the frame-loop state machine.

TPU-native analog of the reference's Application frame loop + renderer state
(src/Node/Application.cpp:7-88 run loop; BDPT per-frame resources
BDPT.cpp:344-380; Denoiser accumulation reset on camera move,
Denoiser.cpp:176-177). Offline-first: ``step()`` advances one progressive
sample (or batch), optional SVGF denoising rides the current G-buffer, and
the whole session state is a pytree — so checkpoint/resume of a progressive
render is exact (accumulation buffer + RNG seed counter; SURVEY.md §5
checkpoint strategy), something the reference cannot do at all.
"""

from __future__ import annotations

import dataclasses
from pathlib import Path

import jax.numpy as jnp
import numpy as np

from stratum_tpu.render import aov as saov
from stratum_tpu.render import denoise as sdenoise
from stratum_tpu.render import integrator as sintegrator
from stratum_tpu.render import tonemap as stonemap


@dataclasses.dataclass
class RenderSession:
    scene: object
    view: object
    cfg: sintegrator.RenderConfig
    denoise: bool = False
    denoise_cfg: sdenoise.DenoiseConfig = dataclasses.field(
        default_factory=sdenoise.DenoiseConfig
    )
    mesh: object = None  # optional jax.sharding.Mesh for multi-chip
    use_restir: bool = False  # ReSTIR DI + indirect-only PT composition
    restir_candidates: int = 4
    restir_spatial_taps: int = 0
    restir_hash_jitter: bool = False  # tangent-plane cell jitter on the
                                      # spatial-tap lookups (reference
                                      # eHashGridJitter, path.hlsli:405-439)
    # >1: step(n) traces groups of this many samples as extra wavefront
    # lanes (integrator.render_path_lanes) — coherence + amortization;
    # memory scales with the value (2-4 practical at 1080p)
    spp_lanes: int = 0

    accum: jnp.ndarray = None  # [H,W,3] radiance sum
    spp: int = 0
    seed0: int = 0
    # adaptive-sampling state (step_adaptive): per-pixel sample counts and
    # luminance^2 sums; None until the first adaptive round
    sample_count: jnp.ndarray = None  # f32 [H*W]
    _accum_sq: jnp.ndarray = None  # f32 [H*W]
    _seeds_used: int = 0  # RNG seeds consumed (uniform samples + rounds)
    prev_view: object = None
    denoise_state: sdenoise.DenoiseState = None
    restir_state: object = None  # restir.RestirState reservoir carrier
    _gbuffer: saov.GBuffer = None
    _restir_prev_view: object = None  # view the reservoirs were shaded with

    def __post_init__(self):
        h, w = self.cfg.height, self.cfg.width
        if self.accum is None:
            self.accum = jnp.zeros((h, w, 3), jnp.float32)
        if self.prev_view is None:
            self.prev_view = self.view
        if self.denoise_state is None:
            self.denoise_state = sdenoise.init_state(h, w)
        if self.use_restir and self.restir_state is None:
            from stratum_tpu.render import restir as srestir

            self.restir_state = srestir.init_restir(h * w)

    # -- camera / scene changes -------------------------------------------
    def set_view(self, view):
        """Move the camera: restart accumulation, keep denoiser history for
        reprojection (reference: accumulation reset on camera move,
        Denoiser.cpp:176-177). ReSTIR reservoirs survive the move — the next
        frame reprojects them through the previous view."""
        self.prev_view = self.view
        self.view = view
        self.accum = jnp.zeros_like(self.accum)
        self.spp = 0
        self._gbuffer = None
        if self.use_restir:
            self._restir_prev_view = self.prev_view

    def reset(self):
        """Full reset (reference: F5 behavior)."""
        self.accum = jnp.zeros_like(self.accum)
        self.spp = 0
        self.denoise_state = sdenoise.init_state(
            self.cfg.height, self.cfg.width
        )
        self._gbuffer = None
        if self.use_restir:
            from stratum_tpu.render import restir as srestir

            self.restir_state = srestir.init_restir(
                self.cfg.height * self.cfg.width
            )
            self._restir_prev_view = None

    # -- stepping ----------------------------------------------------------
    def gbuffer(self) -> saov.GBuffer:
        if self._gbuffer is None:
            if self.mesh is not None:
                from stratum_tpu.parallel import mesh as pmesh

                self._gbuffer = pmesh.render_gbuffer_sharded(
                    self.scene, self.view, self.prev_view, self.cfg,
                    self.mesh,
                )
            else:
                self._gbuffer = saov.render_gbuffer(
                    self.scene, self.view, self.prev_view, self.cfg
                )
        return self._gbuffer

    def step(self, samples: int = 1):
        """Advance ``samples`` progressive samples; returns the current
        (accumulated, not tonemapped) radiance estimate. With ``use_restir``
        each sample is ReSTIR DI (reservoirs persist across samples AND
        camera moves via reprojection) + an indirect-only PT sample."""
        if samples > 1 and not self.use_restir and self.mesh is None:
            # whole group in ONE compiled launch: lane batching when
            # spp_lanes > 1 (sample axis on the wavefront lanes), else a
            # lax.scan over seeds; per-sample dispatch/sync amortizes away
            # and both equal the sequential loop below (tested to ~1 ulp /
            # exactly on the dense path)
            done = 0
            while done < samples:
                if self.spp_lanes > 1:
                    b = min(self.spp_lanes, samples - done)
                    mean, _ = sintegrator.render_path_lanes(
                        self.scene, self.view, self.cfg, b,
                        self.seed0 + self._seeds_used + done,
                    )
                else:
                    b = samples - done
                    mean, _ = sintegrator.render_path_batched(
                        self.scene, self.view, self.cfg, b,
                        self.seed0 + self._seeds_used + done,
                    )
                self.accum = self.accum + mean * b
                done += b
            self.spp += samples
            self._seeds_used += samples
            if self.sample_count is not None:
                self.sample_count = self.sample_count + float(samples)
            return self.radiance()
        for _ in range(samples):
            seed = self.seed0 + self._seeds_used
            if self.use_restir:
                import dataclasses as _dc

                from stratum_tpu.render import restir as srestir

                self.restir_state, direct = srestir.restir_di_jit(
                    self.scene, self.view, self.cfg, self.restir_state,
                    seed, self.restir_candidates, 20.0,
                    self._restir_prev_view, self.restir_spatial_taps,
                    self.restir_hash_jitter,
                )
                self._restir_prev_view = None  # consumed: state now current
                icfg = _dc.replace(self.cfg, indirect_only=True)
                img = direct + sintegrator.render_path(
                    self.scene, self.view, icfg, seed
                )
            elif self.mesh is not None:
                from stratum_tpu.parallel import mesh as pmesh

                img = pmesh._render_sharded_jit(
                    self.scene, self.view, self.cfg, seed, self.mesh,
                )
            else:
                img = sintegrator.render_path(
                    self.scene, self.view, self.cfg, seed
                )
            self.accum = self.accum + img
            self.spp += 1
            self._seeds_used += 1
            if self.sample_count is not None:
                self.sample_count = self.sample_count + 1.0
        return self.radiance()

    def step_adaptive(self, rounds: int = 1, frac: float = 0.25):
        """Advance ``rounds`` variance-guided adaptive rounds: each round
        traces ONE fresh sample for the top-``frac`` pixels by smoothed
        marginal variance (render/adaptive.py). Requires at least one
        uniform ``step()`` first (the pilot); per-pixel counts weight the
        estimate, so uniform and adaptive samples mix unbiasedly."""
        if self.spp < 1:
            raise RuntimeError("step_adaptive needs a uniform pilot: "
                               "call step(n) first")
        from stratum_tpu.render import adaptive as sadaptive

        h, w = self.cfg.height, self.cfg.width
        n = h * w
        if self.use_restir or self.mesh is not None:
            raise RuntimeError(
                "step_adaptive: unsupported with ReSTIR or a device mesh"
            )
        if self.sample_count is None:
            # adopt the uniform history as the adaptive pilot; the squares
            # of those samples weren't tracked, so seed the variance with a
            # 3x3 neighborhood proxy of the mean image (allocation input
            # only — per-pixel means stay exact regardless)
            from stratum_tpu.core import math as smath

            cnt = float(self.spp)
            self.sample_count = jnp.full((n,), cnt, jnp.float32)
            mean_img = smath.luminance(self.accum) / cnt  # [H,W]
            pad = jnp.pad(mean_img, 1, mode="edge")
            taps = jnp.stack([
                pad[dy:dy + h, dx:dx + w]
                for dy in range(3) for dx in range(3)
            ])
            local_var = taps.var(axis=0) * cnt  # per-sample variance proxy
            self._accum_sq = (
                cnt * (local_var + mean_img * mean_img)
            ).reshape(n)
        L = max(int(round(n * frac)), 1)
        accum = self.accum.reshape(n, 3)
        for _ in range(rounds):
            from stratum_tpu.core import rng as srng

            accum, self._accum_sq, self.sample_count = (
                sadaptive._adaptive_round(
                    self.scene, self.view, self.cfg, accum,
                    self._accum_sq, self.sample_count, L,
                    self.seed0 + self._seeds_used, srng.QMC,
                )
            )
            self._seeds_used += 1
        self.accum = accum.reshape(h, w, 3)
        self.spp = float(jnp.mean(self.sample_count))
        return self.radiance()

    def radiance(self):
        if self.sample_count is not None:
            h, w = self.cfg.height, self.cfg.width
            cnt = jnp.maximum(self.sample_count, 1.0).reshape(h, w, 1)
            return self.accum / cnt
        return self.accum / max(self.spp, 1)

    def frame(self):
        """One interactive-style frame: a progressive sample plus (optional)
        SVGF. Returns the displayable radiance."""
        img = self.step(1)
        if self.denoise:
            if self.mesh is not None:
                from stratum_tpu.parallel import mesh as pmesh

                self.denoise_state, img = pmesh.denoise_sharded(
                    self.denoise_state, self.radiance(), self.gbuffer(),
                    self.denoise_cfg, self.mesh,
                )
            else:
                self.denoise_state, img = sdenoise.denoise(
                    self.denoise_state, self.radiance(), self.gbuffer(),
                    self.denoise_cfg,
                )
        return img

    def tonemapped(self, mode=stonemap.TonemapMode.ACES, exposure=0.0):
        return stonemap.tonemap(self.radiance(), mode, exposure)

    # -- checkpoint / resume (SURVEY.md §5) --------------------------------
    def save_checkpoint(self, path):
        extra = {}
        if self.sample_count is not None:
            extra["sample_count"] = np.asarray(self.sample_count)
            extra["accum_sq"] = np.asarray(self._accum_sq)
        np.savez(
            path,
            accum=np.asarray(self.accum),
            spp=self.spp,
            seed0=self.seed0,
            seeds_used=self._seeds_used,
            **extra,
        )

    def load_checkpoint(self, path):
        data = np.load(path if str(path).endswith(".npz") else str(path) + ".npz")
        self.accum = jnp.asarray(data["accum"])
        self.spp = float(data["spp"])
        if self.spp == int(self.spp):
            self.spp = int(self.spp)
        self.seed0 = int(data["seed0"])
        self._seeds_used = (
            int(data["seeds_used"]) if "seeds_used" in data else int(self.spp)
        )
        if "sample_count" in data:
            self.sample_count = jnp.asarray(data["sample_count"])
            self._accum_sq = jnp.asarray(data["accum_sq"])
