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

    accum: jnp.ndarray = None  # [H,W,3] radiance sum
    spp: int = 0
    seed0: int = 0
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
            # whole group in ONE compiled launch (lax.scan over seeds):
            # per-sample dispatch/sync amortizes away; equal to the
            # sequential loop below (tested to ~1 ulp)
            mean, _ = sintegrator.render_path_batched(
                self.scene, self.view, self.cfg, samples,
                self.seed0 + self.spp,
            )
            self.accum = self.accum + mean * samples
            self.spp += samples
            return self.radiance()
        for _ in range(samples):
            seed = self.seed0 + self.spp
            if self.use_restir:
                import dataclasses as _dc

                from stratum_tpu.render import restir as srestir

                self.restir_state, direct = srestir.restir_di_jit(
                    self.scene, self.view, self.cfg, self.restir_state,
                    seed, self.restir_candidates, 20.0,
                    self._restir_prev_view, self.restir_spatial_taps,
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
        return self.radiance()

    def radiance(self):
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
        np.savez(
            path,
            accum=np.asarray(self.accum),
            spp=self.spp,
            seed0=self.seed0,
        )

    def load_checkpoint(self, path):
        data = np.load(path if str(path).endswith(".npz") else str(path) + ".npz")
        self.accum = jnp.asarray(data["accum"])
        self.spp = int(data["spp"])
        self.seed0 = int(data["seed0"])
