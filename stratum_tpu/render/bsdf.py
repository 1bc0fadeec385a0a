"""BSDF interface: eval / sample / pdf over batched local-frame directions.

TPU-native analog of the reference's BSDF slang interface
(src/Shaders/materials/bsdf.hlsli:10-37): ``eval`` returns (f, pdf_fwd,
pdf_rev), ``sample`` returns (direction, f, pdfs, eta, roughness). Directions
live in the local shading frame (+z = shading normal). The dispatch constant
``Material`` in the reference (#define Material DisneyMaterial) maps to the
module-level selection here: the Disney BSDF (render/disney.py) is the
default; the Lambertian variant doubles as the reference's FORCE_LAMBERTIAN
debug path (disney_material.hlsli:84-123).

All functions are shape-polymorphic over leading axes and jit-safe: no
data-dependent branching, only ``where`` masks — one dense wavefront
evaluates every lobe and blends, which is exactly what the VPU wants.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from stratum_tpu.core import math as smath
from stratum_tpu.render.shading import MaterialSample


class BSDFEval(NamedTuple):
    """reference: MaterialEvalRecord (bsdf.hlsli:20-24)."""

    f: jnp.ndarray  # [N,3] BSDF value * |cos_theta_i| NOT included
    pdf_fwd: jnp.ndarray  # [N] solid-angle pdf of sampling wi from wo
    pdf_rev: jnp.ndarray  # [N] reverse pdf (for bidirectional MIS)


class BSDFSample(NamedTuple):
    """reference: MaterialSampleRecord (bsdf.hlsli:26-32)."""

    wi: jnp.ndarray  # [N,3] sampled direction, local frame
    f: jnp.ndarray  # [N,3] BSDF value at wi
    pdf_fwd: jnp.ndarray  # [N]
    pdf_rev: jnp.ndarray  # [N]
    eta: jnp.ndarray  # [N] relative IOR on transmission, 0 on reflection
    roughness: jnp.ndarray  # [N] for ray-cone / RR heuristics


# ---------------------------------------------------------------------------
# Lambertian (the FORCE_LAMBERTIAN debug variant + M1 shading model)
# ---------------------------------------------------------------------------

def lambert_eval(mat: MaterialSample, wo, wi) -> BSDFEval:
    same_side = (wo[..., 2] > 0) & (wi[..., 2] > 0)
    f = jnp.where(
        same_side[..., None], mat.base_color * smath.INV_PI, 0.0
    )
    pdf = jnp.where(same_side, smath.cosine_hemisphere_pdfW(wi[..., 2]), 0.0)
    pdf_rev = jnp.where(same_side, smath.cosine_hemisphere_pdfW(wo[..., 2]), 0.0)
    return BSDFEval(f=f, pdf_fwd=pdf, pdf_rev=pdf_rev)


def lambert_sample(mat: MaterialSample, wo, u) -> BSDFSample:
    wi = smath.sample_cos_hemisphere(u[..., 0], u[..., 1])
    # flip into wo's hemisphere so two-sided surfaces reflect properly
    wi = wi * jnp.sign(wo[..., 2:3])
    ev = lambert_eval(mat, wo * jnp.sign(wo[..., 2:3]), wi * jnp.sign(wo[..., 2:3]))
    return BSDFSample(
        wi=wi,
        f=ev.f,
        pdf_fwd=ev.pdf_fwd,
        pdf_rev=ev.pdf_rev,
        eta=jnp.zeros(wo.shape[:-1], jnp.float32),
        roughness=jnp.ones(wo.shape[:-1], jnp.float32),
    )
