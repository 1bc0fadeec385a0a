"""Disney principled BSDF: diffuse + metal + glass + clearcoat mixture.

TPU-native analog of the reference's material stack
(src/Shaders/materials/disney_material.hlsli lobe mixture at 141-315 with the
per-lobe files disney_diffuse/metal/glass/clearcoat.hlsli). Written for dense
wavefronts: every lobe is evaluated for every lane and blended with lobe
weights — no divergent branching; sampling selects a lobe per lane but the
returned f/pdf always come from the full mixture, which keeps MIS unbiased.

Conventions:
- local shading frame, wo.z > 0 (the integrator orients the frame toward the
  incoming ray); wi.z < 0 means transmission (glass lobe only);
- ``mat.eta`` is the RELATIVE ior of the transmitted side (the integrator
  passes eta when entering, 1/eta when exiting — the reference tracks the
  same via front-face flips, disney_glass.hlsli:10-27);
- returned f never includes |cos_theta_i|.

Lobe weights (disney_material.hlsli:141-200):
  diffuse   (1-metallic)(1-transmission)
  metal     metallic
  glass     (1-metallic)*transmission
  clearcoat 0.25*clearcoat   (weight folded into its f)
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from stratum_tpu.core import math as smath
from stratum_tpu.core import microfacet as mf
from stratum_tpu.render.bsdf import BSDFEval, BSDFSample
from stratum_tpu.render.shading import MaterialSample

_MIN_P = 1e-7


def _lobe_weights(mat: MaterialSample):
    w_diffuse = (1.0 - mat.metallic) * (1.0 - mat.transmission)
    w_metal = mat.metallic
    w_glass = (1.0 - mat.metallic) * mat.transmission
    w_clear = 0.25 * mat.clearcoat
    total = jnp.maximum(w_diffuse + w_metal + w_glass + w_clear, 1e-12)
    return (
        w_diffuse,
        w_metal,
        w_glass,
        w_clear,
        w_diffuse / total,
        w_metal / total,
        w_glass / total,
        w_clear / total,
    )


def _cc_alpha(mat):
    return smath.lerp(0.1, 0.001, mat.clearcoat_gloss)


# ---------------------------------------------------------------------------
# per-lobe eval (f excludes cos_in; pdf in solid angle)
# ---------------------------------------------------------------------------

def _diffuse_eval(mat, wo, wi, h):
    """Burley diffuse + subsurface lerp (disney_diffuse.hlsli:1-17)."""
    ci = jnp.abs(wi[..., 2])
    co = jnp.abs(wo[..., 2])
    hdotwi = smath.dot(h, wi)
    fd90 = 0.5 + 2.0 * mat.roughness * hdotwi * hdotwi
    fin = 1.0 + (fd90 - 1.0) * smath.pow5(1.0 - ci)
    fout = 1.0 + (fd90 - 1.0) * smath.pow5(1.0 - co)
    fd = fin * fout
    fss90 = mat.roughness * hdotwi * hdotwi
    fss_in = 1.0 + (fss90 - 1.0) * smath.pow5(1.0 - ci)
    fss_out = 1.0 + (fss90 - 1.0) * smath.pow5(1.0 - co)
    ss = 1.25 * (
        fss_in * fss_out * (smath.safe_div(1.0, ci + co) - 0.5) + 0.5
    )
    refl = (wi[..., 2] > 0) & (wo[..., 2] > 0)
    val = smath.lerp(fd, ss, mat.subsurface)
    f = mat.base_color * (smath.INV_PI * val)[..., None]
    f = jnp.where(refl[..., None], f, 0.0)
    pdf = jnp.where(refl, smath.cosine_hemisphere_pdfW(wi[..., 2]), 0.0)
    pdf_rev = jnp.where(refl, smath.cosine_hemisphere_pdfW(wo[..., 2]), 0.0)
    return f, pdf, pdf_rev


def _metal_eval(mat, wo, wi, h, ax, ay):
    """GGX metal with Schlick base-color fresnel (disney_metal.hlsli:1-26)."""
    refl = (wi[..., 2] > 0) & (wo[..., 2] > 0)
    F = mf.schlick_fresnel(mat.base_color, smath.dot(h, wi)[..., None])
    D = mf.gtr2_ndf(h, ax, ay)
    G = mf.smith_g1(wi, ax, ay) * mf.smith_g1(wo, ax, ay)
    denom = 4.0 * jnp.abs(wi[..., 2]) * jnp.abs(wo[..., 2])
    f = F * smath.safe_div(D * G, denom)[..., None]
    f = jnp.where(refl[..., None], f, 0.0)
    pdf = jnp.where(
        refl,
        smath.safe_div(
            mf.vndf_pdf(wo, h, ax, ay), 4.0 * jnp.abs(smath.dot(wo, h))
        ),
        0.0,
    )
    pdf_rev = jnp.where(
        refl,
        smath.safe_div(
            mf.vndf_pdf(wi, h, ax, ay), 4.0 * jnp.abs(smath.dot(wi, h))
        ),
        0.0,
    )
    return f, pdf, pdf_rev


def _glass_eval(mat, wo, wi, ax, ay):
    """Rough dielectric reflect/refract (disney_glass.hlsli:10-27).

    Refraction half-vector: h ~ normalize(wo + eta*wi) oriented to +z; the
    1/eta^2 radiance-compression factor is included (camera paths; the
    adjoint drops it — reference applies the adjoint factor separately,
    path.hlsli:67-98)."""
    eta = mat.eta
    is_refl = wi[..., 2] > 0
    # reflection half vector
    h_r = smath.normalize(wi + wo)
    # refraction half vector (generalized)
    h_t = smath.normalize(wo + wi * eta[..., None])
    h = jnp.where(is_refl[..., None], h_r, h_t)
    h = h * jnp.sign(h[..., 2:3])  # orient to +z
    hdwo = smath.dot(h, wo)
    hdwi = smath.dot(h, wi)
    F = mf.fresnel_dielectric(hdwo, eta)
    D = mf.gtr2_ndf(h, ax, ay)
    G = mf.smith_g1(wi, ax, ay) * mf.smith_g1(wo, ax, ay)
    ci = jnp.abs(wi[..., 2])
    co = jnp.abs(wo[..., 2])
    # reflection branch
    f_refl = mat.base_color * smath.safe_div(F * D * G, 4.0 * ci * co)[..., None]
    pdf_refl = smath.safe_div(
        mf.vndf_pdf(wo, h, ax, ay), 4.0 * jnp.abs(hdwo)
    ) * F
    pdf_refl_rev = smath.safe_div(
        mf.vndf_pdf(wi, h, ax, ay), 4.0 * jnp.abs(hdwi)
    ) * mf.fresnel_dielectric(jnp.abs(hdwi), 1.0 / eta)
    # refraction branch. Walter 2007 eq. 21 gives eta^2 * |hdwi hdwo| D G
    # (1-F) / (ci co denom^2); the radiance-transport (camera-path) solid-
    # angle compression contributes 1/eta^2 which cancels it exactly (PBRT
    # TransportMode::Radiance convention; the reference handles the adjoint
    # side via its shading-normal adjoint factor, path.hlsli:67-98).
    denom_t = hdwo + eta * hdwi
    f_trans = jnp.sqrt(jnp.maximum(mat.base_color, 0.0)) * smath.safe_div(
        (1.0 - F) * D * G * jnp.abs(hdwi * hdwo),
        ci * co * denom_t * denom_t,
    )[..., None]
    pdf_trans = smath.safe_div(
        mf.vndf_pdf(wo, h, ax, ay) * jnp.abs(hdwi) * eta * eta,
        denom_t * denom_t,
    ) * (1.0 - F)
    # reverse refraction pdf: swap roles (eta inverts)
    inv_eta = 1.0 / jnp.maximum(eta, 1e-12)
    denom_rev = hdwi + inv_eta * hdwo
    F_rev = mf.fresnel_dielectric(jnp.abs(hdwi), inv_eta)
    pdf_trans_rev = smath.safe_div(
        mf.vndf_pdf(jnp.abs(wi), h, ax, ay) * jnp.abs(hdwo) * inv_eta * inv_eta,
        denom_rev * denom_rev,
    ) * (1.0 - F_rev)
    f = jnp.where(is_refl[..., None], f_refl, f_trans)
    pdf = jnp.where(is_refl, pdf_refl, pdf_trans)
    pdf_rev = jnp.where(is_refl, pdf_refl_rev, pdf_trans_rev)
    valid = jnp.abs(denom_t) > 1e-9
    return (
        jnp.where(valid[..., None], f, 0.0),
        jnp.where(valid, pdf, 0.0),
        jnp.where(valid, pdf_rev, 0.0),
    )


def _clearcoat_eval(mat, wo, wi, h):
    """GTR1 clearcoat with fixed 0.04 fresnel and 0.25 Smith alpha
    (disney_clearcoat.hlsli)."""
    refl = (wi[..., 2] > 0) & (wo[..., 2] > 0)
    alpha = _cc_alpha(mat)
    D = mf.gtr1_ndf(h[..., 2], alpha)
    F = mf.schlick_fresnel(0.04, smath.dot(h, wi))
    G = mf.smith_g1(wi, 0.25, 0.25) * mf.smith_g1(wo, 0.25, 0.25)
    denom = 4.0 * jnp.abs(wi[..., 2]) * jnp.abs(wo[..., 2])
    fval = smath.safe_div(F * D * G, denom)
    f = jnp.where(refl[..., None], fval[..., None] * jnp.ones(3), 0.0)
    pdf = jnp.where(
        refl,
        smath.safe_div(
            D * jnp.abs(h[..., 2]), 4.0 * jnp.abs(smath.dot(h, wi))
        ),
        0.0,
    )
    return f, pdf, pdf  # symmetric pdf


# ---------------------------------------------------------------------------
# combined interface
# ---------------------------------------------------------------------------

def disney_eval(mat: MaterialSample, wo, wi) -> BSDFEval:
    """Full-mixture eval (disney_material.hlsli:141-200)."""
    ax, ay = mf.ggx_alpha(mat.roughness, mat.anisotropic)
    h_refl = smath.normalize(wi + wo)
    h_refl = h_refl * jnp.sign(h_refl[..., 2:3])
    wd, wm, wg, wc, pd, pm, pg, pc = _lobe_weights(mat)
    f_d, pdf_d, rev_d = _diffuse_eval(mat, wo, wi, h_refl)
    f_m, pdf_m, rev_m = _metal_eval(mat, wo, wi, h_refl, ax, ay)
    f_g, pdf_g, rev_g = _glass_eval(mat, wo, wi, ax, ay)
    f_c, pdf_c, rev_c = _clearcoat_eval(mat, wo, wi, h_refl)
    f = (
        wd[..., None] * f_d
        + wm[..., None] * f_m
        + wg[..., None] * f_g
        + wc[..., None] * f_c
    )
    pdf = pd * pdf_d + pm * pdf_m + pg * pdf_g + pc * pdf_c
    pdf_rev = pd * rev_d + pm * rev_m + pg * rev_g + pc * rev_c
    return BSDFEval(f=f, pdf_fwd=pdf, pdf_rev=pdf_rev)


def disney_sample(mat: MaterialSample, wo, u) -> BSDFSample:
    """Sample the mixture: pick a lobe by weight with u[...,2], generate wi
    with u[...,0:2], then evaluate the FULL mixture at wi
    (disney_material.hlsli:201-315)."""
    ax, ay = mf.ggx_alpha(mat.roughness, mat.anisotropic)
    _, _, _, _, pd, pm, pg, pc = _lobe_weights(mat)
    u1, u2, usel = u[..., 0], u[..., 1], u[..., 2]

    # candidate directions from each strategy
    wi_diffuse = smath.sample_cos_hemisphere(u1, u2)
    h_vndf = mf.sample_vndf(wo, ax, ay, u1, u2)
    wi_metal = mf.reflect(wo, h_vndf)
    # glass: reflect or refract about the VNDF half-vector by fresnel
    eta = mat.eta
    hdwo = smath.dot(h_vndf, wo)
    F = mf.fresnel_dielectric(hdwo, eta)
    wt, can_refract = mf.refract(wo, h_vndf, eta)
    # rescale usel within the glass branch to decide reflect vs refract
    u_glass = jnp.clip(
        smath.safe_div(usel - (pd + pm), jnp.maximum(pg, 1e-12)), 0.0, 1.0
    )
    glass_reflects = (u_glass < F) | ~can_refract
    wi_glass = jnp.where(glass_reflects[..., None], wi_metal, wt)
    h_cc = mf.sample_gtr1(_cc_alpha(mat), u1, u2)
    wi_clear = mf.reflect(wo, h_cc)

    c_d = pd
    c_m = pd + pm
    c_g = pd + pm + pg
    wi = jnp.where(
        (usel < c_d)[..., None],
        wi_diffuse,
        jnp.where(
            (usel < c_m)[..., None],
            wi_metal,
            jnp.where((usel < c_g)[..., None], wi_glass, wi_clear),
        ),
    )
    wi = smath.normalize(wi)
    ev = disney_eval(mat, wo, wi)
    took_trans = (usel >= c_m) & (usel < c_g) & ~glass_reflects
    return BSDFSample(
        wi=wi,
        f=ev.f,
        pdf_fwd=ev.pdf_fwd,
        pdf_rev=ev.pdf_rev,
        eta=jnp.where(took_trans, eta, 0.0),
        roughness=mat.roughness,
    )
