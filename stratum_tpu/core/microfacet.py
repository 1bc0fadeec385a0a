"""Microfacet building blocks: Fresnel, GGX/GTR distributions, Smith masking,
and Heitz VNDF sampling.

TPU-native analog of src/Shaders/microfacet.h (reference lines 21-106). All
functions operate in the local shading frame (+z = shading normal) and are
batched over leading axes.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from stratum_tpu.core import math as smath


def schlick_fresnel(f0, cos_theta):
    """Schlick approximation; f0 may be scalar or rgb (broadcasts)."""
    w = smath.pow5(1.0 - jnp.clip(cos_theta, 0.0, 1.0))
    return f0 + (1.0 - f0) * w


def fresnel_dielectric(cos_theta_i, eta):
    """Exact unpolarized dielectric Fresnel with total internal reflection.

    cos_theta_i is the signed cosine against the normal; eta is the relative
    IOR (transmitted / incident side). Returns reflectance in [0, 1].
    """
    ci = jnp.clip(jnp.abs(cos_theta_i), 0.0, 1.0)
    sin2_t = (1.0 - ci * ci) / jnp.maximum(eta * eta, 1e-12)
    tir = sin2_t >= 1.0
    ct = smath.safe_sqrt(1.0 - sin2_t)
    r_s = (ci - eta * ct) / jnp.maximum(ci + eta * ct, 1e-12)
    r_p = (eta * ci - ct) / jnp.maximum(eta * ci + ct, 1e-12)
    f = 0.5 * (r_s * r_s + r_p * r_p)
    return jnp.where(tir, 1.0, jnp.clip(f, 0.0, 1.0))


def ggx_alpha(roughness, anisotropic=0.0):
    """Disney roughness/anisotropy -> (alpha_x, alpha_y), clamped."""
    aspect = jnp.sqrt(1.0 - 0.9 * anisotropic)
    r2 = roughness * roughness
    ax = jnp.maximum(r2 / aspect, 1e-4)
    ay = jnp.maximum(r2 * aspect, 1e-4)
    return ax, ay


def gtr2_ndf(h, ax, ay):
    """Anisotropic GGX/GTR2 normal distribution D(h), h in local frame."""
    hx, hy, hz = h[..., 0], h[..., 1], h[..., 2]
    d = (hx * hx) / (ax * ax) + (hy * hy) / (ay * ay) + hz * hz
    return 1.0 / jnp.maximum(np.pi * ax * ay * d * d, 1e-20)


def smith_lambda(w, ax, ay):
    """Smith Lambda for anisotropic GGX."""
    wx, wy, wz = w[..., 0], w[..., 1], w[..., 2]
    a2 = (wx * ax) ** 2 + (wy * ay) ** 2
    return 0.5 * (jnp.sqrt(1.0 + a2 / jnp.maximum(wz * wz, 1e-12)) - 1.0)


def smith_g1(w, ax, ay):
    return 1.0 / (1.0 + smith_lambda(w, ax, ay))


def smith_g2(wi, wo, ax, ay):
    """Height-correlated-free separable form G1(wi) * G1(wo) (matches the
    reference's independent Smith masking, microfacet.h:67-72)."""
    return smith_g1(wi, ax, ay) * smith_g1(wo, ax, ay)


def sample_vndf(wo, ax, ay, u1, u2):
    """Heitz 2018 visible-NDF sampling (microfacet.h:76-106).

    wo: outgoing direction in local frame with wo.z > 0 (flip before calling
    for transmission). Returns half-vector h in the local frame.
    """
    v = smath.normalize(
        jnp.stack([ax * wo[..., 0], ay * wo[..., 1], wo[..., 2]], axis=-1)
    )
    # orthonormal basis around v
    lensq = v[..., 0] ** 2 + v[..., 1] ** 2
    inv_len = 1.0 / jnp.sqrt(jnp.maximum(lensq, 1e-20))
    t1 = jnp.where(
        (lensq > 1e-12)[..., None],
        jnp.stack([-v[..., 1] * inv_len, v[..., 0] * inv_len, jnp.zeros_like(inv_len)], axis=-1),
        jnp.broadcast_to(jnp.asarray([1.0, 0.0, 0.0], v.dtype), v.shape),
    )
    t2 = jnp.cross(v, t1)
    r = jnp.sqrt(u1)
    phi = smath.TWO_PI * u2
    p1 = r * jnp.cos(phi)
    p2 = r * jnp.sin(phi)
    s = 0.5 * (1.0 + v[..., 2])
    p2 = (1.0 - s) * smath.safe_sqrt(1.0 - p1 * p1) + s * p2
    p3 = smath.safe_sqrt(1.0 - p1 * p1 - p2 * p2)
    nh = p1[..., None] * t1 + p2[..., None] * t2 + p3[..., None] * v
    h = smath.normalize(
        jnp.stack(
            [ax * nh[..., 0], ay * nh[..., 1], jnp.maximum(nh[..., 2], 0.0)],
            axis=-1,
        )
    )
    return h


def vndf_pdf(wo, h, ax, ay):
    """pdf of sample_vndf in half-vector measure: G1(wo) D(h) max(0, wo·h) / wo.z."""
    d = gtr2_ndf(h, ax, ay)
    g1 = smith_g1(wo, ax, ay)
    return smath.safe_div(
        g1 * d * jnp.maximum(smath.dot(wo, h), 0.0), jnp.abs(wo[..., 2])
    )


# --- GTR1 (clearcoat, Disney) ---------------------------------------------

def gtr1_ndf(hz, alpha):
    a2 = alpha * alpha
    denom = np.pi * jnp.log(jnp.maximum(a2, 1e-12)) * (1.0 + (a2 - 1.0) * hz * hz)
    return smath.safe_div(a2 - 1.0, denom)


def sample_gtr1(alpha, u1, u2):
    """Analytic inverse-CDF sample of GTR1 (disney_clearcoat.hlsli:28-40)."""
    a2 = alpha * alpha
    cos2 = (1.0 - jnp.power(a2, 1.0 - u1)) / jnp.maximum(1.0 - a2, 1e-12)
    cos_t = smath.safe_sqrt(cos2)
    sin_t = smath.safe_sqrt(1.0 - cos2)
    phi = smath.TWO_PI * u2
    return jnp.stack([sin_t * jnp.cos(phi), sin_t * jnp.sin(phi), cos_t], axis=-1)


def reflect(w, n):
    """Mirror w about n (both pointing away from surface convention:
    returns 2(w·n)n - w)."""
    return 2.0 * smath.dotk(w, n) * n - w


def refract(w, n, eta):
    """Refract direction w (pointing away from surface, same side as n)
    with relative IOR eta. Returns (wt, valid)."""
    eta = jnp.asarray(eta, dtype=w.dtype)
    cos_i = smath.dot(w, n)
    sin2_t = (1.0 - cos_i * cos_i) / jnp.maximum(eta * eta, 1e-20)
    valid = sin2_t < 1.0
    cos_t = smath.safe_sqrt(1.0 - sin2_t)
    wt = -w / eta[..., None] + (cos_i / eta - cos_t)[..., None] * n
    return smath.normalize(wt), valid
