"""Core rendering math as pure jnp functions.

This module is the TPU-native analog of the dual-compiled C++/HLSL math header
(reference: src/Shaders/common.h) — one source of truth shared by host-side
scene building and device kernels. Everything is shape-polymorphic: functions
accept arrays whose last axis is the vector axis (e.g. ``[..., 3]``), so the
same code runs scalar on host and batched over ray wavefronts under jit/vmap.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

INV_PI = 1.0 / np.pi
TWO_PI = 2.0 * np.pi
INV_2PI = 1.0 / (2.0 * np.pi)
INV_4PI = 1.0 / (4.0 * np.pi)
POS_INFINITY = np.float32(np.inf)
EPS = np.float32(1e-7)


# ---------------------------------------------------------------------------
# small vector helpers
# ---------------------------------------------------------------------------

def dot(a, b):
    """Batched dot product over the last axis, keepdims=False."""
    return jnp.sum(a * b, axis=-1)


def dotk(a, b):
    """Batched dot product over the last axis, keepdims=True."""
    return jnp.sum(a * b, axis=-1, keepdims=True)


def cross(a, b):
    return jnp.cross(a, b)


def length(v):
    return jnp.sqrt(jnp.sum(v * v, axis=-1))


def length_squared(v):
    return jnp.sum(v * v, axis=-1)


def normalize(v, eps: float = 1e-20):
    """Safe normalize; zero vectors map to zero."""
    d = jnp.sum(v * v, axis=-1, keepdims=True)
    return v * jax_rsqrt(jnp.maximum(d, eps))


def jax_rsqrt(x):
    import jax.lax as lax

    return lax.rsqrt(x)


def safe_sqrt(x):
    return jnp.sqrt(jnp.maximum(x, 0.0))


def safe_div(a, b, eps: float = 1e-20):
    """a/b with 0 where |b| is tiny; keeps gradients and estimators finite."""
    return jnp.where(jnp.abs(b) > eps, a / jnp.where(jnp.abs(b) > eps, b, 1.0), 0.0)


def average(x):
    return jnp.mean(x, axis=-1)


def max3(v):
    return jnp.max(v, axis=-1)


def min3(v):
    return jnp.min(v, axis=-1)


def lerp(a, b, t):
    return a + (b - a) * t


def saturate(x):
    return jnp.clip(x, 0.0, 1.0)


def pow2(x):
    return x * x


def pow5(x):
    x2 = x * x
    return x2 * x2 * x


# ---------------------------------------------------------------------------
# color (reference: src/Shaders/common.h:68-113)
# ---------------------------------------------------------------------------

def luminance(rgb):
    """Rec.709 luminance of linear RGB, last axis = 3."""
    w = jnp.asarray([0.2126, 0.7152, 0.0722], dtype=rgb.dtype)
    return jnp.sum(rgb * w, axis=-1)


def srgb_to_linear(c):
    c = jnp.asarray(c)
    return jnp.where(c <= 0.04045, c / 12.92, ((c + 0.055) / 1.055) ** 2.4)


def linear_to_srgb(c):
    c = jnp.asarray(c)
    c = jnp.maximum(c, 0.0)
    return jnp.where(c <= 0.0031308, c * 12.92, 1.055 * (c ** (1.0 / 2.4)) - 0.055)


def viridis(t):
    """Viridis-like quintic fit colormap, t in [0,1] -> rgb.

    Polynomial fit (public domain, matplotlib-derived coefficients commonly
    used in shader code; reference uses an equivalent fit at common.h:115).
    """
    t = saturate(jnp.asarray(t))[..., None]
    c0 = jnp.asarray([0.2777273272234177, 0.005407344544966578, 0.3340998053353061])
    c1 = jnp.asarray([0.1050930431085774, 1.404613529898575, 1.384590162594685])
    c2 = jnp.asarray([-0.3308618287255563, 0.214847559468213, 0.09509516302823659])
    c3 = jnp.asarray([-4.634230498983486, -5.799100973351585, -19.33244095627987])
    c4 = jnp.asarray([6.228269936347081, 14.17993336680509, 56.69055260068105])
    c5 = jnp.asarray([4.776384997670288, -13.74514537774601, -65.35303263337234])
    c6 = jnp.asarray([-5.435455855934631, 4.645852612178535, 26.3124352495832])
    return c0 + t * (c1 + t * (c2 + t * (c3 + t * (c4 + t * (c5 + t * c6)))))


# ---------------------------------------------------------------------------
# frames and sphere mappings (reference: src/Shaders/common.h:125-161)
# ---------------------------------------------------------------------------

def make_orthonormal(n):
    """Build tangent/bitangent for unit normal n (Duff et al. 2017 branchless).

    Returns (t, b) with [n, t, b] orthonormal. Shape-polymorphic over leading
    axes; n has last axis 3.
    """
    nz = n[..., 2]
    sign = jnp.where(nz >= 0.0, 1.0, -1.0)
    a = -1.0 / (sign + nz)
    b = n[..., 0] * n[..., 1] * a
    t = jnp.stack(
        [1.0 + sign * n[..., 0] * n[..., 0] * a, sign * b, -sign * n[..., 0]],
        axis=-1,
    )
    bt = jnp.stack([b, sign + n[..., 1] * n[..., 1] * a, -n[..., 1]], axis=-1)
    return t, bt


def to_local(v, n):
    """World vector -> tangent frame of unit normal n (z = n)."""
    t, b = make_orthonormal(n)
    return jnp.stack([dot(v, t), dot(v, b), dot(v, n)], axis=-1)


def to_world(v, n):
    """Tangent-frame vector (z = n) -> world."""
    t, b = make_orthonormal(n)
    return v[..., 0:1] * t + v[..., 1:2] * b + v[..., 2:3] * n


def cartesian_to_spherical_uv(v):
    """Unit direction -> equirect uv in [0,1]^2 (reference common.h:138-141).

    u wraps azimuth (atan2(z, x)), v is polar angle from +y.
    """
    theta = jnp.arctan2(v[..., 2], v[..., 0])
    u = theta * INV_PI * 0.5 + 0.5
    vv = jnp.arccos(jnp.clip(v[..., 1], -1.0, 1.0)) * INV_PI
    return jnp.stack([u, vv], axis=-1)


def spherical_uv_to_cartesian(uv):
    """Inverse of :func:`cartesian_to_spherical_uv`."""
    phi = (uv[..., 0] * 2.0 - 1.0) * np.pi
    theta = uv[..., 1] * np.pi
    sin_t = jnp.sin(theta)
    return jnp.stack(
        [sin_t * jnp.cos(phi), jnp.cos(theta), sin_t * jnp.sin(phi)], axis=-1
    )


# ---------------------------------------------------------------------------
# sampling (reference: src/Shaders/common.h:150-161)
# ---------------------------------------------------------------------------

def sample_uniform_sphere(u1, u2):
    """Two uniforms -> unit direction uniformly on the sphere."""
    phi = TWO_PI * u2
    cos_theta = 2.0 * u1 - 1.0
    sin_theta = safe_sqrt(1.0 - cos_theta * cos_theta)
    return jnp.stack(
        [sin_theta * jnp.cos(phi), cos_theta, sin_theta * jnp.sin(phi)], axis=-1
    )


def uniform_sphere_pdfW():
    return INV_4PI


def sample_cos_hemisphere(u1, u2):
    """Two uniforms -> cosine-weighted direction in local frame (+z up)."""
    phi = TWO_PI * u2
    r = jnp.sqrt(u1)
    x = r * jnp.cos(phi)
    y = r * jnp.sin(phi)
    z = safe_sqrt(1.0 - u1)
    return jnp.stack([x, y, z], axis=-1)


def cosine_hemisphere_pdfW(cos_theta):
    return jnp.maximum(cos_theta, 0.0) * INV_PI


def sample_uniform_triangle(u1, u2):
    """Two uniforms -> barycentric (b1, b2) uniform over a triangle."""
    su1 = jnp.sqrt(u1)
    return (1.0 - su1), (u2 * su1)


def sample_uniform_disk(u1, u2):
    r = jnp.sqrt(u1)
    phi = TWO_PI * u2
    return jnp.stack([r * jnp.cos(phi), r * jnp.sin(phi)], axis=-1)


# ---------------------------------------------------------------------------
# analytic intersections (reference: src/Shaders/common.h:163-190)
# ---------------------------------------------------------------------------

def ray_sphere(origin, direction, center, radius):
    """Stable quadratic ray/sphere; returns (t_near, t_far), 0s on miss."""
    f = origin - center
    a = dot(direction, direction)
    b = dot(f, direction)
    l = a[..., None] * f - direction * b[..., None]
    det = pow2(a * radius) - length_squared(l)
    hit = det >= 0.0
    inv_a = 1.0 / jnp.maximum(a, 1e-30)
    sq = jnp.sqrt(jnp.maximum(det, 0.0) * inv_a) * inv_a
    t0 = -b * inv_a - sq
    t1 = -b * inv_a + sq
    z = jnp.zeros_like(t0)
    return jnp.where(hit, t0, z), jnp.where(hit, t1, z)


def ray_aabb(origin, inv_dir, box_min, box_max):
    """Slab test. Returns (t_enter, t_exit); hit iff t_enter <= t_exit."""
    t0 = (box_min - origin) * inv_dir
    t1 = (box_max - origin) * inv_dir
    tmin = jnp.max(jnp.minimum(t0, t1), axis=-1)
    tmax = jnp.min(jnp.maximum(t0, t1), axis=-1)
    return tmin, tmax


def ray_plane(origin, direction, normal):
    """Distance to plane through the local origin with the given normal."""
    denom = dot(normal, direction)
    return jnp.where(
        jnp.abs(denom) > 0.0, -dot(origin, normal) / jnp.where(denom != 0, denom, 1.0),
        POS_INFINITY,
    )


# ---------------------------------------------------------------------------
# measure conversions (reference: src/Shaders/common.h:197-203)
# ---------------------------------------------------------------------------

def pdfW_to_pdfA(pdfW, G):
    """Solid-angle pdf -> area pdf. G = |cos| / dist^2."""
    return pdfW * G


def pdfA_to_pdfW(pdfA, G):
    """Area pdf -> solid-angle pdf. G = |cos| / dist^2."""
    return safe_div(pdfA, G)


def geometry_term(cos_theta, dist_sq):
    return safe_div(jnp.abs(cos_theta), dist_sq)


# ---------------------------------------------------------------------------
# CIE 1931 analytic fits (Wyman et al., JCGT 2013) — spectral -> RGB for the
# Mitsuba loader (reference: src/Shaders/common.h:210-268)
# ---------------------------------------------------------------------------

def cie_x_fit(wavelength):
    w = jnp.asarray(wavelength, dtype=jnp.float32)
    t1 = (w - 442.0) * jnp.where(w < 442.0, 0.0624, 0.0374)
    t2 = (w - 599.8) * jnp.where(w < 599.8, 0.0264, 0.0323)
    t3 = (w - 501.1) * jnp.where(w < 501.1, 0.0490, 0.0382)
    return (
        0.362 * jnp.exp(-0.5 * t1 * t1)
        + 1.056 * jnp.exp(-0.5 * t2 * t2)
        - 0.065 * jnp.exp(-0.5 * t3 * t3)
    )


def cie_y_fit(wavelength):
    w = jnp.asarray(wavelength, dtype=jnp.float32)
    t1 = (w - 568.8) * jnp.where(w < 568.8, 0.0213, 0.0247)
    t2 = (w - 530.9) * jnp.where(w < 530.9, 0.0613, 0.0322)
    return 0.821 * jnp.exp(-0.5 * t1 * t1) + 0.286 * jnp.exp(-0.5 * t2 * t2)


def cie_z_fit(wavelength):
    w = jnp.asarray(wavelength, dtype=jnp.float32)
    t1 = (w - 437.0) * jnp.where(w < 437.0, 0.0845, 0.0278)
    t2 = (w - 459.0) * jnp.where(w < 459.0, 0.0385, 0.0725)
    return 1.217 * jnp.exp(-0.5 * t1 * t1) + 0.681 * jnp.exp(-0.5 * t2 * t2)


_XYZ_TO_RGB = np.array(
    [
        [3.2404542, -1.5371385, -0.4985314],
        [-0.9692660, 1.8760108, 0.0415560],
        [0.0556434, -0.2040259, 1.0572252],
    ],
    dtype=np.float32,
)


def integrate_spectrum_to_rgb(wavelengths: np.ndarray, values: np.ndarray) -> np.ndarray:
    """Host-side: integrate a sampled spectrum against CIE fits -> linear sRGB.

    Mirrors the integration the reference performs for Mitsuba spectra
    (common.h:210-268) but vectorized with numpy.
    """
    CIE_Y_INTEGRAL = 106.856895
    grid = np.arange(400.0, 701.0, 1.0, dtype=np.float32)
    vals = np.interp(grid, wavelengths, values, left=values[0], right=values[-1])
    xyz = np.stack(
        [
            np.asarray(cie_x_fit(grid)),
            np.asarray(cie_y_fit(grid)),
            np.asarray(cie_z_fit(grid)),
        ],
        axis=0,
    )
    XYZ = (xyz * vals[None, :]).sum(axis=1) / CIE_Y_INTEGRAL
    return np.maximum(_XYZ_TO_RGB @ XYZ, 0.0).astype(np.float32)
