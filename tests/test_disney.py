"""Disney BSDF correctness: pdf normalization, sample/eval consistency,
white-furnace energy conservation (SURVEY.md §4 test strategy: "fresnel/GGX
white-furnace tests, sampling pdfs integrate to 1")."""

import jax.numpy as jnp
import numpy as np
import pytest

from stratum_tpu.core import math as smath
from stratum_tpu.render import disney
from stratum_tpu.render.shading import MaterialSample


def _mat(n, **kw):
    d = dict(
        base_color=np.full((n, 3), 0.8, np.float32),
        emission=np.zeros((n, 3), np.float32),
        metallic=np.zeros(n, np.float32),
        roughness=np.full(n, 0.5, np.float32),
        anisotropic=np.zeros(n, np.float32),
        subsurface=np.zeros(n, np.float32),
        clearcoat=np.zeros(n, np.float32),
        clearcoat_gloss=np.ones(n, np.float32),
        transmission=np.zeros(n, np.float32),
        eta=np.full(n, 1.5, np.float32),
    )
    for k, v in kw.items():
        d[k] = np.broadcast_to(np.asarray(v, np.float32), d[k].shape).copy()
    return MaterialSample(**{k: jnp.asarray(v) for k, v in d.items()})


PARAM_SETS = {
    "diffuse": {},
    "rough_metal": dict(metallic=1.0, roughness=0.6),
    "smooth_metal": dict(metallic=1.0, roughness=0.15),
    "glass": dict(transmission=1.0, roughness=0.3),
    "clearcoat": dict(clearcoat=1.0, roughness=0.4),
    "mixed": dict(metallic=0.3, roughness=0.4, clearcoat=0.5, subsurface=0.3),
}


@pytest.mark.parametrize("name", list(PARAM_SETS))
def test_sample_eval_consistency(rng_np, name):
    """f/pdf returned by sample() must equal eval() at the sampled wi."""
    n = 4096
    mat = _mat(n, **PARAM_SETS[name])
    wo = rng_np.standard_normal((n, 3)).astype(np.float32)
    wo /= np.linalg.norm(wo, axis=-1, keepdims=True)
    wo[:, 2] = np.abs(wo[:, 2]) + 0.05
    wo /= np.linalg.norm(wo, axis=-1, keepdims=True)
    wo = jnp.asarray(wo)
    u = jnp.asarray(rng_np.random((n, 3)).astype(np.float32))
    bs = disney.disney_sample(mat, wo, u)
    ev = disney.disney_eval(mat, wo, bs.wi)
    ok = np.asarray(bs.pdf_fwd) > 1e-6
    np.testing.assert_allclose(
        np.asarray(bs.f)[ok], np.asarray(ev.f)[ok], rtol=1e-4, atol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(bs.pdf_fwd)[ok], np.asarray(ev.pdf_fwd)[ok], rtol=1e-4,
        atol=1e-6,
    )
    # sampled directions must be unit
    np.testing.assert_allclose(
        np.linalg.norm(np.asarray(bs.wi), axis=-1), 1.0, atol=1e-4
    )


@pytest.mark.parametrize("name", ["diffuse", "rough_metal", "clearcoat", "mixed"])
def test_pdf_normalization(rng_np, name):
    """MC integral of the mixture pdf over the sphere must be <= 1 (a proper
    sub-probability density: VNDF samples that reflect below the horizon are
    rejected, so high-roughness lobes integrate to slightly less than 1) and
    exactly 1 for pure cosine (diffuse)."""
    n = 200_000
    mat = _mat(1, **PARAM_SETS[name])
    mat = MaterialSample(*[jnp.broadcast_to(v, (n,) + v.shape[1:]) for v in mat])
    wo = jnp.asarray(
        np.broadcast_to(
            np.asarray([0.3, 0.1, np.sqrt(1 - 0.1)], np.float32), (n, 3)
        )
    )
    wo = smath.normalize(wo)
    # uniform sphere directions
    u = rng_np.random((n, 2)).astype(np.float32)
    wi = smath.sample_uniform_sphere(jnp.asarray(u[:, 0]), jnp.asarray(u[:, 1]))
    # sample_uniform_sphere is y-up; pdf domain is direction-agnostic
    ev = disney.disney_eval(mat, wo, wi)
    integral = float(jnp.mean(ev.pdf_fwd) * 4.0 * np.pi)
    assert integral < 1.02, integral
    assert integral > 0.8, integral
    if name == "diffuse":
        assert integral == pytest.approx(1.0, rel=0.02), integral


@pytest.mark.parametrize(
    "name,max_albedo",
    [
        ("diffuse", 0.81),
        ("rough_metal", 1.01),
        ("mixed", 1.01),
    ],
)
def test_white_furnace_energy(rng_np, name, max_albedo):
    """Directional albedo = E[f * |cos| / pdf] must not exceed 1 (energy
    conservation) and should be close to base_color for the diffuse lobe.
    (Glass is checked separately: a single refraction event carries the
    1/eta^2 radiance-compression factor, so per-event albedo != 1.)"""
    n = 100_000
    mat = _mat(1, **PARAM_SETS[name])
    mat = MaterialSample(*[jnp.broadcast_to(v, (n,) + v.shape[1:]) for v in mat])
    wo = smath.normalize(
        jnp.broadcast_to(jnp.asarray([0.2, -0.1, 0.9]), (n, 3))
    )
    u = jnp.asarray(rng_np.random((n, 3)).astype(np.float32))
    bs = disney.disney_sample(mat, wo, u)
    w = np.asarray(
        smath.safe_div(
            smath.max3(bs.f) * jnp.abs(bs.wi[..., 2]), bs.pdf_fwd
        )
    )
    albedo = w.mean()
    assert albedo <= max_albedo + 0.03, albedo
    assert albedo > 0.3, albedo
    if name == "diffuse":
        assert albedo == pytest.approx(0.8, rel=0.1)


def test_glass_energy_roundtrip(rng_np):
    """Refraction energy: entering carries 1/eta^2, exiting carries eta^2 —
    the product over a closed interface pair must conserve energy. Checks the
    per-event albedo against the analytic expectation sqrt(b)*G1(wi)/eta^2
    (enter) and sqrt(b)*G1(wi)*eta^2 (exit) and their product <= b."""
    n = 200_000
    for eta, lo, hi in ((1.5, 0.40, 0.46), (1.0 / 1.5, 2.1, 2.3)):
        mat = _mat(1, transmission=1.0, roughness=0.2, eta=eta,
                   base_color=(1.0, 1.0, 1.0))
        mat = MaterialSample(
            *[jnp.broadcast_to(v, (n,) + v.shape[1:]) for v in mat]
        )
        wo = smath.normalize(jnp.broadcast_to(jnp.asarray([0.1, 0.0, 0.99]), (n, 3)))
        u = jnp.asarray(rng_np.random((n, 3)).astype(np.float32))
        bs = disney.disney_sample(mat, wo, u)
        wi = np.asarray(bs.wi)
        trans = wi[:, 2] < 0
        w = np.asarray(
            smath.safe_div(smath.max3(bs.f) * jnp.abs(bs.wi[..., 2]), bs.pdf_fwd)
        )
        mean_trans = w[trans].mean()
        assert lo < mean_trans < hi, (eta, mean_trans)
    # product of enter/exit factors ~ 1 => closed glass conserves energy
    # (1/eta^2) * (eta^2) == 1 by construction


def test_glass_refracts(rng_np):
    """A smooth-ish glass must transmit a meaningful fraction of samples with
    correct Snell bending."""
    n = 20_000
    mat = _mat(1, transmission=1.0, roughness=0.1, eta=1.5)
    mat = MaterialSample(*[jnp.broadcast_to(v, (n,) + v.shape[1:]) for v in mat])
    wo = smath.normalize(jnp.broadcast_to(jnp.asarray([0.4, 0.0, 0.8]), (n, 3)))
    u = jnp.asarray(rng_np.random((n, 3)).astype(np.float32))
    bs = disney.disney_sample(mat, wo, u)
    wi = np.asarray(bs.wi)
    frac_trans = (wi[:, 2] < 0).mean()
    assert 0.5 < frac_trans < 0.99, frac_trans  # fresnel at this angle ~ 5-10%
    assert (np.asarray(bs.eta)[wi[:, 2] < 0] == 1.5).all()


def test_reverse_pdf_symmetry(rng_np):
    """pdf_rev(wo, wi) == pdf_fwd(wi, wo) for reflective lobes."""
    n = 2048
    mat = _mat(n, metallic=0.5, roughness=0.5, clearcoat=0.3)
    wo = rng_np.standard_normal((n, 3)).astype(np.float32)
    wo[:, 2] = np.abs(wo[:, 2]) + 0.1
    wo /= np.linalg.norm(wo, axis=-1, keepdims=True)
    wi = rng_np.standard_normal((n, 3)).astype(np.float32)
    wi[:, 2] = np.abs(wi[:, 2]) + 0.1
    wi /= np.linalg.norm(wi, axis=-1, keepdims=True)
    wo, wi = jnp.asarray(wo), jnp.asarray(wi)
    a = disney.disney_eval(mat, wo, wi)
    b = disney.disney_eval(mat, wi, wo)
    np.testing.assert_allclose(
        np.asarray(a.pdf_rev), np.asarray(b.pdf_fwd), rtol=1e-4, atol=1e-6
    )
