"""Counter-based deterministic RNG for rendering.

pcg4d (Jarzynski & Olano, JCGT 2020) with the same stream semantics as the
reference renderer (src/Shaders/common/rng.hlsli:22-47): per-pixel state is
``uint4(pixel.x, pixel.y, seed, dimension)`` and each draw increments the
dimension counter. Because every sample is a pure function of
(pixel, seed, dimension), images are bit-identical under any tiling/sharding
of the pixel domain — the property that makes single-chip vs multi-chip
renders exactly comparable.

States are ``uint32`` arrays of shape ``[..., 4]``; all ops are vectorized and
jit-safe. A convenience wrapper draws k uniforms at once by offsetting the
counter, avoiding sequential dependencies inside kernels.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

_U32 = jnp.uint32


def pcg(v):
    """Scalar pcg hash on uint32 arrays (rng.hlsli:17-21 semantics)."""
    v = jnp.asarray(v, dtype=_U32)
    state = v * np.uint32(747796405) + np.uint32(2891336453)
    word = ((state >> ((state >> np.uint32(28)) + np.uint32(4))) ^ state) * np.uint32(
        277803737
    )
    return (word >> np.uint32(22)) ^ word


def xxhash32(p):
    """xxhash32 finalizer on uint32 arrays (rng.hlsli:6-14 semantics)."""
    p = jnp.asarray(p, dtype=_U32)
    P2 = np.uint32(2246822519)
    P3 = np.uint32(3266489917)
    P4 = np.uint32(668265263)
    P5 = np.uint32(374761393)
    h = p + P5
    h = P4 * ((h << np.uint32(17)) | (h >> np.uint32(15)))
    h = P2 * (h ^ (h >> np.uint32(15)))
    h = P3 * (h ^ (h >> np.uint32(13)))
    return h ^ (h >> np.uint32(16))


def pcg4d(v):
    """pcg4d mixing on uint32 [..., 4] arrays."""
    v = jnp.asarray(v, dtype=_U32)
    v = v * np.uint32(1664525) + np.uint32(1013904223)
    x, y, z, w = v[..., 0], v[..., 1], v[..., 2], v[..., 3]
    x = x + y * w
    y = y + z * x
    z = z + x * y
    w = w + y * z
    x, y, z, w = (t ^ (t >> np.uint32(16)) for t in (x, y, z, w))
    x = x + y * w
    y = y + z * x
    z = z + x * y
    w = w + y * z
    return jnp.stack([x, y, z, w], axis=-1)


def rng_init(pixel_x, pixel_y, seed, offset=0):
    """Build state uint32[..., 4] from pixel coords, frame seed, start dim."""
    px = jnp.asarray(pixel_x, dtype=_U32)
    py = jnp.broadcast_to(jnp.asarray(pixel_y, dtype=_U32), px.shape)
    s = jnp.broadcast_to(jnp.asarray(seed, dtype=_U32), px.shape)
    o = jnp.broadcast_to(jnp.asarray(offset, dtype=_U32), px.shape)
    return jnp.stack([px, py, s, o], axis=-1)


def _bits_to_float(bits):
    """uint32 -> float in [0, 1) via mantissa trick (rng.hlsli:40-42)."""
    import jax.lax as lax

    mantissa = (bits >> np.uint32(9)) | np.uint32(0x3F800000)
    return lax.bitcast_convert_type(mantissa, jnp.float32) - 1.0


# ---------------------------------------------------------------------------
# low-discrepancy mode (trace-time global, like render/lights.ENV_SAMPLER):
#   "rand" — pcg4d counter RNG, the reference's sampler (rng.hlsli:22-47)
#   "kron" — Cranley-Patterson-rotated Kronecker lattice: dimension d of
#            sample s for a pixel is
#              u = frac( rot(pixel, d) + (s+1) * alpha_d )
#            with alpha_d = frac(sqrt(prime_d)) held as uint32 fixed point
#            (the addition wraps mod 2^32, so the lattice is EXACT at any
#            sample index) and rot a pcg4d hash of (pixel, dim) only.
#            Per-dimension Weyl sequences are equidistributed and the
#            per-pixel rotation decorrelates neighbours, so images stay
#            unbiased and shard-invariant while low-spp RMSE drops well
#            below independent sampling. The wavefront integrator draws
#            the same dimensions for every sample (dense SoA, no
#            data-dependent draws), which is exactly what makes a stable
#            (pixel, dim, sample) -> u mapping possible.
QMC = "rand"

# first 512 frac(sqrt(prime)) in uint32 fixed point; dims beyond the table
# wrap (by then the path is deep in RR territory and stratification is moot)
def _alpha_table(n=512):
    sieve = np.ones(8192, bool)
    sieve[:2] = False
    for i in range(2, 91):
        if sieve[i]:
            sieve[i * i:: i] = False
    primes = np.nonzero(sieve)[0][:n].astype(np.float64)
    frac = np.sqrt(primes) % 1.0
    return (frac * 4294967296.0).astype(np.uint64).astype(np.uint32)


_ALPHAS = jnp.asarray(_alpha_table())


def _kron_bits(state, dims):
    """Lattice bits for dimensions ``dims`` (uint32 [..., k]) of the state's
    sample index (state[..., 2]); rotation keyed by (pixel, dim) only."""
    px = state[..., 0:1]
    py = state[..., 1:2]
    s = state[..., 2:3]
    rot_state = jnp.stack(
        [
            jnp.broadcast_to(px, dims.shape),
            jnp.broadcast_to(py, dims.shape),
            jnp.full(dims.shape, np.uint32(0xA511E9B3), _U32),
            dims,
        ],
        axis=-1,
    )
    rot = pcg4d(rot_state)[..., 0]
    alpha = _ALPHAS[dims % np.uint32(_ALPHAS.shape[0])]
    return rot + (s + np.uint32(1)) * alpha  # wraps mod 2^32: exact lattice


def next_uint(state):
    """Draw one uint32 per state; returns (bits, new_state)."""
    state = state.at[..., 3].add(np.uint32(1))
    if QMC == "kron":
        return _kron_bits(state, state[..., 3:4])[..., 0], state
    return pcg4d(state)[..., 0], state


def next_float(state):
    """Draw one uniform float in [0,1) per state; returns (u, new_state)."""
    bits, state = next_uint(state)
    return _bits_to_float(bits), state


def next_floats(state, k: int):
    """Draw k independent uniforms per state in one shot.

    Counter semantics match k sequential :func:`next_float` calls: draw i uses
    dimension ``w + 1 + i`` and the returned state has ``w += k``.
    Returns (u[..., k], new_state).
    """
    w = state[..., 3]
    offs = jnp.arange(1, k + 1, dtype=_U32)
    if QMC == "kron":
        bits = _kron_bits(state, w[..., None] + offs)
        return _bits_to_float(bits), state.at[..., 3].add(np.uint32(k))
    states = jnp.broadcast_to(state[..., None, :], state.shape[:-1] + (k, 4))
    states = states.at[..., 3].set(w[..., None] + offs)
    bits = pcg4d(states)[..., 0]
    return _bits_to_float(bits), state.at[..., 3].add(np.uint32(k))


def skip(state, k: int = 1):
    return state.at[..., 3].add(np.uint32(k))
