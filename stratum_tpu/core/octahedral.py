"""Octahedral unit-vector packing to/from uint32 (2x snorm16).

The reference packs geometry/shading normals and path directions this way in
its 64B PathVertex and 48B ShadingData records (src/Shaders/shading_data.h,
src/Shaders/bdpt.h:107-156). We keep the same encoding so compact G-buffers /
path-state buffers cost 4 bytes per direction on TPU as well.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def _oct_wrap(v):
    return (1.0 - jnp.abs(v[..., ::-1])) * jnp.where(v >= 0.0, 1.0, -1.0)


def encode_oct(n):
    """Unit vector [..., 3] -> octahedral coords [..., 2] in [-1, 1]."""
    n = n / jnp.sum(jnp.abs(n), axis=-1, keepdims=True)
    xy = n[..., :2]
    return jnp.where(n[..., 2:3] >= 0.0, xy, _oct_wrap(xy))


def decode_oct(f):
    """Octahedral coords [..., 2] -> unit vector [..., 3]."""
    z = 1.0 - jnp.abs(f[..., 0]) - jnp.abs(f[..., 1])
    t = jnp.maximum(-z, 0.0)
    xy = f + jnp.where(f >= 0.0, -t[..., None], t[..., None])
    v = jnp.concatenate([xy, z[..., None]], axis=-1)
    return v / jnp.linalg.norm(v, axis=-1, keepdims=True)


def pack_unit(n):
    """Unit vector -> uint32 (two snorm16 lanes)."""
    f = encode_oct(n)
    q = jnp.round(jnp.clip(f, -1.0, 1.0) * 32767.0).astype(jnp.int32)
    u = (q & 0xFFFF).astype(jnp.uint32)
    return u[..., 0] | (u[..., 1] << np.uint32(16))


def unpack_unit(p):
    """uint32 -> unit vector."""
    p = p.astype(jnp.uint32)
    lo = (p & np.uint32(0xFFFF)).astype(jnp.int32)
    hi = ((p >> np.uint32(16)) & np.uint32(0xFFFF)).astype(jnp.int32)
    lo = jnp.where(lo >= 32768, lo - 65536, lo)
    hi = jnp.where(hi >= 32768, hi - 65536, hi)
    f = jnp.stack([lo, hi], axis=-1).astype(jnp.float32) / 32767.0
    return decode_oct(f)
