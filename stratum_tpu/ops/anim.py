"""Animation ops: linear-blend skinning and blend shapes.

TPU-native analog of src/Shaders/kernels/anim.hlsl (4-bone LBS at 28-60,
4-target blendshapes at 62-86; present in the reference but not wired into
its current main path — provided here with the same contract) plus the
keyframe spline evaluation in core/spline.py (Common/spline.hpp). Dense
batched jnp: skinning is a [V,4]-weighted blend of 3x4 bone transforms —
exactly the kind of small dense contraction the VPU eats.
"""

from __future__ import annotations

import jax.numpy as jnp

from stratum_tpu.core import math as smath
from stratum_tpu.core import transform as xform


def skin_vertices(positions, normals, bone_ids, bone_weights, bone_matrices):
    """4-bone linear-blend skinning.

    positions [V,3], normals [V,3], bone_ids i32 [V,4], bone_weights
    [V,4] (rows sum to 1), bone_matrices [B,3,4]. Returns (positions',
    normals') (anim.hlsl:28-60)."""
    mats = bone_matrices[bone_ids]  # [V,4,3,4]
    w = bone_weights[..., None, None]
    blended = jnp.sum(mats * w, axis=1)  # [V,3,4]
    p = xform.transform_point(blended, positions)
    # normals via the blended linear part (assumes near-rigid bones; the
    # reference does the same)
    n = xform.transform_vector(blended, normals)
    return p, smath.normalize(n)


def blend_shapes(positions, normals, shape_deltas, shape_normal_deltas, weights):
    """Blend-shape morphing: base + sum_k w_k * delta_k
    (anim.hlsl:62-86). shape_deltas [K,V,3], weights [K]."""
    p = positions + jnp.einsum("k,kvc->vc", weights, shape_deltas)
    n = normals
    if shape_normal_deltas is not None:
        n = smath.normalize(
            normals + jnp.einsum("k,kvc->vc", weights, shape_normal_deltas)
        )
    return p, n
