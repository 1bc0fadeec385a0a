"""Texture stack: the TPU replacement for bindless images.

The reference binds up to 4096 arbitrary-size images (scene.h:26
``gImageCount``) behind a descriptor-indexed array and samples them with
hardware filtering + ray-cone mip LOD (image_value.h:81-97). Neither
arbitrary shapes nor sampler hardware exist on TPU, so:

- at flatten time every referenced image is area-resampled into a fixed
  ``R x R`` RGBA stack ``[K, R, R, 4]`` (float16 to halve HBM);
- a full mip pyramid is precomputed as additional stacks (R/2, R/4, ... 1),
  all carried in one pytree;
- sampling is explicit bilinear (4 taps = 4 row gathers from the flattened
  stack) with a per-lane integer LOD picked from the ray-cone footprint
  (trilinear blending between mips costs a second set of taps; nearest-mip
  is the default).

Texture id -1 means "no texture" and yields 1.0 so ImageValue-style
``constant factor x optional texture`` composition (image_value.h:33-76)
is a plain multiply.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp
import numpy as np

DEFAULT_RES = 512


class TextureStack(NamedTuple):
    """All scene textures, mip 0 first. ``levels[l]`` has shape
    [K, R>>l, R>>l, 4] float16."""

    levels: tuple  # tuple of jnp arrays

    @property
    def num_textures(self) -> int:
        return self.levels[0].shape[0]

    @property
    def resolution(self) -> int:
        return self.levels[0].shape[1]


def _area_resample(img: np.ndarray, res: int) -> np.ndarray:
    """Resample [H,W,C] -> [res,res,4] float32 (PIL high-quality when
    available, numpy box filter otherwise)."""
    img = np.asarray(img, np.float32)
    if img.ndim == 2:
        img = img[..., None]
    if img.shape[-1] == 1:
        img = np.repeat(img, 3, axis=-1)
    if img.shape[-1] == 3:
        img = np.concatenate([img, np.ones_like(img[..., :1])], axis=-1)
    try:
        from PIL import Image

        chans = [
            np.asarray(
                Image.fromarray(img[..., c]).resize((res, res), Image.LANCZOS),
                np.float32,
            )
            for c in range(4)
        ]
        return np.stack(chans, axis=-1)
    except Exception:
        ys = np.linspace(0, img.shape[0] - 1, res).astype(np.int32)
        xs = np.linspace(0, img.shape[1] - 1, res).astype(np.int32)
        return img[ys][:, xs]


def _downsample2(level: np.ndarray) -> np.ndarray:
    """2x2 box filter one mip level [K,R,R,4] -> [K,R/2,R/2,4]
    (reference: Image::generate_mip_maps blit chain, Core/Image.cpp:231)."""
    k, r, _, c = level.shape
    return level.reshape(k, r // 2, 2, r // 2, 2, c).mean(axis=(2, 4))


def build_texture_stack(images: list, res: int = DEFAULT_RES) -> TextureStack:
    """images: list of numpy [H,W,C] float32 linear. An empty list yields a
    single 1x1 white sentinel — resolution 1 is the static "no textures"
    signal integrators branch on."""
    if not images:
        return TextureStack(
            levels=(jnp.ones((1, 1, 1, 4), jnp.float16),)
        )
    base = np.stack([_area_resample(im, res) for im in images])
    levels = [base]
    while levels[-1].shape[1] > 1:
        levels.append(_downsample2(levels[-1]))
    return TextureStack(
        levels=tuple(jnp.asarray(l, jnp.float16) for l in levels)
    )


def sample_nearest(stack: TextureStack, tex_id, uv, lod=None):
    """Nearest-texel fetch at integer LOD (default 0). tex_id -1 -> 1.0."""
    return _sample(stack, tex_id, uv, lod, bilinear=False)


def sample_bilinear(stack: TextureStack, tex_id, uv, lod=None):
    """Bilinear fetch at integer LOD. tex_id [N] int32, uv [N,2] in [0,1)
    (wrapped). Returns [N,4] float32."""
    return _sample(stack, tex_id, uv, lod, bilinear=True)


def _level_fetch(level, tex_id, xi, yi):
    r = level.shape[1]
    flat = level.reshape(-1, 4)
    idx = (tex_id * r + yi) * r + xi
    return flat[idx].astype(jnp.float32)


def _sample(stack, tex_id, uv, lod, bilinear):
    n_levels = len(stack.levels)
    valid = tex_id >= 0
    tid = jnp.maximum(tex_id, 0)
    if lod is None:
        lod = jnp.zeros_like(tex_id)
    lod = jnp.clip(lod, 0, n_levels - 1)
    # evaluate the sample at every mip level and select — levels is a static
    # tuple, so this is a fixed chain of small fetches, only the selected
    # level's gather result survives (XLA dead-codes nothing here, but mip
    # chains are cheap: total texels < 4/3 * base)
    out = jnp.zeros(uv.shape[:-1] + (4,), jnp.float32)
    for l, level in enumerate(stack.levels):
        r = level.shape[1]
        x = uv[..., 0] * r - 0.5
        y = uv[..., 1] * r - 0.5
        x0 = jnp.floor(x)
        y0 = jnp.floor(y)
        fx = (x - x0)[..., None]
        fy = (y - y0)[..., None]
        xi0 = jnp.mod(x0.astype(jnp.int32), r)
        yi0 = jnp.mod(y0.astype(jnp.int32), r)
        if bilinear:
            xi1 = jnp.mod(xi0 + 1, r)
            yi1 = jnp.mod(yi0 + 1, r)
            c00 = _level_fetch(level, tid, xi0, yi0)
            c10 = _level_fetch(level, tid, xi1, yi0)
            c01 = _level_fetch(level, tid, xi0, yi1)
            c11 = _level_fetch(level, tid, xi1, yi1)
            val = (
                c00 * (1 - fx) * (1 - fy)
                + c10 * fx * (1 - fy)
                + c01 * (1 - fx) * fy
                + c11 * fx * fy
            )
        else:
            val = _level_fetch(level, tid, xi0, yi0)
        out = jnp.where((lod == l)[..., None], val, out)
    return jnp.where(valid[..., None], out, 1.0)


def ray_cone_lod(stack: TextureStack, uv_screen_size):
    """Pick the mip whose texel footprint matches the ray-cone uv footprint
    (reference: ImageValue::eval ray-cone LOD, image_value.h:81-97)."""
    r = stack.resolution
    texels = uv_screen_size * r
    lod = jnp.maximum(
        jnp.ceil(jnp.log2(jnp.maximum(texels, 1.0))), 0.0
    ).astype(jnp.int32)
    return jnp.clip(lod, 0, len(stack.levels) - 1)
