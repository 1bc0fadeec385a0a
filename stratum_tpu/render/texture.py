"""Texture stack: the TPU replacement for bindless images.

The reference binds up to 4096 arbitrary-size images (scene.h:26
``gImageCount``) behind a descriptor-indexed array and samples them with
hardware filtering + ray-cone mip LOD (image_value.h:81-97). Neither
arbitrary shapes nor sampler hardware exist on TPU, so:

- at flatten time every referenced image is area-resampled into an
  ``R x R`` RGBA stack (R adapts to the largest source, flatten.py) and a
  full mip pyramid is computed;
- ALL levels live in ONE flat [rows, 4] float16 atlas; a sample computes
  its row index arithmetically (level offset table + dynamic level
  resolution) so a bilinear tap costs exactly 4 gathers and a trilinear
  tap 8, INDEPENDENT of the pyramid depth. (The previous design evaluated
  every level and selected — O(levels) gathers made textured scenes ~5x
  slower end-to-end.)
- trilinear filtering (the reference's hardware path) is the default via
  fractional ray-cone LODs; integer LODs select one level exactly.

Texture id -1 means "no texture" and yields 1.0 so ImageValue-style
``constant factor x optional texture`` composition (image_value.h:33-76)
is a plain multiply.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

DEFAULT_RES = 512

# slot_mask bits: which material texture slots are used ANYWHERE in the
# scene. Texture sampling is gather-bound (~7 ns/row x 2M lanes x 8 rows
# per trilinear tap), and a tap for a slot NO material binds (e.g. normal
# maps in a diffuse-textured scene) still pays full price on every lane —
# the static mask lets integrators drop those taps at trace time.
SLOT_BASE_COLOR = 1
SLOT_EMISSION = 2
SLOT_ROUGH_METAL = 4
SLOT_NORMAL = 8
SLOT_ALPHA = 16
SLOT_ALL = 31


@jax.tree_util.register_pytree_node_class
class TextureStack:
    """Flat mip atlas. ``flat`` is [sum_l K*(R>>l)^2, 4] float16; level l's
    block starts at a statically known row offset and holds K images of
    resolution R>>l in [K, r, r] row-major order. Static metadata
    (resolution, level count, texture count, used-slot mask) rides pytree
    aux_data so integrators can branch on it at trace time."""

    def __init__(
        self, flat, base_res: int, num_levels: int, num_tex: int,
        slot_mask: int = SLOT_ALL, quad=None,
    ):
        self.flat = flat
        # quad atlas [rows, 16] f16: row (x, y) holds the 2x2 texel block
        # (x,y) (x+1,y) (x,y+1) (x+1,y+1), neighbors pre-WRAPPED — so a
        # bilinear tap is ONE row gather instead of four (XLA row gathers
        # cost ~7 ns/row at 2M lanes regardless of width). 4x the texel
        # memory of ``flat``; None falls back to the 4-gather path.
        self.quad = quad
        self.base_res = int(base_res)
        self.num_levels = int(num_levels)
        self.num_tex = int(num_tex)
        self.slot_mask = int(slot_mask)

    def tree_flatten(self):
        return (self.flat, self.quad), (
            self.base_res, self.num_levels, self.num_tex, self.slot_mask,
        )

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(
            children[0], aux[0], aux[1], aux[2], aux[3], quad=children[1]
        )

    def uses(self, slot_bit: int) -> bool:
        return bool(self.slot_mask & slot_bit)

    @property
    def num_textures(self) -> int:
        return self.num_tex

    @property
    def resolution(self) -> int:
        return self.base_res

    @property
    def levels(self):
        """Per-level [K, r, r, 4] views reconstructed from the atlas
        (tests/debugging; sampling never materializes these)."""
        out = []
        r = self.base_res
        for off in self.level_offsets():
            out.append(
                self.flat[off : off + self.num_tex * r * r].reshape(
                    self.num_tex, r, r, 4
                )
            )
            r = max(r // 2, 1)
        return tuple(out)

    def level_offsets(self):
        """Python list of level start rows (static)."""
        offs = []
        row = 0
        r = self.base_res
        for _ in range(self.num_levels):
            offs.append(row)
            row += self.num_tex * r * r
            r = max(r // 2, 1)
        return offs


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
            jnp.ones((1, 4), jnp.float16), base_res=1, num_levels=1,
            num_tex=1, quad=jnp.ones((1, 16), jnp.float16),
        )
    base = np.stack([_area_resample(im, res) for im in images])
    levels = [base]
    while levels[-1].shape[1] > 1:
        levels.append(_downsample2(levels[-1]))
    flat = np.concatenate([l.reshape(-1, 4) for l in levels], axis=0)

    def quad_of(l):
        # [K, r, r, 16]: each texel row also carries its +x / +y / +x+y
        # wrapped neighbors, so one gather serves a whole bilinear tap
        qx = np.roll(l, -1, axis=2)
        qy = np.roll(l, -1, axis=1)
        qxy = np.roll(qy, -1, axis=2)
        return np.concatenate([l, qx, qy, qxy], axis=-1)

    quad = np.concatenate([quad_of(l).reshape(-1, 16) for l in levels])
    return TextureStack(
        jnp.asarray(flat, jnp.float16),
        base_res=res, num_levels=len(levels), num_tex=base.shape[0],
        quad=jnp.asarray(quad, jnp.float16),
    )


def sample_nearest(stack: TextureStack, tex_id, uv, lod=None):
    """Nearest-texel fetch at integer LOD (default 0). tex_id -1 -> 1.0."""
    return _sample(stack, tex_id, uv, lod, bilinear=False)


def sample_bilinear(stack: TextureStack, tex_id, uv, lod=None, u_lod=None):
    """Bi-/trilinear fetch. tex_id [N] int32, uv [N,2] in [0,1) (wrapped),
    lod integer (exact level) or float (trilinear blend of the two
    adjacent levels). ``u_lod`` [N] in [0,1): STOCHASTIC trilinear — pick
    level l0 or l0+1 with probability equal to the blend fraction (one
    bilinear tap, half the gathers; E over u_lod == the trilinear value,
    so a progressive render converges to the same image). Returns [N,4]
    float32."""
    return _sample(stack, tex_id, uv, lod, bilinear=True, u_lod=u_lod)


def _level_sample(stack, offs, tid, uv, lvl, bilinear):
    """One level's bi-/nearest sample with the level chosen PER LANE via
    index arithmetic: r = R >> lvl, row = off[lvl] + (tid*r + y)*r + x."""
    r = jnp.maximum(stack.base_res >> lvl, 1)
    off = offs[lvl]
    rf = r.astype(jnp.float32)
    x = uv[..., 0] * rf - 0.5
    y = uv[..., 1] * rf - 0.5
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    fx = (x - x0)[..., None]
    fy = (y - y0)[..., None]
    xi0 = jnp.mod(x0.astype(jnp.int32), r)
    yi0 = jnp.mod(y0.astype(jnp.int32), r)

    def fetch(xi, yi):
        idx = off + (tid * r + yi) * r + xi
        return stack.flat[idx].astype(jnp.float32)

    if not bilinear:
        return fetch(xi0, yi0)
    if stack.quad is not None:
        # ONE row gather: the quad atlas row carries the full 2x2 block
        # (wrapped neighbors baked in at build time)
        idx = off + (tid * r + yi0) * r + xi0
        q = stack.quad[idx].astype(jnp.float32)  # [N, 16]
        c00, c10, c01, c11 = (
            q[..., 0:4], q[..., 4:8], q[..., 8:12], q[..., 12:16]
        )
    else:
        xi1 = jnp.mod(xi0 + 1, r)
        yi1 = jnp.mod(yi0 + 1, r)
        c00 = fetch(xi0, yi0)
        c10 = fetch(xi1, yi0)
        c01 = fetch(xi0, yi1)
        c11 = fetch(xi1, yi1)
    return (
        c00 * (1 - fx) * (1 - fy)
        + c10 * fx * (1 - fy)
        + c01 * (1 - fx) * fy
        + c11 * fx * fy
    )


def _sample(stack, tex_id, uv, lod, bilinear, u_lod=None):
    n_levels = stack.num_levels
    valid = tex_id >= 0
    tid = jnp.maximum(tex_id, 0)
    if lod is None:
        lod = jnp.zeros(uv.shape[:-1], jnp.int32)
    # float lod => TRILINEAR: blend the two adjacent mips (the reference's
    # hardware trilinear, image_value.h:81-97) — 8 gathers. Integer lod
    # selects a single level exactly — 4 gathers. float lod + u_lod =>
    # stochastic trilinear — 4 gathers, unbiased in expectation.
    trilinear = jnp.issubdtype(jnp.asarray(lod).dtype, jnp.floating)
    offs = jnp.asarray(stack.level_offsets(), jnp.int32)
    if trilinear:
        lod = jnp.clip(lod, 0.0, n_levels - 1)
        l0 = jnp.floor(lod).astype(jnp.int32)
        f1 = lod - l0.astype(jnp.float32)
        if u_lod is not None:
            lvl = jnp.minimum(
                l0 + (u_lod < f1).astype(jnp.int32), n_levels - 1
            )
            out = _level_sample(stack, offs, tid, uv, lvl, bilinear)
        else:
            l1 = jnp.minimum(l0 + 1, n_levels - 1)
            f = f1[..., None]
            v0 = _level_sample(stack, offs, tid, uv, l0, bilinear)
            v1 = _level_sample(stack, offs, tid, uv, l1, bilinear)
            out = v0 * (1.0 - f) + v1 * f
    else:
        lvl = jnp.clip(lod, 0, n_levels - 1)
        out = _level_sample(stack, offs, tid, uv, lvl, bilinear)
    return jnp.where(valid[..., None], out, 1.0)


def ray_cone_lod(stack: TextureStack, uv_screen_size, fractional: bool = True):
    """Mip level whose texel footprint matches the ray-cone uv footprint
    (reference: ImageValue::eval ray-cone LOD, image_value.h:81-97).
    Fractional (default) feeds the trilinear blend in _sample; pass
    ``fractional=False`` for the old nearest-mip integer select."""
    r = stack.resolution
    texels = uv_screen_size * r
    lod = jnp.maximum(jnp.log2(jnp.maximum(texels, 1.0)), 0.0)
    lod = jnp.clip(lod, 0.0, stack.num_levels - 1)
    if fractional:
        return lod
    return jnp.ceil(lod).astype(jnp.int32)
