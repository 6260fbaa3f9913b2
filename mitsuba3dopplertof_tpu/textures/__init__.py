"""Texture plugins (reference src/textures/{bitmap,checkerboard,
mesh_attribute,volume}.cpp).

Compile model: every texture in the scene gets a row in the texture table;
bitmap images concatenate into a single flat rgb atlas (3, total_pixels) so
one dynamic gather per lane evaluates any bitmap. Checkerboard is
procedural (pure VPU). BSDF parameter rows reference textures by id.
"""

from __future__ import annotations

from typing import Optional

import numpy as np
import jax.numpy as jnp

from ..core.properties import Properties, register_plugin

TEX_CHECKERBOARD = 0
TEX_BITMAP = 1

N_TEX_PARAMS = 12
# param columns
T_COLOR0 = 0     # checkerboard color0 rgb
T_COLOR1 = 3     # checkerboard color1 rgb
T_UVSCALE = 6    # uv transform: scale u, scale v, offset u, offset v
T_ATLAS = 10     # bitmap: atlas offset (as float), 11: width (height derived)


def _get_rgb(props, key, default):
    v = props.get(key, default)
    if isinstance(v, dict):
        v = v.get("value")
    a = np.asarray(v, dtype=np.float64).reshape(-1)
    if a.size == 1:
        a = np.repeat(a, 3)
    return a[:3]


class Texture:
    type_id = TEX_CHECKERBOARD

    def __init__(self, props: Properties):
        self.id = props.id
        m = props.get_transform("to_uv", np.eye(4))
        # uv transform: scale from the 2x2 block, offset from translation
        self.uv_scale = (float(m[0, 0]), float(m[1, 1]))
        self.uv_offset = (float(m[0, 3]), float(m[1, 3]))
        self.image: Optional[np.ndarray] = None   # (h, w, 3) for bitmaps

    def params_row(self) -> np.ndarray:
        p = np.zeros(N_TEX_PARAMS)
        p[T_UVSCALE] = self.uv_scale[0]
        p[T_UVSCALE + 1] = self.uv_scale[1]
        p[T_UVSCALE + 2] = self.uv_offset[0]
        p[T_UVSCALE + 3] = self.uv_offset[1]
        return p

    def mean_rgb(self) -> np.ndarray:
        return np.array([0.5, 0.5, 0.5])


@register_plugin("texture", "checkerboard")
class Checkerboard(Texture):
    """reference src/textures/checkerboard.cpp — color0/color1 grid."""
    type_id = TEX_CHECKERBOARD

    def __init__(self, props: Properties):
        super().__init__(props)
        self.color0 = _get_rgb(props, "color0", [0.4, 0.4, 0.4])
        self.color1 = _get_rgb(props, "color1", [0.2, 0.2, 0.2])

    def params_row(self):
        p = super().params_row()
        p[T_COLOR0:T_COLOR0 + 3] = self.color0
        p[T_COLOR1:T_COLOR1 + 3] = self.color1
        return p

    def mean_rgb(self):
        return 0.5 * (np.asarray(self.color0) + np.asarray(self.color1))


@register_plugin("texture", "bitmap")
class BitmapTexture(Texture):
    """reference src/textures/bitmap.cpp — image-backed texture. v1:
    nearest-neighbor lookup with repeat wrapping; sRGB->linear on load for
    8-bit images (the reference's raw=false default)."""
    type_id = TEX_BITMAP

    def __init__(self, props: Properties):
        super().__init__(props)
        filename = props.get_string("filename")
        raw = props.get_bool("raw", False)
        props.get_string("filter_type", "bilinear")
        props.get_string("wrap_mode", "repeat")
        self.image = self._load(filename, raw)

    @staticmethod
    def _load(filename: str, raw: bool) -> np.ndarray:
        from ..io.bitmap import read_exr
        if filename.lower().endswith(".exr"):
            ch = read_exr(filename)
            names = ("R", "G", "B") if "R" in ch else tuple(sorted(ch))[:3]
            img = np.stack([ch[n] for n in names], axis=-1)
            return np.asarray(img, np.float32)
        import imageio.v3 as iio
        img = np.asarray(iio.imread(filename), np.float32)
        if img.ndim == 2:
            img = np.stack([img] * 3, axis=-1)
        img = img[..., :3] / 255.0
        if not raw:   # sRGB -> linear
            img = np.where(img <= 0.04045, img / 12.92,
                           ((img + 0.055) / 1.055) ** 2.4)
        return img.astype(np.float32)

    def mean_rgb(self):
        return self.image.reshape(-1, 3).mean(axis=0)


@register_plugin("texture", "mesh_attribute")
class MeshAttribute(Texture):
    """reference src/textures/mesh_attribute.cpp — placeholder that
    evaluates to a constant mean until per-vertex attributes land."""
    type_id = TEX_CHECKERBOARD

    def __init__(self, props: Properties):
        super().__init__(props)
        props.get_string("name", "")
        self.color0 = self.color1 = np.array([0.5, 0.5, 0.5])

    def params_row(self):
        p = super().params_row()
        p[T_COLOR0:T_COLOR0 + 3] = self.color0
        p[T_COLOR1:T_COLOR1 + 3] = self.color1
        return p


# ---------------------------------------------------------------------------
# Device-side evaluation
# ---------------------------------------------------------------------------

def eval_texture(sa, tex_id, uv_u, uv_v):
    """Evaluate per-lane textures (tex_id < 0 handled by the caller).
    Returns Vec3 rgb."""
    from ..core.vec import Vec3, where3
    from ..render.scene import gather_small
    idx = jnp.maximum(tex_id, 0)

    def param(j):
        return gather_small(sa.tex_params[j], idx)

    su = param(T_UVSCALE)
    sv = param(T_UVSCALE + 1)
    ou = param(T_UVSCALE + 2)
    ov = param(T_UVSCALE + 3)
    u = uv_u * su + ou
    v = uv_v * sv + ov

    lane_type = gather_small(sa.tex_type, idx)
    zero = jnp.zeros_like(uv_u)
    out = Vec3(zero, zero, zero)
    for tid in sa.tex_types_present:
        if tid == TEX_CHECKERBOARD:
            cell = (jnp.floor(u * 2.0).astype(jnp.int32)
                    + jnp.floor(v * 2.0).astype(jnp.int32)) & 1
            c0 = Vec3(param(T_COLOR0), param(T_COLOR0 + 1), param(T_COLOR0 + 2))
            c1 = Vec3(param(T_COLOR1), param(T_COLOR1 + 1), param(T_COLOR1 + 2))
            val = where3(cell == 0, c0, c1)
        elif tid == TEX_BITMAP:
            off = param(T_ATLAS).astype(jnp.int32)
            w = param(T_ATLAS + 1).astype(jnp.int32)
            h = gather_small(sa.tex_h, idx)
            uu = u - jnp.floor(u)
            vv = v - jnp.floor(v)
            xi = jnp.clip((uu * w.astype(uu.dtype)).astype(jnp.int32), 0, w - 1)
            yi = jnp.clip((vv * h.astype(vv.dtype)).astype(jnp.int32), 0, h - 1)
            flat = off + yi * w + xi
            val = Vec3(sa.tex_atlas_r[flat], sa.tex_atlas_g[flat],
                       sa.tex_atlas_b[flat])
        else:
            continue
        out = where3(lane_type == tid, val, out)
    return out


__all__ = ["Texture", "Checkerboard", "BitmapTexture", "MeshAttribute",
           "eval_texture", "N_TEX_PARAMS", "TEX_CHECKERBOARD", "TEX_BITMAP",
           "T_COLOR0", "T_COLOR1", "T_UVSCALE", "T_ATLAS"]
