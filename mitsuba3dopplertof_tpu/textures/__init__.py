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
TEX_VOLUME = 2       # 3D volume sampled at the world hit position
TEX_MESHATTR = 3     # per-vertex mesh attribute, barycentric-interpolated

N_TEX_PARAMS = 27
# param columns
T_COLOR0 = 0     # checkerboard color0 rgb / mesh_attribute scale at [0]
T_COLOR1 = 3     # checkerboard color1 rgb
T_UVSCALE = 6    # uv transform: scale u, scale v, offset u, offset v
T_ATLAS = 10     # bitmap/volume: atlas offset (as float), 11: width
T_GRID = 12      # volume: nx, ny, nz at 12..14
T_W2G = 15       # volume: world-to-grid 3x4 row-major at 15..26
# bitmap-only (aliases volume's grid columns — dispatch is type-masked):
T_FILTER = 12    # 0 = nearest, 1 = bilinear (reference default)
T_WRAP = 13      # 0 = repeat, 1 = mirror, 2 = clamp

FILTER_MODES = {"nearest": 0, "bilinear": 1}
WRAP_MODES = {"repeat": 0, "mirror": 1, "clamp": 2}


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
    """reference src/textures/bitmap.cpp — image-backed texture with
    bilinear (default) / nearest filtering and repeat / mirror / clamp
    wrapping (bitmap.cpp:145-163); sRGB->linear on load for 8-bit images
    (the reference's raw=false default)."""
    type_id = TEX_BITMAP

    def __init__(self, props: Properties):
        super().__init__(props)
        from ..core.fresolver import resolve_filename
        filename = resolve_filename(props.get_string("filename"))
        raw = props.get_bool("raw", False)
        ft = props.get_string("filter_type", "bilinear")
        wm = props.get_string("wrap_mode", "repeat")
        if ft not in FILTER_MODES:
            raise RuntimeError(f"bitmap: invalid filter_type '{ft}'")
        if wm not in WRAP_MODES:
            raise RuntimeError(f"bitmap: invalid wrap_mode '{wm}'")
        self.filter_mode = FILTER_MODES[ft]
        self.wrap_mode = WRAP_MODES[wm]
        self.image = self._load(filename, raw)

    def params_row(self):
        p = super().params_row()
        p[T_FILTER] = self.filter_mode
        p[T_WRAP] = self.wrap_mode
        return p

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
    """reference src/textures/mesh_attribute.cpp — evaluates a per-vertex
    mesh attribute (e.g. 'vertex_color' from PLY/serialized files)
    barycentrically interpolated at the hit. The attribute table is packed
    per global triangle slot at scene compile (render/scene.py)."""
    type_id = TEX_MESHATTR

    def __init__(self, props: Properties):
        super().__init__(props)
        self.name = props.get_string("name")
        self.scale = props.get_float("scale", 1.0)

    def params_row(self):
        p = super().params_row()
        p[T_COLOR0] = self.scale
        return p

    def mean_rgb(self):
        return np.array([0.5, 0.5, 0.5]) * self.scale


@register_plugin("texture", "volume")
class VolumeTexture(Texture):
    """reference src/textures/volume.cpp — a 3D volume (constvolume /
    gridvolume) evaluated at the WORLD hit position through the volume's
    inverse to_world; trilinear interpolation (gridvolume.cpp eval
    semantics, same convention as the medium grids)."""
    type_id = TEX_VOLUME

    def __init__(self, props: Properties):
        super().__init__(props)
        from ..volumes import Volume
        self.volume = None
        for key, v in props.objects():
            if isinstance(v, Volume):
                self.volume = v
        if self.volume is None:
            raise RuntimeError("volume texture: provide a nested volume")

    def grid_rgb(self) -> np.ndarray:
        """(nz, ny, nx, 3) float grid (constants become a 1x1x1 cell)."""
        v = self.volume
        g = getattr(v, "data", None)
        if g is None:
            rgb = np.asarray(v.mean_rgb(), np.float32)
            return rgb.reshape(1, 1, 1, 3)
        g = np.asarray(g, np.float32)
        if g.shape[-1] == 1:
            g = np.repeat(g, 3, axis=-1)
        return g[..., :3]

    def world_to_grid(self) -> np.ndarray:
        m = np.asarray(getattr(self.volume, "to_world", np.eye(4)),
                       np.float64)
        return np.linalg.inv(m)[:3, :4]

    def params_row(self):
        p = super().params_row()
        g = self.grid_rgb()
        p[T_GRID] = g.shape[2]
        p[T_GRID + 1] = g.shape[1]
        p[T_GRID + 2] = g.shape[0]
        p[T_W2G:T_W2G + 12] = self.world_to_grid().reshape(-1)
        return p

    def mean_rgb(self):
        return self.grid_rgb().reshape(-1, 3).mean(axis=0)


# ---------------------------------------------------------------------------
# Device-side evaluation
# ---------------------------------------------------------------------------

def eval_texture(sa, tex_id, uv_u, uv_v, p=None, b_u=None, b_v=None,
                 prim=None, wavelengths=None):
    """Evaluate per-lane textures (tex_id < 0 handled by the caller).
    Returns Vec3 rgb — or, when ``wavelengths`` (Vec3 of the lane's hero
    wavelengths) is given under the spectral variant, bitmap texels return
    the upsampled REFLECTANCE SPECTRUM sampled at those wavelengths
    (per-texel sigmoid-polynomial coefficient atlas, reference
    ext/rgb2spec + src/core/srgb.cpp; non-bitmap texture types keep their
    rgb as a flat 3-wavelength approximation).

    ``p`` (Vec3, world hit position): required by `volume` textures;
    ``b_u``/``b_v``/``prim`` (barycentrics + global triangle slot):
    required by `mesh_attribute` textures. Call sites without an SI omit
    them; those branches then return their mean."""
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
            filt = param(T_FILTER)
            wrapm = param(T_WRAP).astype(jnp.int32)

            def wrap_idx(i, n):
                """Per-tap index wrap (reference bitmap.cpp:156-163) —
                applied to integer taps so bilinear weights span seams
                correctly."""
                rep = jnp.remainder(i, n)
                t2 = jnp.remainder(i, 2 * n)
                t2 = jnp.where(t2 < 0, t2 + 2 * n, t2)
                mir = jnp.where(t2 >= n, 2 * n - 1 - t2, t2)
                clp = jnp.clip(i, 0, n - 1)
                return jnp.where(wrapm == 0, rep,
                                 jnp.where(wrapm == 1, mir, clp))

            def fetch(xi, yi):
                flat = off + wrap_idx(yi, h) * w + wrap_idx(xi, w)
                if wavelengths is not None and sa.tex_atlas_c0.shape[0] > 1:
                    from ..core.cie import eval_reflectance_spectrum as _ers
                    c0 = sa.tex_atlas_c0[flat]
                    c1 = sa.tex_atlas_c1[flat]
                    c2 = sa.tex_atlas_c2[flat]
                    return Vec3(_ers(c0, c1, c2, wavelengths.x),
                                _ers(c0, c1, c2, wavelengths.y),
                                _ers(c0, c1, c2, wavelengths.z))
                return Vec3(sa.tex_atlas_r[flat], sa.tex_atlas_g[flat],
                            sa.tex_atlas_b[flat])

            wf = w.astype(u.dtype)
            hf = h.astype(v.dtype)
            # nearest tap
            xn = jnp.floor(u * wf).astype(jnp.int32)
            yn = jnp.floor(v * hf).astype(jnp.int32)
            # bilinear taps at texel centers (reference's half-texel shift)
            xf = u * wf - 0.5
            yf = v * hf - 0.5
            x0 = jnp.floor(xf).astype(jnp.int32)
            y0 = jnp.floor(yf).astype(jnp.int32)
            fx = xf - jnp.floor(xf)
            fy = yf - jnp.floor(yf)
            v00 = fetch(x0, y0)
            v10 = fetch(x0 + 1, y0)
            v01 = fetch(x0, y0 + 1)
            v11 = fetch(x0 + 1, y0 + 1)
            lin = (v00 * ((1.0 - fx) * (1.0 - fy)) + v10 * (fx * (1.0 - fy))
                   + v01 * ((1.0 - fx) * fy) + v11 * (fx * fy))
            val = where3(filt > 0.5, lin, fetch(xn, yn))
        elif tid == TEX_VOLUME and p is not None:
            # world -> volume local [0,1]^3 -> trilinear atlas lookup
            # (reference volume.cpp eval + gridvolume.cpp trilinear; same
            # voxel-center convention as the medium grids)
            def w2g(j):
                return param(T_W2G + j)
            lx = w2g(0) * p.x + w2g(1) * p.y + w2g(2) * p.z + w2g(3)
            ly = w2g(4) * p.x + w2g(5) * p.y + w2g(6) * p.z + w2g(7)
            lz = w2g(8) * p.x + w2g(9) * p.y + w2g(10) * p.z + w2g(11)
            nx = param(T_GRID).astype(jnp.int32)
            ny = param(T_GRID + 1).astype(jnp.int32)
            nz = param(T_GRID + 2).astype(jnp.int32)
            off = param(T_ATLAS).astype(jnp.int32)
            nxf = jnp.maximum(nx.astype(lx.dtype), 1.0)
            nyf = jnp.maximum(ny.astype(lx.dtype), 1.0)
            nzf = jnp.maximum(nz.astype(lx.dtype), 1.0)
            fx = jnp.clip(lx * nxf - 0.5, 0.0, nxf - 1.0)
            fy = jnp.clip(ly * nyf - 0.5, 0.0, nyf - 1.0)
            fz = jnp.clip(lz * nzf - 0.5, 0.0, nzf - 1.0)
            x0 = fx.astype(jnp.int32)
            y0 = fy.astype(jnp.int32)
            z0 = fz.astype(jnp.int32)
            x1 = jnp.minimum(x0 + 1, nx - 1)
            y1 = jnp.minimum(y0 + 1, ny - 1)
            z1 = jnp.minimum(z0 + 1, nz - 1)
            tx = fx - x0.astype(lx.dtype)
            ty = fy - y0.astype(lx.dtype)
            tz = fz - z0.astype(lx.dtype)

            def at(x, y, z):
                lin = jnp.clip(off + (z * ny + y) * nx + x, 0,
                               sa.tex_atlas_r.shape[0] - 1)
                return Vec3(sa.tex_atlas_r[lin], sa.tex_atlas_g[lin],
                            sa.tex_atlas_b[lin])
            c00 = at(x0, y0, z0) * (1 - tx) + at(x1, y0, z0) * tx
            c10 = at(x0, y1, z0) * (1 - tx) + at(x1, y1, z0) * tx
            c01 = at(x0, y0, z1) * (1 - tx) + at(x1, y0, z1) * tx
            c11 = at(x0, y1, z1) * (1 - tx) + at(x1, y1, z1) * tx
            c0 = c00 * (1 - ty) + c10 * ty
            c1 = c01 * (1 - ty) + c11 * ty
            val = c0 * (1 - tz) + c1 * tz
        elif tid == TEX_MESHATTR and b_u is not None and prim is not None \
                and getattr(sa, "mesh_attr", None) is not None:
            # barycentric interpolation of the packed per-vertex attribute
            # (reference mesh_attribute.cpp eval); scale at T_COLOR0
            t_total = sa.mesh_attr.shape[1]
            pr = jnp.clip(prim, 0, t_total - 1)
            bw = 1.0 - b_u - b_v
            val = Vec3(
                bw * sa.mesh_attr[0, pr] + b_u * sa.mesh_attr[3, pr]
                + b_v * sa.mesh_attr[6, pr],
                bw * sa.mesh_attr[1, pr] + b_u * sa.mesh_attr[4, pr]
                + b_v * sa.mesh_attr[7, pr],
                bw * sa.mesh_attr[2, pr] + b_u * sa.mesh_attr[5, pr]
                + b_v * sa.mesh_attr[8, pr]) * param(T_COLOR0)
        elif tid in (TEX_VOLUME, TEX_MESHATTR):
            # no SI context at this call site: fall back to a neutral gray
            h = jnp.full_like(uv_u, 0.5)
            val = Vec3(h, h, h)
        else:
            continue
        out = where3(lane_type == tid, val, out)
    return out


__all__ = ["Texture", "Checkerboard", "BitmapTexture", "MeshAttribute",
           "VolumeTexture", "eval_texture", "N_TEX_PARAMS",
           "TEX_CHECKERBOARD", "TEX_BITMAP", "TEX_VOLUME", "TEX_MESHATTR",
           "T_COLOR0", "T_COLOR1", "T_UVSCALE", "T_ATLAS", "T_GRID",
           "T_W2G"]
