"""Film plugins + the scatter-add image block.

The reference accumulates weighted samples into a flat tensor with
dr::scatter_reduce (reference src/render/imageblock.cpp:119-127,174-400) and
develops rgb = value / weight (reference src/films/hdrfilm.cpp:305+).
TPU-native equivalent: a functional splat that scatter-adds the separable
KxK filter footprint with jnp ``.at[].add`` — XLA lowers this to on-chip
sorted scatter; determinism comes from XLA's fixed reduction order.
"""

from __future__ import annotations

import math
from typing import Tuple

import numpy as np
import jax.numpy as jnp

from ..core.properties import Properties, register_plugin


class Film:
    def __init__(self, props: Properties):
        self.id = props.id
        self.width = props.get_int("width", 768)
        self.height = props.get_int("height", 576)
        self.pixel_format = props.get_string("pixel_format", "rgb")
        self.file_format = props.get_string("file_format", "openexr")
        props.get_string("component_format", "float16")
        self.crop_offset = (props.get_int("crop_offset_x", 0),
                            props.get_int("crop_offset_y", 0))
        self.crop_size = (props.get_int("crop_width", self.width),
                          props.get_int("crop_height", self.height))
        self.sample_border = props.get_bool("sample_border", False)
        self.rfilter = None
        for key in list(props.keys()):
            v = props.get(key)
            from ..rfilters import ReconstructionFilter
            if isinstance(v, ReconstructionFilter):
                self.rfilter = v
        if self.rfilter is None:
            from ..rfilters import GaussianFilter
            self.rfilter = GaussianFilter(Properties("gaussian"))

    @property
    def size(self) -> Tuple[int, int]:
        return (self.width, self.height)

    @property
    def has_alpha(self) -> bool:
        return "a" in self.pixel_format.lower()

    @property
    def channel_count(self) -> int:
        # RGB + [A] + W (reference hdrfilm develop: base_ch = alpha ? 5 : 4)
        return 5 if self.has_alpha else 4


@register_plugin("film", "hdrfilm")
class HDRFilm(Film):
    pass


# ---------------------------------------------------------------------------
# Device-side image block
# ---------------------------------------------------------------------------

def block_create(width: int, height: int, n_channels: int, dtype=jnp.float32):
    return jnp.zeros((height, width, n_channels), dtype=dtype)


def block_put(block, rfilter, pos, values, active):
    """Splat ``values`` (N, C) at continuous film positions ``pos`` (N, 2)
    through the reconstruction filter (reference imageblock.cpp:174-400,
    JIT/non-coalesced path with continuous filter eval).

    For the box filter the caller passes integer pixel centers and we take
    the 1-tap fast path (reference imageblock.cpp:208-233).
    """
    H, W, C = block.shape
    n = pos.shape[0]
    values = jnp.where(active[:, None], values, 0.0)

    if rfilter.is_box:
        px = jnp.floor(pos[:, 0]).astype(jnp.int32)
        py = jnp.floor(pos[:, 1]).astype(jnp.int32)
        ok = active & (px >= 0) & (px < W) & (py >= 0) & (py < H)
        px = jnp.clip(px, 0, W - 1)
        py = jnp.clip(py, 0, H - 1)
        vals = jnp.where(ok[:, None], values, 0.0)
        return block.at[py, px].add(vals)

    radius = float(rfilter.radius)
    count = int(math.ceil(2.0 * radius))

    # reference imageblock.cpp:263-270: pos_f = pos - 0.5 (no border/offset),
    # footprint [ceil(pos_f - r), ...] with `count` conservative taps
    pos_f = pos - 0.5
    lo = jnp.ceil(pos_f - radius).astype(jnp.int32)
    hi = jnp.floor(pos_f + radius).astype(jnp.int32)
    rel = lo.astype(pos.dtype) - pos_f

    wx = []
    wy = []
    for k in range(count):
        wx.append(rfilter.eval(rel[:, 0] + k))
        wy.append(rfilter.eval(rel[:, 1] + k))

    for dy in range(count):
        yy = lo[:, 1] + dy
        ay = active & (yy <= hi[:, 1]) & (yy >= 0) & (yy < H)
        for dx in range(count):
            xx = lo[:, 0] + dx
            a2 = ay & (xx <= hi[:, 0]) & (xx >= 0) & (xx < W)
            w = wx[dx] * wy[dy]
            vals = jnp.where(a2[:, None], values * w[:, None], 0.0)
            block = block.at[jnp.clip(yy, 0, H - 1),
                             jnp.clip(xx, 0, W - 1)].add(vals)
    return block


def develop(block, has_alpha: bool):
    """rgb = value / weight (reference hdrfilm.cpp:305+)."""
    weight_idx = 4 if has_alpha else 3
    w = block[..., weight_idx:weight_idx + 1]
    vals = block[..., :weight_idx]
    return jnp.where(w > 0.0, vals / jnp.where(w > 0.0, w, 1.0), 0.0)


__all__ = ["Film", "HDRFilm", "block_create", "block_put", "develop"]
