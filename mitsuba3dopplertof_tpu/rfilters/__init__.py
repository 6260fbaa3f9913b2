"""Reconstruction filter plugins (reference src/rfilters/*.cpp).

Each filter exposes a continuous ``eval(x)`` (jnp) used inside the jitted
film splat — the JIT path of the reference also uses continuous evaluation
(reference src/render/imageblock.cpp:306-312), so results match.
"""

from __future__ import annotations

import math

import jax.numpy as jnp

from ..core.properties import Properties, register_plugin


class ReconstructionFilter:
    radius = 1.0
    is_box = False

    def __init__(self, props: Properties):
        pass

    def eval(self, x):
        raise NotImplementedError


@register_plugin("rfilter", "box")
class BoxFilter(ReconstructionFilter):
    is_box = True

    def __init__(self, props: Properties):
        super().__init__(props)
        self.radius = props.get_float("radius", 0.5)

    def eval(self, x):
        return jnp.where(jnp.abs(x) <= self.radius, 1.0, 0.0)


@register_plugin("rfilter", "tent")
class TentFilter(ReconstructionFilter):
    """reference src/rfilters/tent.cpp: max(0, 1 - |x| / radius)."""

    def __init__(self, props: Properties):
        super().__init__(props)
        self.radius = props.get_float("radius", 1.0)

    def eval(self, x):
        return jnp.maximum(0.0, 1.0 - jnp.abs(x / self.radius))


@register_plugin("rfilter", "gaussian")
class GaussianFilter(ReconstructionFilter):
    """reference src/rfilters/gaussian.cpp: clamped Gaussian, default σ=0.5,
    radius 4σ."""

    def __init__(self, props: Properties):
        super().__init__(props)
        self.stddev = props.get_float("stddev", 0.5)
        self.radius = 4.0 * self.stddev

    def eval(self, x):
        alpha = -1.0 / (2.0 * self.stddev ** 2)
        bound = math.exp(alpha * self.radius ** 2)
        return jnp.maximum(0.0, jnp.exp(alpha * x * x) - bound)


@register_plugin("rfilter", "mitchell")
class MitchellFilter(ReconstructionFilter):
    """reference src/rfilters/mitchell.cpp (B=C=1/3)."""

    def __init__(self, props: Properties):
        super().__init__(props)
        self.b = props.get_float("B", 1.0 / 3.0)
        self.c = props.get_float("C", 1.0 / 3.0)
        self.radius = 2.0

    def eval(self, x):
        x = jnp.abs(x)
        x2 = x * x
        x3 = x2 * x
        b, c = self.b, self.c
        p1 = ((12.0 - 9.0 * b - 6.0 * c) * x3
              + (-18.0 + 12.0 * b + 6.0 * c) * x2 + (6.0 - 2.0 * b)) / 6.0
        p2 = ((-b - 6.0 * c) * x3 + (6.0 * b + 30.0 * c) * x2
              + (-12.0 * b - 48.0 * c) * x + (8.0 * b + 24.0 * c)) / 6.0
        return jnp.where(x < 1.0, p1, jnp.where(x < 2.0, p2, 0.0))


@register_plugin("rfilter", "catmullrom")
class CatmullRomFilter(MitchellFilter):
    """Mitchell with B=0, C=0.5 (reference src/rfilters/catmullrom.cpp)."""

    def __init__(self, props: Properties):
        ReconstructionFilter.__init__(self, props)
        self.b = 0.0
        self.c = 0.5
        self.radius = 2.0


@register_plugin("rfilter", "lanczos")
class LanczosFilter(ReconstructionFilter):
    """reference src/rfilters/lanczos.cpp: sinc(x)·sinc(x/lobes)."""

    def __init__(self, props: Properties):
        super().__init__(props)
        self.lobes = props.get_int("lobes", 3)
        self.radius = float(self.lobes)

    def eval(self, x):
        pix = jnp.pi * x
        pixl = pix / self.lobes
        sinc = jnp.where(jnp.abs(pix) < 1e-5, 1.0,
                         jnp.sin(pix) / jnp.where(jnp.abs(pix) < 1e-5, 1.0, pix))
        sincl = jnp.where(jnp.abs(pixl) < 1e-5, 1.0,
                          jnp.sin(pixl) / jnp.where(jnp.abs(pixl) < 1e-5, 1.0, pixl))
        return jnp.where(jnp.abs(x) < self.radius, sinc * sincl, 0.0)


__all__ = ["ReconstructionFilter", "BoxFilter", "TentFilter", "GaussianFilter",
           "MitchellFilter", "CatmullRomFilter", "LanczosFilter"]
