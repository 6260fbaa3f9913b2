"""Small vector-math helpers shared across the renderer.

Everything here operates on jnp arrays whose last axis is the vector
dimension (shape ``(..., 3)``), which keeps the wavefront SoA-friendly and
lets XLA fuse across lanes.
"""

from __future__ import annotations

import jax.numpy as jnp

EPS = jnp.float32(1e-7)
RAY_EPS = jnp.float32(1e-4)       # spawn-ray offset (reference math::RayEpsilon)
INV_PI = jnp.float32(0.31830988618379067154)
PI = jnp.float32(3.14159265358979323846)
TWO_PI = jnp.float32(6.28318530717958647692)
INF = jnp.float32(jnp.inf)


def dot(a, b, keepdims=False):
    return jnp.sum(a * b, axis=-1, keepdims=keepdims)


def cross(a, b):
    return jnp.cross(a, b)


def norm(a, keepdims=False):
    return jnp.sqrt(jnp.maximum(dot(a, a, keepdims=keepdims), 0.0))


def normalize(a):
    return a / jnp.maximum(norm(a, keepdims=True), EPS)


def safe_rcp(x):
    return jnp.where(x != 0.0, 1.0 / jnp.where(x != 0.0, x, 1.0), 0.0)


def safe_sqrt(x):
    return jnp.sqrt(jnp.maximum(x, 0.0))


def sqr(x):
    return x * x


def fmadd(a, b, c):
    return a * b + c


def lerp(a, b, t):
    return a * (1.0 - t) + b * t


def mis_weight_power(pdf_a, pdf_b):
    """Power heuristic (β=2) with the reference's non-finite guard
    (reference src/integrators/dopplertofpath.cpp:296-301)."""
    a2 = pdf_a * pdf_a
    b2 = pdf_b * pdf_b
    w = a2 / (a2 + b2)
    return jnp.where(jnp.isfinite(w), w, 0.0)


def coordinate_system(n):
    """Build an orthonormal basis around unit normal ``n`` (Duff et al. 2017,
    the same construction as the reference's mitsuba::coordinate_system)."""
    sign = jnp.where(n[..., 2] >= 0.0, 1.0, -1.0)
    a = -1.0 / (sign + n[..., 2])
    b = n[..., 0] * n[..., 1] * a
    s = jnp.stack([
        1.0 + sign * n[..., 0] * n[..., 0] * a,
        sign * b,
        -sign * n[..., 0],
    ], axis=-1)
    t = jnp.stack([
        b,
        sign + n[..., 1] * n[..., 1] * a,
        -n[..., 1],
    ], axis=-1)
    return s, t


class Frame:
    """Shading frame: local z = normal. Stateless helpers over packed arrays."""

    @staticmethod
    def to_local(s, t, n, v):
        return jnp.stack([dot(v, s), dot(v, t), dot(v, n)], axis=-1)

    @staticmethod
    def to_world(s, t, n, v):
        return (v[..., 0:1] * s + v[..., 1:2] * t + v[..., 2:3] * n)

    @staticmethod
    def cos_theta(v):
        return v[..., 2]


__all__ = [
    "EPS", "RAY_EPS", "INV_PI", "PI", "TWO_PI", "INF",
    "dot", "cross", "norm", "normalize", "safe_rcp", "safe_sqrt", "sqr",
    "fmadd", "lerp", "mis_weight_power", "coordinate_system", "Frame",
]


def rlgamma(a, x):
    """Regularized lower incomplete gamma function P(a, x)
    (reference src/python/python/math.py rlgamma — the chi2 test's
    p-value kernel). Scalar python floats, no scipy."""
    from ..utils.chi2 import _gammainc_upper_reg
    return 1.0 - _gammainc_upper_reg(float(a), float(x))
