"""Sampling warps (square -> hemisphere/disk/...) used by BSDFs and emitters.

Semantics match the reference's include/mitsuba/core/warp.h; implementations
are independent, vectorized jnp over (..., 2) sample arrays.
"""

from __future__ import annotations

import jax.numpy as jnp

from .math import INV_PI, PI, TWO_PI, safe_sqrt


# ---------------------------------------------------------------------------
# Component-wise variants ((N,) inputs -> Vec3 / (N,) outputs) — the hot path
# ---------------------------------------------------------------------------

def disk_concentric_c(sx, sy):
    from .vec import Vec3
    x = 2.0 * sx - 1.0
    y = 2.0 * sy - 1.0
    is_zero = (x == 0.0) & (y == 0.0)
    q13 = jnp.abs(x) < jnp.abs(y)
    r = jnp.where(q13, y, x)
    rp = jnp.where(q13, x, y)
    phi = 0.25 * PI * rp / jnp.where(r == 0.0, 1.0, r)
    phi = jnp.where(q13, 0.5 * PI - phi, phi)
    phi = jnp.where(is_zero, 0.0, phi)
    return r * jnp.cos(phi), r * jnp.sin(phi)


def cosine_hemisphere_c(sx, sy):
    """Cosine-weighted hemisphere, component-wise; returns Vec3."""
    from .vec import Vec3
    px, py = disk_concentric_c(sx, sy)
    z = safe_sqrt(1.0 - px * px - py * py)
    return Vec3(px, py, z)


def uniform_sphere_c(sx, sy):
    from .vec import Vec3
    z = 1.0 - 2.0 * sy
    r = safe_sqrt(1.0 - z * z)
    phi = TWO_PI * sx
    return Vec3(r * jnp.cos(phi), r * jnp.sin(phi), z)


def square_to_uniform_disk_concentric(sample):
    """Low-distortion concentric square->disk (Shirley-Chiu), matching
    reference warp.h square_to_uniform_disk_concentric."""
    x = 2.0 * sample[..., 0] - 1.0
    y = 2.0 * sample[..., 1] - 1.0
    is_zero = (x == 0.0) & (y == 0.0)
    quadrant_1_or_3 = jnp.abs(x) < jnp.abs(y)
    r = jnp.where(quadrant_1_or_3, y, x)
    rp = jnp.where(quadrant_1_or_3, x, y)
    phi = 0.25 * PI * rp / jnp.where(r == 0.0, 1.0, r)
    phi = jnp.where(quadrant_1_or_3, 0.5 * PI - phi, phi)
    phi = jnp.where(is_zero, 0.0, phi)
    return jnp.stack([r * jnp.cos(phi), r * jnp.sin(phi)], axis=-1)


def square_to_cosine_hemisphere(sample):
    """Cosine-weighted hemisphere via concentric disk + projection
    (reference warp.h square_to_cosine_hemisphere)."""
    p = square_to_uniform_disk_concentric(sample)
    z = safe_sqrt(1.0 - p[..., 0] * p[..., 0] - p[..., 1] * p[..., 1])
    return jnp.concatenate([p, z[..., None]], axis=-1)


def square_to_cosine_hemisphere_pdf(v):
    return INV_PI * jnp.maximum(v[..., 2], 0.0)


def square_to_uniform_sphere(sample):
    z = 1.0 - 2.0 * sample[..., 1]
    r = safe_sqrt(1.0 - z * z)
    phi = TWO_PI * sample[..., 0]
    return jnp.stack([r * jnp.cos(phi), r * jnp.sin(phi), z], axis=-1)


def square_to_uniform_sphere_pdf():
    return 1.0 / (4.0 * PI)


def square_to_uniform_hemisphere(sample):
    p = square_to_uniform_disk_concentric(sample)
    z = 1.0 - p[..., 0] * p[..., 0] - p[..., 1] * p[..., 1]
    p = p * safe_sqrt(z + 1.0)[..., None]
    return jnp.concatenate([p, z[..., None]], axis=-1)


def square_to_uniform_hemisphere_pdf():
    return 1.0 / (2.0 * PI)


def square_to_uniform_triangle(sample):
    t = safe_sqrt(1.0 - sample[..., 0])
    return jnp.stack([1.0 - t, t * sample[..., 1]], axis=-1)


def square_to_uniform_cone(sample, cos_cutoff):
    """Uniform direction in a cone around +Z with given cosine cutoff."""
    cos_theta = (1.0 - sample[..., 1]) + sample[..., 1] * cos_cutoff
    sin_theta = safe_sqrt(1.0 - cos_theta * cos_theta)
    phi = TWO_PI * sample[..., 0]
    return jnp.stack(
        [jnp.cos(phi) * sin_theta, jnp.sin(phi) * sin_theta, cos_theta],
        axis=-1)


def square_to_uniform_cone_pdf(cos_cutoff):
    return 1.0 / (TWO_PI * (1.0 - cos_cutoff))


def interval_to_tent(sample):
    """Map [0,1) to a tent distribution on [-1, 1] (used by tent-filter
    importance sampling in the reference; kept for parity)."""
    sign = jnp.where(sample < 0.5, 1.0, -1.0)
    sample = jnp.where(sample < 0.5, 2.0 * sample, 2.0 * (1.0 - sample))
    return sign * (1.0 - safe_sqrt(sample))


__all__ = [
    "square_to_uniform_disk_concentric", "square_to_cosine_hemisphere",
    "square_to_cosine_hemisphere_pdf", "square_to_uniform_sphere",
    "square_to_uniform_sphere_pdf", "square_to_uniform_hemisphere",
    "square_to_uniform_hemisphere_pdf", "square_to_uniform_triangle",
    "square_to_uniform_cone", "square_to_uniform_cone_pdf", "interval_to_tent",
]
