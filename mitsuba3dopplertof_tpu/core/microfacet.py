"""GGX/Beckmann microfacet distributions with visible-normal sampling
(reference include/mitsuba/render/microfacet.h), component-wise."""

from __future__ import annotations

import jax.numpy as jnp

from .vec import Vec3, dot, normalize
from .math import PI, TWO_PI


def ggx_D(m: Vec3, alpha_u, alpha_v):
    """GGX normal distribution (reference microfacet.h eval)."""
    c2 = m.z * m.z
    t = (m.x * m.x) / (alpha_u * alpha_u) + (m.y * m.y) / (alpha_v * alpha_v) + c2
    result = 1.0 / (PI * alpha_u * alpha_v * t * t)
    return jnp.where(m.z > 0.0, result, 0.0)


def beckmann_D(m: Vec3, alpha_u, alpha_v):
    c2 = m.z * m.z
    arg = -((m.x * m.x) / (alpha_u * alpha_u)
            + (m.y * m.y) / (alpha_v * alpha_v)) / jnp.maximum(c2, 1e-12)
    result = jnp.exp(arg) / (PI * alpha_u * alpha_v
                             * jnp.maximum(c2 * c2, 1e-20))
    return jnp.where(m.z > 0.0, result, 0.0)


def ggx_smith_g1(v: Vec3, m: Vec3, alpha_u, alpha_v):
    """Smith masking-shadowing for GGX (reference microfacet.h smith_g1)."""
    xy_alpha2 = (alpha_u * v.x) ** 2 + (alpha_v * v.y) ** 2
    tan2 = xy_alpha2 / jnp.maximum(v.z * v.z, 1e-20)
    g = 2.0 / (1.0 + jnp.sqrt(1.0 + tan2))
    # perpendicular incidence / backside guards
    g = jnp.where(xy_alpha2 == 0.0, 1.0, g)
    g = jnp.where(dot(v, m) * v.z <= 0.0, 0.0, g)
    return g


def ggx_sample_vndf(wi: Vec3, alpha_u, alpha_v, s1, s2):
    """Sample the GGX distribution of visible normals (Heitz 2018), the
    reference's sample_visible=true path. Returns (m, pdf)."""
    # stretch
    vh = normalize(Vec3(alpha_u * wi.x, alpha_v * wi.y, wi.z))
    # orthonormal basis around vh
    lensq = vh.x * vh.x + vh.y * vh.y
    inv = jnp.where(lensq > 1e-12, 1.0 / jnp.sqrt(jnp.maximum(lensq, 1e-20)), 0.0)
    t1 = Vec3(-vh.y * inv, vh.x * inv, jnp.zeros_like(vh.z))
    t1 = Vec3(jnp.where(lensq > 1e-12, t1.x, 1.0),
              jnp.where(lensq > 1e-12, t1.y, 0.0), t1.z)
    t2 = Vec3(vh.y * t1.z - vh.z * t1.y,
              vh.z * t1.x - vh.x * t1.z,
              vh.x * t1.y - vh.y * t1.x)
    # parameterize projected area
    r = jnp.sqrt(s1)
    phi = TWO_PI * s2
    p1 = r * jnp.cos(phi)
    p2 = r * jnp.sin(phi)
    ss = 0.5 * (1.0 + vh.z)
    p2 = (1.0 - ss) * jnp.sqrt(jnp.maximum(1.0 - p1 * p1, 0.0)) + ss * p2
    p3 = jnp.sqrt(jnp.maximum(1.0 - p1 * p1 - p2 * p2, 0.0))
    nh = t1 * p1 + t2 * p2 + vh * p3
    # unstretch
    m = normalize(Vec3(alpha_u * nh.x, alpha_v * nh.y,
                       jnp.maximum(nh.z, 1e-6)))
    pdf = ggx_pdf_visible(wi, m, alpha_u, alpha_v)
    return m, pdf


def ggx_pdf_visible(wi: Vec3, m: Vec3, alpha_u, alpha_v):
    """pdf of sample_vndf: G1(wi) * |wi.m| * D(m) / |cos_theta_i|."""
    d = ggx_D(m, alpha_u, alpha_v)
    g1 = ggx_smith_g1(wi, m, alpha_u, alpha_v)
    return g1 * jnp.abs(dot(wi, m)) * d / jnp.maximum(jnp.abs(wi.z), 1e-12)


def ggx_G(wi: Vec3, wo: Vec3, m: Vec3, alpha_u, alpha_v):
    return (ggx_smith_g1(wi, m, alpha_u, alpha_v)
            * ggx_smith_g1(wo, m, alpha_u, alpha_v))


__all__ = ["ggx_D", "beckmann_D", "beckmann_smith_g1",
           "beckmann_sample", "beckmann_pdf", "beckmann_G",
           "ggx_smith_g1", "ggx_sample_vndf",
           "ggx_pdf_visible", "ggx_G"]


def beckmann_smith_g1(v: Vec3, m: Vec3, alpha_u, alpha_v):
    """Smith masking for Beckmann (reference microfacet.h smith_g1,
    Walter et al. 2007 rational approximation), anisotropic via the
    projected roughness."""
    xy_alpha2 = (alpha_u * v.x) ** 2 + (alpha_v * v.y) ** 2
    tan2 = xy_alpha2 / jnp.maximum(v.z * v.z, 1e-20)
    a = 1.0 / jnp.sqrt(jnp.maximum(tan2, 1e-20))
    g = jnp.where(a >= 1.6, 1.0,
                  (3.535 * a + 2.181 * a * a)
                  / jnp.maximum(1.0 + 2.276 * a + 2.577 * a * a, 1e-12))
    g = jnp.where(xy_alpha2 == 0.0, 1.0, g)
    g = jnp.where(dot(v, m) * v.z <= 0.0, 0.0, g)
    return g


def beckmann_sample(alpha_u, alpha_v, s1, s2):
    """Classic full-D(m)·cos sampling of the anisotropic Beckmann
    distribution (reference sample_visible=false mode; Walter et al.
    slope-space form). Returns (m, pdf)."""
    r = jnp.sqrt(jnp.maximum(-jnp.log(jnp.maximum(1.0 - s1, 1e-20)), 0.0))
    phi = TWO_PI * s2
    sx = r * jnp.cos(phi) * alpha_u
    sy = r * jnp.sin(phi) * alpha_v
    inv = 1.0 / jnp.sqrt(sx * sx + sy * sy + 1.0)
    m = Vec3(-sx * inv, -sy * inv, inv)
    return m, beckmann_pdf(m, alpha_u, alpha_v)


def beckmann_pdf(m: Vec3, alpha_u, alpha_v):
    """pdf of beckmann_sample: D(m) * cos_theta_m."""
    return beckmann_D(m, alpha_u, alpha_v) * jnp.maximum(m.z, 0.0)


def beckmann_G(wi: Vec3, wo: Vec3, m: Vec3, alpha_u, alpha_v):
    return (beckmann_smith_g1(wi, m, alpha_u, alpha_v)
            * beckmann_smith_g1(wo, m, alpha_u, alpha_v))
