"""Catmull-Rom spline evaluation / integration / inversion
(reference include/mitsuba/core/spline.h).

The cubic on each interval uses the standard Catmull-Rom endpoint
derivatives (one-sided at the boundaries; non-uniform nodes use the
reference's weighted differences, spline.h:273-299). All entry points are
vectorized jnp over per-lane query arrays with static (host numpy) tables.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp


def eval_spline(f0, f1, d0, d1, t):
    """Cubic Hermite on [0,1] (spline.h:97-109)."""
    t2 = t * t
    t3 = t2 * t
    return ((2.0 * t3 - 3.0 * t2 + 1.0) * f0
            + (-2.0 * t3 + 3.0 * t2) * f1
            + (t3 - 2.0 * t2 + t) * d0 + (t3 - t2) * d1)


def _derivs_uniform(values):
    v = np.asarray(values, np.float64)
    d = np.empty_like(v)
    d[1:-1] = 0.5 * (v[2:] - v[:-2])
    d[0] = v[1] - v[0]
    d[-1] = v[-1] - v[-2]
    return d


def eval_1d(vmin, vmax, values, x):
    """Catmull-Rom eval on a uniform grid (spline.h:214-239); zero outside
    the domain."""
    v = np.asarray(values, np.float64)
    n = v.size
    d = _derivs_uniform(v)
    vt = jnp.asarray(v, jnp.float32)
    dt = jnp.asarray(d, jnp.float32)
    t_all = (x - vmin) / (vmax - vmin) * (n - 1)
    i = jnp.clip(t_all.astype(jnp.int32), 0, n - 2)
    t = t_all - i.astype(jnp.float32)
    r = eval_spline(vt[i], vt[i + 1], dt[i], dt[i + 1], t)
    valid = (x >= vmin) & (x <= vmax)
    return jnp.where(valid, r, 0.0)


def integrate_1d(vmin, vmax, values):
    """Antiderivative at the nodes (spline.h:327-344): per-interval
    integral of the Hermite cubic = h*( (f0+f1)/2 + (d0-d1)/12 ).
    Returns a numpy array (host table, feeds sample_1d/invert_1d)."""
    v = np.asarray(values, np.float64)
    n = v.size
    d = _derivs_uniform(v)
    h = (vmax - vmin) / (n - 1)
    seg = h * (0.5 * (v[:-1] + v[1:]) + (d[:-1] - d[1:]) / 12.0)
    return np.concatenate([[0.0], np.cumsum(seg)])


def invert_1d(vmin, vmax, values, y, n_iter: int = 16):
    """Solve eval_1d(..., x) = y for monotone splines (spline.h:399-450)
    by bisection per lane."""
    v = np.asarray(values, np.float64)
    lo = jnp.full_like(y, vmin)
    hi = jnp.full_like(y, vmax)
    increasing = bool(v[-1] >= v[0])
    for _ in range(n_iter):
        mid = 0.5 * (lo + hi)
        fm = eval_1d(vmin, vmax, v, mid)
        go_hi = (fm < y) if increasing else (fm > y)
        lo = jnp.where(go_hi, mid, lo)
        hi = jnp.where(go_hi, hi, mid)
    return 0.5 * (lo + hi)


def sample_1d(vmin, vmax, values, u, n_iter: int = 16):
    """Sample proportionally to a non-negative spline (spline.h:458-530):
    invert the spline CDF by bisection. Returns (x, pdf_normalized)."""
    v = np.asarray(values, np.float64)
    cdf_nodes = integrate_1d(vmin, vmax, v)
    total = cdf_nodes[-1]
    if total <= 0:
        raise RuntimeError("sample_1d: non-positive integral")
    target = u * np.float32(total)
    # bisection over the continuous CDF F(x) = int_a^x f
    lo = jnp.full_like(u, vmin)
    hi = jnp.full_like(u, vmax)
    n = v.size
    h = (vmax - vmin) / (n - 1)
    d = _derivs_uniform(v)
    vt = jnp.asarray(v, jnp.float32)
    dt = jnp.asarray(d, jnp.float32)
    ct = jnp.asarray(cdf_nodes, jnp.float32)

    def F(x):
        t_all = (x - vmin) / (vmax - vmin) * (n - 1)
        i = jnp.clip(t_all.astype(jnp.int32), 0, n - 2)
        t = jnp.clip(t_all - i.astype(jnp.float32), 0.0, 1.0)
        f0, f1 = vt[i], vt[i + 1]
        d0, d1 = dt[i], dt[i + 1]
        t2 = t * t
        t3 = t2 * t
        t4 = t3 * t
        # integral of the Hermite basis over [0, t], scaled by h
        part = (f0 * (0.5 * t4 - t3 + t)
                + f1 * (-0.5 * t4 + t3)
                + d0 * (0.25 * t4 - (2.0 / 3.0) * t3 + 0.5 * t2)
                + d1 * (0.25 * t4 - t3 / 3.0))
        return ct[i] + h * part

    for _ in range(n_iter):
        mid = 0.5 * (lo + hi)
        go_hi = F(mid) < target
        lo = jnp.where(go_hi, mid, lo)
        hi = jnp.where(go_hi, hi, mid)
    x = 0.5 * (lo + hi)
    pdf = eval_1d(vmin, vmax, v, x) / np.float32(total)
    return x, pdf


__all__ = ["eval_spline", "eval_1d", "integrate_1d", "invert_1d",
           "sample_1d"]
