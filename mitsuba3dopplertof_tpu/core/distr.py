"""General sampling distributions (reference include/mitsuba/core/
distr_1d.h and distr_2d.h).

All operations are vectorized jnp over per-lane sample arrays; tables are
static (host numpy at construction). These are the general-purpose
counterparts of the specialized warps used by the measured BSDF and
tabulated phase function:

  * DiscreteDistribution            (distr_1d.h DiscreteDistribution)
  * ContinuousDistribution          (distr_1d.h, uniform grid, linear pdf,
                                     trapezoid CDF with exact quadratic
                                     segment inversion)
  * IrregularContinuousDistribution (distr_1d.h, arbitrary nodes)
  * Marginal2D                      (distr_2d.h:838, marginal-then-
                                     conditional inversion of a bilinear
                                     density; no auxiliary param dims)
  * Hierarchical2D                  (distr_2d.h:344, mip-pyramid quadrant
                                     descent producing stratification-
                                     preserving warps)
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp


class DiscreteDistribution:
    """pmf over {0..N-1} (reference distr_1d.h DiscreteDistribution)."""

    def __init__(self, pmf):
        pmf = np.asarray(pmf, np.float64)
        if (pmf < 0).any() or pmf.sum() <= 0:
            raise RuntimeError("DiscreteDistribution: invalid pmf")
        self.sum = float(pmf.sum())
        self.pmf = jnp.asarray(pmf / self.sum, jnp.float32)
        self.cdf = jnp.asarray(np.cumsum(pmf) / self.sum, jnp.float32)
        self.n = int(pmf.size)

    def sample(self, u):
        return jnp.clip(jnp.searchsorted(self.cdf, u, side="right"),
                        0, self.n - 1).astype(jnp.int32)

    def sample_reuse(self, u):
        """(index, rescaled u) — reuses the sample like the reference's
        sample_reuse (distr_1d.h)."""
        i = self.sample(u)
        lo = jnp.where(i > 0, self.cdf[jnp.maximum(i - 1, 0)], 0.0)
        w = jnp.maximum(self.cdf[i] - lo, 1e-12)
        return i, jnp.clip((u - lo) / w, 0.0, 1.0)

    def eval_pmf_normalized(self, i):
        return self.pmf[jnp.clip(i, 0, self.n - 1)]


class ContinuousDistribution:
    """Piecewise-linear pdf on a uniform grid over [a, b]
    (reference distr_1d.h ContinuousDistribution)."""

    def __init__(self, range_, values):
        v = np.asarray(values, np.float64)
        if v.size < 2 or (v < 0).any() or v.max() <= 0:
            raise RuntimeError("ContinuousDistribution: invalid values")
        self.a, self.b = float(range_[0]), float(range_[1])
        self.values = jnp.asarray(v, jnp.float32)
        dx = (self.b - self.a) / (v.size - 1)
        seg = 0.5 * (v[:-1] + v[1:]) * dx
        cdf = np.concatenate([[0.0], np.cumsum(seg)])
        self.integral = float(cdf[-1])
        self.cdf = jnp.asarray(cdf / self.integral, jnp.float32)
        self.dx = dx
        self.n = int(v.size)

    def eval_pdf_normalized(self, x):
        grid = jnp.linspace(self.a, self.b, self.n)
        return jnp.interp(x, grid, self.values) / self.integral

    def sample(self, u):
        """Exact inversion: locate segment, solve the linear-pdf quadratic
        (the same math as the tabulated phase, media.tab_sample)."""
        i = jnp.clip(jnp.searchsorted(self.cdf, u, side="right") - 1,
                     0, self.n - 2)
        f0 = self.values[i]
        f1 = self.values[i + 1]
        a_rem = (u - self.cdf[i]) * self.integral
        slope = (f1 - f0) / self.dx
        disc = jnp.sqrt(jnp.maximum(f0 * f0 + 2.0 * slope * a_rem, 0.0))
        x_lin = jnp.where(jnp.abs(slope) > 1e-9,
                          (disc - f0) / jnp.where(jnp.abs(slope) > 1e-9,
                                                  slope, 1.0),
                          a_rem / jnp.maximum(f0, 1e-12))
        return self.a + i.astype(jnp.float32) * self.dx + jnp.clip(
            x_lin, 0.0, self.dx)


class IrregularContinuousDistribution:
    """Piecewise-linear pdf over arbitrary sorted nodes
    (reference distr_1d.h IrregularContinuousDistribution)."""

    def __init__(self, nodes, values):
        x = np.asarray(nodes, np.float64)
        v = np.asarray(values, np.float64)
        if x.size != v.size or x.size < 2 or (np.diff(x) <= 0).any():
            raise RuntimeError("IrregularContinuousDistribution: bad nodes")
        if (v < 0).any() or v.max() <= 0:
            raise RuntimeError("IrregularContinuousDistribution: bad values")
        seg = 0.5 * (v[:-1] + v[1:]) * np.diff(x)
        cdf = np.concatenate([[0.0], np.cumsum(seg)])
        self.integral = float(cdf[-1])
        self.nodes = jnp.asarray(x, jnp.float32)
        self.values = jnp.asarray(v, jnp.float32)
        self.cdf = jnp.asarray(cdf / self.integral, jnp.float32)
        self.n = int(x.size)

    def eval_pdf_normalized(self, x):
        return jnp.interp(x, self.nodes, self.values) / self.integral

    def sample(self, u):
        i = jnp.clip(jnp.searchsorted(self.cdf, u, side="right") - 1,
                     0, self.n - 2)
        x0 = self.nodes[i]
        dx = self.nodes[i + 1] - x0
        f0 = self.values[i]
        f1 = self.values[i + 1]
        a_rem = (u - self.cdf[i]) * self.integral
        slope = (f1 - f0) / dx
        disc = jnp.sqrt(jnp.maximum(f0 * f0 + 2.0 * slope * a_rem, 0.0))
        x_lin = jnp.where(jnp.abs(slope) > 1e-9,
                          (disc - f0) / jnp.where(jnp.abs(slope) > 1e-9,
                                                  slope, 1.0),
                          a_rem / jnp.maximum(f0, 1e-12))
        return x0 + jnp.clip(x_lin, 0.0, dx)


class Marginal2D:
    """Sample a bilinear density on [0,1]^2 by inverting the marginal over
    y then the conditional over x (reference distr_2d.h:838 Marginal2D
    with continuous conditionals, no auxiliary parameter dimensions)."""

    def __init__(self, data):
        d = np.asarray(data, np.float64)       # (H, W) node values
        if d.ndim != 2 or d.min() < 0 or d.max() <= 0:
            raise RuntimeError("Marginal2D: invalid density")
        H, W = d.shape
        # row line-integrals (trapezoid over x) -> marginal over y
        row = np.trapezoid(d, dx=1.0 / (W - 1), axis=1)
        self._marg = ContinuousDistribution((0.0, 1.0), row)
        self.data = jnp.asarray(d, jnp.float32)
        self.row_int = jnp.asarray(row, jnp.float32)
        self.H, self.W = H, W
        self.integral = self._marg.integral

    def _row_values(self, y):
        """Density values of the H-1 segment rows blended at height y:
        returns (N, W) bilinear slice."""
        fy = jnp.clip(y, 0.0, 1.0) * (self.H - 1)
        iy = jnp.clip(fy.astype(jnp.int32), 0, self.H - 2)
        ty = fy - iy.astype(jnp.float32)
        r0 = self.data[iy]          # (N, W)
        r1 = self.data[iy + 1]
        return r0 * (1.0 - ty)[:, None] + r1 * ty[:, None]

    def sample(self, u1, u2):
        y = self._marg.sample(u1)
        rows = self._row_values(y)                       # (N, W)
        dx = 1.0 / (self.W - 1)
        seg = 0.5 * (rows[:, :-1] + rows[:, 1:]) * dx    # (N, W-1)
        cdf = jnp.concatenate(
            [jnp.zeros((rows.shape[0], 1)), jnp.cumsum(seg, axis=1)],
            axis=1)
        total = jnp.maximum(cdf[:, -1], 1e-20)
        cdf = cdf / total[:, None]
        i = jnp.clip(
            jax.vmap(lambda c, u: jnp.searchsorted(c, u, side="right"))(
                cdf, u2) - 1, 0, self.W - 2)
        take = jax.vmap(lambda a, k: a[k])
        f0 = take(rows, i)
        f1 = take(rows, i + 1)
        a_rem = (u2 - take(cdf, i)) * total
        slope = (f1 - f0) / dx
        disc = jnp.sqrt(jnp.maximum(f0 * f0 + 2.0 * slope * a_rem, 0.0))
        x_lin = jnp.where(jnp.abs(slope) > 1e-9,
                          (disc - f0) / jnp.where(jnp.abs(slope) > 1e-9,
                                                  slope, 1.0),
                          a_rem / jnp.maximum(f0, 1e-12))
        x = i.astype(jnp.float32) * dx + jnp.clip(x_lin, 0.0, dx)
        return x, y

    def eval_pdf(self, x, y):
        """Normalized joint pdf at (x, y) (bilinear interpolation)."""
        fx = jnp.clip(x, 0.0, 1.0) * (self.W - 1)
        ix = jnp.clip(fx.astype(jnp.int32), 0, self.W - 2)
        tx = fx - ix.astype(jnp.float32)
        rows = self._row_values(y)
        take = jax.vmap(lambda a, k: a[k])
        v = take(rows, ix) * (1.0 - tx) + take(rows, ix + 1) * tx
        return v / self.integral


class Hierarchical2D:
    """Hierarchical sample warping over a mip pyramid
    (reference distr_2d.h:344 Hierarchical2D0): descend levels choosing
    the quadrant by conditional mass, rescaling the sample — preserves
    stratification better than marginal inversion. Cell-constant density
    (the reference's bilinear refinement is approximated at the finest
    level by one final in-cell linear warp being uniform)."""

    def __init__(self, data):
        d = np.asarray(data, np.float64)      # (H, W) CELL densities
        H, W = d.shape
        L = int(np.ceil(np.log2(max(H, W))))
        size = 1 << L
        base = np.zeros((size, size))
        base[:H, :W] = d
        self.levels = []                      # coarse..fine cell sums
        cur = base
        pyr = [cur]
        while cur.shape[0] > 1:
            cur = (cur[0::2, 0::2] + cur[0::2, 1::2]
                   + cur[1::2, 0::2] + cur[1::2, 1::2])
            pyr.append(cur)
        self.pyramid = [jnp.asarray(p, jnp.float32) for p in pyr[::-1]]
        self.integral = float(base.sum()) / (H * W)
        self.H, self.W, self.size = H, W, size
        self.base = jnp.asarray(base, jnp.float32)

    def sample(self, u1, u2):
        n = u1.shape[0]
        ix = jnp.zeros((n,), jnp.int32)
        iy = jnp.zeros((n,), jnp.int32)
        for lvl in range(1, len(self.pyramid)):
            p = self.pyramid[lvl]
            ix = ix * 2
            iy = iy * 2
            v00 = p[iy, ix]
            v01 = p[iy, ix + 1]
            v10 = p[iy + 1, ix]
            v11 = p[iy + 1, ix + 1]
            top = v00 + v01
            bot = v10 + v11
            total = jnp.maximum(top + bot, 1e-20)
            p_top = top / total
            go_bot = u1 >= p_top
            u1 = jnp.where(go_bot,
                           (u1 - p_top) / jnp.maximum(1.0 - p_top, 1e-12),
                           u1 / jnp.maximum(p_top, 1e-12))
            iy = jnp.where(go_bot, iy + 1, iy)
            row_l = jnp.where(go_bot, v10, v00)
            row_r = jnp.where(go_bot, v11, v01)
            row_t = jnp.maximum(row_l + row_r, 1e-20)
            p_l = row_l / row_t
            go_r = u2 >= p_l
            u2 = jnp.where(go_r,
                           (u2 - p_l) / jnp.maximum(1.0 - p_l, 1e-12),
                           u2 / jnp.maximum(p_l, 1e-12))
            ix = jnp.where(go_r, ix + 1, ix)
            u1 = jnp.clip(u1, 0.0, 1.0 - 1e-7)
            u2 = jnp.clip(u2, 0.0, 1.0 - 1e-7)
        x = (ix.astype(jnp.float32) + u2) / self.W
        y = (iy.astype(jnp.float32) + u1) / self.H
        return jnp.clip(x, 0.0, 1.0), jnp.clip(y, 0.0, 1.0)

    def eval_pdf(self, x, y):
        ix = jnp.clip((x * self.W).astype(jnp.int32), 0, self.W - 1)
        iy = jnp.clip((y * self.H).astype(jnp.int32), 0, self.H - 1)
        return self.base[iy, ix] / self.integral


__all__ = ["DiscreteDistribution", "ContinuousDistribution",
           "IrregularContinuousDistribution", "Marginal2D",
           "Hierarchical2D"]
