"""Chi-square goodness-of-fit test framework for sample/pdf pairs.

Functional rebuild of the reference's statistical test harness
(reference src/python/python/chi2.py:5-240 ChiSquareTest +
SphericalDomain/PlanarDomain :372-417): draw many samples from a sampling
routine, histogram them over the domain, compare against the integrated pdf
with a chi-square test (with cell pooling for low expected counts).
"""

from __future__ import annotations

import math
from typing import Callable, Tuple

import numpy as np


class SphericalDomain:
    """Maps directions to (cos_theta, phi) — equal-area friendly
    (reference chi2.py:372-390)."""

    def bounds(self):
        return np.array([[-1.0, -math.pi], [1.0, math.pi]])

    def map_forward(self, d):
        # d: (N,3)
        cos_theta = d[:, 2]
        phi = np.arctan2(d[:, 1], d[:, 0])
        return np.stack([cos_theta, phi], axis=-1)

    def map_backward(self, p):
        cos_theta = p[:, 0]
        sin_theta = np.sqrt(np.maximum(1.0 - cos_theta ** 2, 0.0))
        phi = p[:, 1]
        return np.stack([sin_theta * np.cos(phi), sin_theta * np.sin(phi),
                         cos_theta], axis=-1)

    def aspect(self):
        return 2.0


class PlanarDomain:
    """Axis-aligned 2D domain (reference chi2.py:393-417)."""

    def __init__(self, bounds=None):
        self._bounds = (np.asarray(bounds, np.float64)
                        if bounds is not None
                        else np.array([[0.0, 0.0], [1.0, 1.0]]))

    def bounds(self):
        return self._bounds

    def map_forward(self, p):
        return np.asarray(p)

    def map_backward(self, p):
        return np.asarray(p)

    def aspect(self):
        ext = self._bounds[1] - self._bounds[0]
        return ext[0] / ext[1]


class ChiSquareTest:
    """reference chi2.py:5-240. ``sample_func(n) -> domain points``,
    ``pdf_func(points) -> densities``; run() returns True on pass."""

    def __init__(self, domain, sample_func: Callable, pdf_func: Callable,
                 sample_count: int = 1000_000, res: int = 31,
                 ires: int = 8, significance_level: float = 0.01):
        self.domain = domain
        self.sample_func = sample_func
        self.pdf_func = pdf_func
        self.sample_count = sample_count
        self.res = max(res, 2)
        self.ires = max(ires, 2)
        self.significance_level = significance_level
        self.messages = ""

    def tabulate_histogram(self):
        samples = self.sample_func(self.sample_count)
        p = self.domain.map_forward(np.asarray(samples))
        b = self.domain.bounds()
        res_y = self.res
        res_x = int(round(self.res * self.domain.aspect()))
        hist, _, _ = np.histogram2d(
            p[:, 0], p[:, 1], bins=[res_y, res_x],
            range=[[b[0][0], b[1][0]], [b[0][1], b[1][1]]])
        self.histogram = hist
        self.res_x, self.res_y = res_x, res_y
        return hist

    def tabulate_pdf(self):
        """Integrate the pdf over each cell with ires x ires midpoint
        quadrature (the reference uses the same sub-grid refinement)."""
        b = self.domain.bounds()
        res_x, res_y = self.res_x, self.res_y
        ext = b[1] - b[0]
        dx = ext[0] / res_y
        dy = ext[1] / res_x
        sx = (np.arange(self.ires) + 0.5) / self.ires
        pdf = np.zeros((res_y, res_x))
        for i in range(res_y):
            for j in range(res_x):
                xs = b[0][0] + (i + sx) * dx
                ys = b[0][1] + (j + sx) * dy
                X, Y = np.meshgrid(xs, ys, indexing="ij")
                pts = np.stack([X.ravel(), Y.ravel()], axis=-1)
                d = self.domain.map_backward(pts)
                vals = np.asarray(self.pdf_func(d))
                pdf[i, j] = vals.mean() * dx * dy
        self.pdf = pdf * self.sample_count
        return self.pdf

    def run(self) -> bool:
        self.tabulate_histogram()
        self.tabulate_pdf()
        obs = self.histogram.ravel()
        exp = self.pdf.ravel()

        # pool cells with low expected counts (reference chi2 pooling)
        order = np.argsort(exp)
        obs = obs[order]
        exp = exp[order]
        pooled_obs, pooled_exp = [], []
        acc_o = acc_e = 0.0
        for o, e in zip(obs, exp):
            acc_o += o
            acc_e += e
            if acc_e >= 5.0:
                pooled_obs.append(acc_o)
                pooled_exp.append(acc_e)
                acc_o = acc_e = 0.0
        if acc_e > 0 and pooled_exp:
            pooled_obs[-1] += acc_o
            pooled_exp[-1] += acc_e
        pooled_obs = np.asarray(pooled_obs)
        pooled_exp = np.asarray(pooled_exp)
        dof = len(pooled_exp) - 1
        if dof <= 0:
            self.messages = "chi2: insufficient cells"
            return False
        stat = float(np.sum((pooled_obs - pooled_exp) ** 2 / pooled_exp))
        pval = _chi2_sf(stat, dof)
        # Sidak correction happens at the caller level in the reference;
        # single-test here
        ok = pval >= self.significance_level
        self.messages = (f"chi2 stat={stat:.2f} dof={dof} p={pval:.4f} "
                         f"{'PASS' if ok else 'FAIL'}")
        return ok


def _chi2_sf(x: float, k: int) -> float:
    """Survival function of the chi-square distribution via the regularized
    upper incomplete gamma (continued fraction / series, no scipy)."""
    return _gammainc_upper_reg(0.5 * k, 0.5 * x)


def _gammainc_upper_reg(a: float, x: float) -> float:
    if x < 0 or a <= 0:
        return 1.0
    if x == 0:
        return 1.0
    if x < a + 1.0:
        # lower series
        term = 1.0 / a
        total = term
        n = a
        for _ in range(500):
            n += 1.0
            term *= x / n
            total += term
            if abs(term) < abs(total) * 1e-12:
                break
        lower = total * math.exp(-x + a * math.log(x) - math.lgamma(a))
        return max(0.0, 1.0 - lower)
    # continued fraction for upper
    tiny = 1e-300
    b = x + 1.0 - a
    c = 1.0 / tiny
    d = 1.0 / b
    h = d
    for i in range(1, 500):
        an = -i * (i - a)
        b += 2.0
        d = an * d + b
        d = tiny if abs(d) < tiny else d
        c = b + an / c
        c = tiny if abs(c) < tiny else c
        d = 1.0 / d
        delta = d * c
        h *= delta
        if abs(delta - 1.0) < 1e-12:
            break
    return h * math.exp(-x + a * math.log(x) - math.lgamma(a))


__all__ = ["ChiSquareTest", "SphericalDomain", "PlanarDomain"]
