"""Gaussian and Newton-Cotes quadrature rules.

API mirror of the reference's include/mitsuba/core/quad.h: each rule
returns (nodes, weights) as float64 numpy arrays over the canonical
interval [-1, 1]. These are host-side precompute utilities (the reference
likewise computes them eagerly in C++ and hands the tables to kernels);
callers move the constants on-device as needed.

- gauss_legendre(n)      quad.h:27-110
- gauss_lobatto(n)       quad.h:112-186 (includes the endpoints)
- composite_simpson(n)   quad.h:188-234
- composite_simpson_38(n) quad.h:236-282
"""

from __future__ import annotations

import numpy as np

__all__ = ["gauss_legendre", "gauss_lobatto",
           "composite_simpson", "composite_simpson_38"]


def gauss_legendre(n: int):
    """n-point Gauss-Legendre rule: exact for polynomials of degree
    2n-1. Nodes are the roots of P_n."""
    if n < 1:
        raise ValueError("gauss_legendre(): n must be >= 1")
    nodes, weights = np.polynomial.legendre.leggauss(int(n))
    return nodes.astype(np.float64), weights.astype(np.float64)


def _legendre_pair(n: int, x: np.ndarray):
    """(P_n(x), P_n'(x)) by the three-term recurrence."""
    p0 = np.ones_like(x)
    p1 = x.copy()
    if n == 0:
        return p0, np.zeros_like(x)
    for k in range(2, n + 1):
        p0, p1 = p1, ((2 * k - 1) * x * p1 - (k - 1) * p0) / k
    # derivative identity: (1-x^2) P_n' = n (P_{n-1} - x P_n)
    dp = n * (p0 - x * p1) / np.maximum(1.0 - x * x, 1e-300)
    return p1, dp


def gauss_lobatto(n: int):
    """n-point Gauss-Lobatto rule (n >= 2): includes both endpoints,
    exact for polynomials of degree 2n-3. Interior nodes are the roots
    of P'_{n-1}; weights w_i = 2 / (n(n-1) P_{n-1}(x_i)^2)."""
    n = int(n)
    if n < 2:
        raise ValueError("gauss_lobatto(): n must be >= 2")
    nodes = np.empty(n, np.float64)
    weights = np.empty(n, np.float64)
    nodes[0], nodes[-1] = -1.0, 1.0
    m = n - 1
    if n > 2:
        # Chebyshev-Gauss-Lobatto points seed Newton on P'_{n-1}
        x = np.cos(np.pi * np.arange(1, m) / m)
        for _ in range(100):
            p, dp = _legendre_pair(m, x)
            # d/dx P'_m via the ODE: (1-x^2) P'' = 2x P' - m(m+1) P
            d2p = (2.0 * x * dp - m * (m + 1) * p) / (1.0 - x * x)
            step = dp / d2p
            x = x - step
            if np.max(np.abs(step)) < 1e-15:
                break
        nodes[1:-1] = x[::-1]
    p_end, _ = _legendre_pair(m, nodes)
    weights[:] = 2.0 / (n * m * p_end * p_end)
    return nodes, weights


def composite_simpson(n: int):
    """Composite Simpson rule over n equally spaced nodes (n odd, >= 3):
    weights h/3 * [1 4 2 4 ... 4 1]."""
    n = int(n)
    if n < 3 or n % 2 != 1:
        raise ValueError("composite_simpson(): n must be >= 3 and odd")
    nodes = np.linspace(-1.0, 1.0, n)
    h = 2.0 / (n - 1)
    weights = np.full(n, 2.0, np.float64)
    weights[1::2] = 4.0
    weights[0] = weights[-1] = 1.0
    return nodes, weights * (h / 3.0)


def composite_simpson_38(n: int):
    """Composite Simpson 3/8 rule over n nodes ((n-1) % 3 == 0):
    weights 3h/8 * [1 3 3 2 3 3 2 ... 3 3 1]."""
    n = int(n)
    if n < 4 or (n - 1) % 3 != 0:
        raise ValueError(
            "composite_simpson_38(): n-1 must be divisible by 3")
    nodes = np.linspace(-1.0, 1.0, n)
    h = 2.0 / (n - 1)
    weights = np.full(n, 3.0, np.float64)
    weights[3::3] = 2.0
    weights[0] = weights[-1] = 1.0
    return nodes, weights * (3.0 * h / 8.0)
