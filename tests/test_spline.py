"""Catmull-Rom splines (core/spline.py; reference spline.h)."""

import numpy as np
import jax.numpy as jnp

from mitsuba3dopplertof_tpu.core import spline as S


def test_eval_interpolates_nodes_and_quadratics():
    # interpolation at nodes
    vals = np.array([0.3, 1.2, 0.7, 2.0, 1.1])
    xs = jnp.asarray(np.linspace(0.0, 1.0, 5), jnp.float32)
    np.testing.assert_allclose(np.asarray(S.eval_1d(0.0, 1.0, vals, xs)),
                               vals, rtol=1e-5)
    # Catmull-Rom with central differences reproduces quadratics exactly
    # on interior intervals
    grid = np.linspace(0.0, 1.0, 9)
    q = 3.0 * grid ** 2 - grid + 0.5
    x = jnp.asarray(np.linspace(grid[1], grid[-2], 101), jnp.float32)
    ref = 3.0 * np.asarray(x) ** 2 - np.asarray(x) + 0.5
    np.testing.assert_allclose(np.asarray(S.eval_1d(0.0, 1.0, q, x)), ref,
                               atol=1e-4)
    # outside the domain -> 0
    assert float(S.eval_1d(0.0, 1.0, vals, jnp.float32(1.5))) == 0.0


def test_integrate_matches_quadrature():
    vals = np.array([0.3, 1.2, 0.7, 2.0, 1.1])
    cdf = S.integrate_1d(0.0, 2.0, vals)
    xs = np.linspace(0.0, 2.0, 20001)
    dense = np.asarray(S.eval_1d(0.0, 2.0, vals,
                                 jnp.asarray(xs, jnp.float32)))
    ref = np.trapezoid(dense, xs)
    assert abs(cdf[-1] - ref) < 1e-3 * ref


def test_invert_roundtrip():
    vals = np.array([0.1, 0.5, 1.3, 2.4, 4.0])     # monotone increasing
    x = jnp.asarray(np.linspace(0.02, 0.98, 64), jnp.float32)
    y = S.eval_1d(0.0, 1.0, vals, x)
    x2 = S.invert_1d(0.0, 1.0, vals, y, n_iter=40)
    np.testing.assert_allclose(np.asarray(x2), np.asarray(x), atol=1e-4)


def test_sample_matches_pdf():
    vals = np.array([0.2, 1.5, 0.4, 2.0, 0.9])
    u = jnp.asarray(np.random.default_rng(0).random(300_000), jnp.float32)
    x, pdf = S.sample_1d(0.0, 3.0, vals, u, n_iter=30)
    x = np.asarray(x)
    hist, edges = np.histogram(x, bins=24, range=(0.0, 3.0), density=True)
    centers = 0.5 * (edges[:-1] + edges[1:])
    pdf_c = np.asarray(S.eval_1d(0.0, 3.0, vals,
                                 jnp.asarray(centers, jnp.float32)))
    total = S.integrate_1d(0.0, 3.0, vals)[-1]
    rel = np.abs(hist - pdf_c / total)
    assert rel.max() < 0.05 * (pdf_c / total).max(), rel.max()
    # returned pdf is consistent
    pr = np.asarray(pdf)
    pe = np.asarray(S.eval_1d(0.0, 3.0, vals, jnp.asarray(x))) / total
    np.testing.assert_allclose(pr, pe, rtol=1e-3, atol=1e-5)
