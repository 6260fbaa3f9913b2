"""General sampling distributions (core/distr.py; reference distr_1d.h +
distr_2d.h Marginal2D/Hierarchical2D). Chi2 / histogram GOF tests."""

import numpy as np
import jax.numpy as jnp
import pytest

from mitsuba3dopplertof_tpu.core.distr import (
    DiscreteDistribution, ContinuousDistribution,
    IrregularContinuousDistribution, Marginal2D, Hierarchical2D)


def _u(n, d=1, seed=0):
    r = np.random.default_rng(seed).random((n, d)).astype(np.float32)
    return [jnp.asarray(r[:, i]) for i in range(d)]


def test_discrete_distribution():
    pmf = [1.0, 3.0, 0.5, 2.5]
    d = DiscreteDistribution(pmf)
    (u,) = _u(200_000)
    idx = np.asarray(d.sample(u))
    freq = np.bincount(idx, minlength=4) / idx.size
    np.testing.assert_allclose(freq, np.asarray(pmf) / sum(pmf), atol=5e-3)
    i, ur = d.sample_reuse(u)
    ur = np.asarray(ur)
    assert (ur >= 0).all() and (ur <= 1).all()
    # reused samples stay uniform within each bucket
    for k in range(4):
        m = np.asarray(i) == k
        assert abs(ur[m].mean() - 0.5) < 0.02


@pytest.mark.parametrize("cls,extra", [
    (ContinuousDistribution, ((2.0, 5.0),)),
    (IrregularContinuousDistribution, (None,)),
])
def test_continuous_distributions(cls, extra):
    vals = [0.2, 1.5, 0.4, 2.0, 0.9]
    if cls is ContinuousDistribution:
        d = cls((2.0, 5.0), vals)
        nodes = np.linspace(2.0, 5.0, len(vals))
    else:
        nodes = np.array([2.0, 2.4, 3.5, 4.0, 5.0])
        d = cls(nodes, vals)
    (u,) = _u(400_000, seed=1)
    x = np.asarray(d.sample(u))
    assert (x >= 2.0).all() and (x <= 5.0).all()
    hist, edges = np.histogram(x, bins=24, range=(2.0, 5.0), density=True)
    centers = 0.5 * (edges[:-1] + edges[1:])
    pdf = np.asarray(d.eval_pdf_normalized(jnp.asarray(centers,
                                                       jnp.float32)))
    assert np.abs(hist - pdf).max() < 0.05 * pdf.max(), \
        np.abs(hist - pdf).max()


def _wavy(H, W):
    y, x = np.mgrid[0:H, 0:W]
    return (0.3 + np.sin(3.0 * x / W) ** 2
            + 1.5 * np.exp(-((x / W - 0.7) ** 2
                             + (y / H - 0.3) ** 2) / 0.02))


def test_marginal2d_gof():
    d = Marginal2D(_wavy(17, 23))
    u1, u2 = _u(400_000, 2, seed=2)
    x, y = d.sample(u1, u2)
    x, y = np.asarray(x), np.asarray(y)
    B = 12
    hist, _, _ = np.histogram2d(y, x, bins=B, range=[[0, 1], [0, 1]],
                                density=True)
    yc, xc = np.mgrid[0:B, 0:B]
    xs = jnp.asarray(((xc + 0.5) / B).reshape(-1), jnp.float32)
    ys = jnp.asarray(((yc + 0.5) / B).reshape(-1), jnp.float32)
    pdf = np.asarray(d.eval_pdf(xs, ys)).reshape(B, B)
    rel = np.abs(hist - pdf) / pdf.max()
    assert rel.max() < 0.08, rel.max()


def test_hierarchical2d_gof():
    d = Hierarchical2D(_wavy(16, 16))
    u1, u2 = _u(400_000, 2, seed=3)
    x, y = d.sample(u1, u2)
    x, y = np.asarray(x), np.asarray(y)
    B = 16     # bin == cell: cell-constant density is exact at this scale
    hist, _, _ = np.histogram2d(y, x, bins=B, range=[[0, 1], [0, 1]],
                                density=True)
    yc, xc = np.mgrid[0:B, 0:B]
    xs = jnp.asarray(((xc + 0.5) / B).reshape(-1), jnp.float32)
    ys = jnp.asarray(((yc + 0.5) / B).reshape(-1), jnp.float32)
    pdf = np.asarray(d.eval_pdf(xs, ys)).reshape(B, B)
    rel = np.abs(hist - pdf) / pdf.max()
    assert rel.max() < 0.08, rel.max()


def test_hierarchical2d_preserves_stratification():
    """The quadrant-descent warp keeps stratified inputs stratified: a
    uniform density must map the unit grid to itself (identity-ish)."""
    d = Hierarchical2D(np.ones((8, 8)))
    u1, u2 = _u(4096, 2, seed=4)
    x, y = d.sample(u1, u2)
    np.testing.assert_allclose(np.asarray(x), np.asarray(u2), atol=1e-4)
    np.testing.assert_allclose(np.asarray(y), np.asarray(u1), atol=1e-4)
