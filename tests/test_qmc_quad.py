"""Core qmc (radical inverse / Sobol') and quadrature-rule tests.

Mirrors the reference's coverage intent for src/core/qmc.cpp and
include/mitsuba/core/quad.h.
"""
import numpy as np
import pytest

from mitsuba3dopplertof_tpu.core import qmc, quad


# ---------------------------------------------------------------- qmc ----

def test_primes():
    p = qmc.primes(30)
    assert p.tolist() == [2, 3, 5, 7, 11, 13, 17, 19, 23, 29]
    assert qmc.primes(8161)[-1] == 8161  # reference default max_base


def test_radical_inverse_base2_matches_bit_reverse():
    ri = qmc.RadicalInverse(max_base=20)
    idx = np.arange(64, dtype=np.uint32)
    a = np.asarray(ri.eval(0, idx))
    b = np.asarray(qmc.radical_inverse_2(idx))
    np.testing.assert_allclose(a, b, atol=1e-7)
    # first base-2 values: 0, 1/2, 1/4, 3/4, 1/8, ...
    np.testing.assert_allclose(a[:5], [0, 0.5, 0.25, 0.75, 0.125], atol=1e-7)


def test_radical_inverse_base3_values():
    ri = qmc.RadicalInverse(max_base=20)
    idx = np.arange(9, dtype=np.uint32)
    got = np.asarray(ri.eval(1, idx))
    want = [0, 1 / 3, 2 / 3, 1 / 9, 4 / 9, 7 / 9, 2 / 9, 5 / 9, 8 / 9]
    np.testing.assert_allclose(got, want, atol=1e-6)


def test_scrambled_radical_inverse_permutes_digits():
    ri = qmc.RadicalInverse(max_base=20, scramble=-1)  # Faure
    perm = ri.permutation(1)            # base 3 Faure permutation
    idx = np.arange(27, dtype=np.uint32)
    got = np.asarray(ri.eval_scrambled(1, idx))
    # stays a uniform low-discrepancy set in [0,1)
    assert ((got >= 0) & (got < 1)).all()
    assert len(np.unique(np.round(got * 3 ** 3))) == 27
    # digit-permutation semantics on single-digit indices: value of index
    # i (one digit d=i) is perm[d]/3 plus the permuted-zero tail
    tail = perm[0] / (3 - 1) / 3
    for i in range(1, 3):
        assert got[i] == pytest.approx(perm[i] / 3 + tail, abs=1e-6)


def test_scrambled_random_seed_reproducible():
    a = qmc.RadicalInverse(max_base=20, scramble=7)
    b = qmc.RadicalInverse(max_base=20, scramble=7)
    c = qmc.RadicalInverse(max_base=20, scramble=8)
    idx = np.arange(50, dtype=np.uint32)
    va = np.asarray(a.eval_scrambled(2, idx))
    assert np.array_equal(va, np.asarray(b.eval_scrambled(2, idx)))
    assert not np.array_equal(va, np.asarray(c.eval_scrambled(2, idx)))


def test_sobol_2_stratification():
    # (radical_inverse_2, sobol_2) is a (0,2)-sequence: every elementary
    # interval of area 1/16 contains exactly one of the first 16 points
    idx = np.arange(16, dtype=np.uint32)
    x = np.asarray(qmc.radical_inverse_2(idx))
    y = np.asarray(qmc.sobol_2(idx))
    for k in range(5):  # strata shapes 1x16, 2x8, 4x4, 8x2, 16x1
        nx, ny = 1 << k, 1 << (4 - k)
        cells = set(zip((x * nx).astype(int).tolist(),
                        (y * ny).astype(int).tolist()))
        assert len(cells) == 16
    # scramble shifts deterministically
    y2 = np.asarray(qmc.sobol_2(idx, np.uint32(0xDEADBEEF)))
    assert not np.array_equal(y, y2)
    assert ((y2 >= 0) & (y2 < 1)).all()


# --------------------------------------------------------------- quad ----

def _integrate(nodes, weights, f):
    return float(np.sum(weights * f(nodes)))


def test_gauss_legendre_polynomial_exactness():
    for n in (1, 2, 5, 20):
        nodes, w = quad.gauss_legendre(n)
        assert w.sum() == pytest.approx(2.0, abs=1e-12)
        # exact through degree 2n-1: odd top degree integrates to 0,
        # the even degree below it to 2/deg
        deg = 2 * n - 1
        assert _integrate(nodes, w, lambda x: x ** deg) == pytest.approx(
            0.0, abs=1e-10)
        assert _integrate(nodes, w, lambda x: x ** (deg - 1)) == pytest.approx(
            2.0 / deg, abs=1e-10)


def test_gauss_lobatto_endpoints_and_exactness():
    for n in (2, 3, 5, 16):
        nodes, w = quad.gauss_lobatto(n)
        assert nodes[0] == -1.0 and nodes[-1] == 1.0
        assert np.all(np.diff(nodes) > 0)
        assert w.sum() == pytest.approx(2.0, abs=1e-10)
        if n >= 3:
            deg = 2 * n - 3
            got = _integrate(nodes, w, lambda x: 3 * x ** deg + x ** 2)
            assert got == pytest.approx(2.0 / 3.0, abs=1e-9)


def test_composite_simpson():
    nodes, w = quad.composite_simpson(9)
    assert w.sum() == pytest.approx(2.0, abs=1e-12)
    got = _integrate(nodes, w, np.exp)
    assert got == pytest.approx(np.e - 1 / np.e, rel=1e-3)
    with pytest.raises(ValueError):
        quad.composite_simpson(4)


def test_composite_simpson_38():
    nodes, w = quad.composite_simpson_38(10)
    assert w.sum() == pytest.approx(2.0, abs=1e-12)
    got = _integrate(nodes, w, np.exp)
    assert got == pytest.approx(np.e - 1 / np.e, rel=1e-3)
    with pytest.raises(ValueError):
        quad.composite_simpson_38(9)
