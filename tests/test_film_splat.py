"""block_splat_scatter (sort-based random-pixel splat, the light tracer's
ImageBlock::put analog — reference imageblock.cpp:119-127) against the
naive scatter-add oracle."""

import numpy as np
import jax
import jax.numpy as jnp

from mitsuba3dopplertof_tpu.films import block_create, block_splat_scatter


def _oracle(block, px, py, values, active, W, H, row0=0):
    b = np.asarray(block).copy()
    px, py = np.asarray(px), np.asarray(py)
    act = np.asarray(active)
    for c, v in enumerate(values):
        v = np.asarray(v)
        for i in range(px.shape[0]):
            if act[i]:
                b[c, row0 + py[i], px[i]] += v[i]
    return b


def test_splat_scatter_matches_oracle():
    rng = np.random.RandomState(3)
    W, H, n = 13, 9, 4096
    px = jnp.asarray(rng.randint(0, W, n), jnp.int32)
    py = jnp.asarray(rng.randint(0, H, n), jnp.int32)
    vals = [jnp.asarray(rng.rand(n).astype(np.float32)) for _ in range(3)]
    act = jnp.asarray(rng.rand(n) > 0.3)
    block = block_create(W, H, 3)
    out = block_splat_scatter(block, px, py, vals, act, W, H)
    ref = _oracle(block, px, py, vals, act, W, H)
    np.testing.assert_allclose(np.asarray(out), ref, rtol=2e-5, atol=1e-5)


def test_splat_scatter_row_offset_and_jit():
    rng = np.random.RandomState(7)
    W, H, pad, n = 8, 6, 2, 1024
    px = jnp.asarray(rng.randint(0, W, n), jnp.int32)
    py = jnp.asarray(rng.randint(0, H, n), jnp.int32)
    vals = [jnp.asarray(rng.rand(n).astype(np.float32))]
    act = jnp.asarray(rng.rand(n) > 0.5)
    block = block_create(W, H + 2 * pad, 1)
    f = jax.jit(lambda b, x, y, v, a: block_splat_scatter(
        b, x, y, [v], a, W, H, row0=pad))
    out = f(block, px, py, vals[0], act)
    ref = _oracle(block, px, py, vals, act, W, H, row0=pad)
    np.testing.assert_allclose(np.asarray(out), ref, rtol=2e-5, atol=1e-5)
    # pad rows untouched
    assert np.asarray(out)[0, :pad].sum() == 0
    assert np.asarray(out)[0, pad + H:].sum() == 0


def test_splat_scatter_all_inactive():
    W, H, n = 4, 4, 64
    block = block_create(W, H, 2)
    out = block_splat_scatter(
        block, jnp.zeros(n, jnp.int32), jnp.zeros(n, jnp.int32),
        [jnp.ones(n), jnp.ones(n)], jnp.zeros(n, bool), W, H)
    assert float(jnp.abs(out).sum()) == 0.0
