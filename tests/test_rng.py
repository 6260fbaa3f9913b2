"""RNG primitives: bitwise-exactness vs published PCG32/TEA vectors and
reference semantics (SURVEY.md §4: the fork shipped no sampler tests — these
fill that gap)."""

import numpy as np
import jax.numpy as jnp
import pytest

from mitsuba3dopplertof_tpu.core.rng import (
    PCG32State, pcg32_seed, pcg32_next_u32, pcg32_next_f32,
    pcg32_seed_wavefront, sample_tea_32, permute_kensler)


def test_pcg32_reference_vectors():
    """O'Neill's pcg32 demo: seed(42, 54) produces this exact sequence."""
    s = pcg32_seed(jnp.uint32(0), jnp.uint32(42), jnp.uint32(0), jnp.uint32(54))
    expected = [0xA15C02B7, 0x7B47F409, 0xBA1D3330, 0x83D2F293,
                0xBFA4784B, 0xCBED606E]
    for e in expected:
        o, s = pcg32_next_u32(s)
        assert int(o) == e


def test_pcg32_float_range():
    s = pcg32_seed_wavefront(np.uint32(7), jnp.arange(1024, dtype=jnp.uint32))
    vals = []
    for _ in range(8):
        v, s = pcg32_next_f32(s)
        vals.append(np.asarray(v))
    v = np.concatenate(vals)
    assert v.min() >= 0.0 and v.max() < 1.0
    assert abs(v.mean() - 0.5) < 0.02


def test_pcg32_masked_advance():
    """Masked draws must advance state only for active lanes (the lockstep
    contract the correlated sampler relies on, reference correlated.cpp)."""
    lanes = jnp.arange(8, dtype=jnp.uint32)
    s0 = pcg32_seed_wavefront(np.uint32(0), lanes)
    mask = jnp.asarray([True, False] * 4)
    v1, s1 = pcg32_next_f32(s0, mask)
    # inactive lanes keep their state
    assert np.array_equal(np.asarray(s1.state_lo)[1::2],
                          np.asarray(s0.state_lo)[1::2])
    assert not np.array_equal(np.asarray(s1.state_lo)[0::2],
                              np.asarray(s0.state_lo)[0::2])


def test_tea_deterministic_and_distinct():
    a0, a1 = sample_tea_32(jnp.uint32(1), jnp.uint32(1))
    b0, b1 = sample_tea_32(jnp.uint32(1), jnp.uint32(2))
    assert int(a0) != int(b0)
    c0, c1 = sample_tea_32(jnp.uint32(1), jnp.uint32(1))
    assert int(a0) == int(c0) and int(a1) == int(c1)


@pytest.mark.parametrize("n", [1, 2, 7, 16, 100])
def test_kensler_is_permutation(n):
    idx = jnp.arange(n, dtype=jnp.uint32)
    out = np.asarray(permute_kensler(idx, n, jnp.uint32(0xDEADBEEF)))
    assert sorted(out.tolist()) == list(range(n))


def test_kensler_seed_variation():
    idx = jnp.arange(16, dtype=jnp.uint32)
    a = np.asarray(permute_kensler(idx, 16, jnp.uint32(1)))
    b = np.asarray(permute_kensler(idx, 16, jnp.uint32(2)))
    assert not np.array_equal(a, b)


def test_wavefront_group_sharing():
    """Lanes with equal lane//k share identical streams (temporal replay,
    reference correlated.cpp:44-59)."""
    lanes = jnp.arange(8, dtype=jnp.uint32)
    s = pcg32_seed_wavefront(np.uint32(3), lanes // np.uint32(2), 1)
    v, _ = pcg32_next_f32(s)
    v = np.asarray(v)
    assert np.array_equal(v[0::2], v[1::2])
    assert not np.allclose(v[0], v[2])
