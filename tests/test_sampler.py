"""Correlated / time-stratified sampler semantics
(reference src/samplers/correlated.cpp:92-167, timestratified.cpp:117-130).
The fork shipped zero tests for these — SURVEY.md §4 lists them as the
critical gap to close."""

import numpy as np
import jax.numpy as jnp
import pytest

from mitsuba3dopplertof_tpu.core.properties import Properties
from mitsuba3dopplertof_tpu.samplers import (
    CorrelatedSampler, TimeStratifiedSampler, IndependentSampler,
    TIME_UNIFORM, TIME_STRATIFIED, TIME_ANTITHETIC, TIME_ANTITHETIC_MIRROR,
    TIME_PERIODIC)


def make_correlated(spp=8, tc=2, pc=None):
    p = Properties("correlated")
    p["sample_count"] = spp
    p["time_correlate_number"] = tc
    if pc is not None:
        p["path_correlate_number"] = pc
    s = CorrelatedSampler(p)
    return s


def seed_wavefront(s, n_pixels=4, seed=0):
    s.set_samples_per_wavefront(s.sample_count)
    return s.seed(seed, n_pixels * s.sample_count)


def test_antithetic_pairs():
    """antithetic, tc=2: member 1 gets r + shift (correlated.cpp:131-139)."""
    s = make_correlated(spp=8, tc=2)
    st = seed_wavefront(s)
    v, st = s.next_1d_time(st, None, TIME_ANTITHETIC, 0.5, False)
    v = np.asarray(v)
    assert np.allclose(v[1::2], v[0::2] + 0.5, atol=1e-6)


def test_antithetic_mirror_pairs():
    s = make_correlated(spp=8, tc=2)
    st = seed_wavefront(s)
    v, st = s.next_1d_time(st, None, TIME_ANTITHETIC_MIRROR, 0.0, False)
    v = np.asarray(v)
    assert np.allclose(v[1::2], 1.0 - v[0::2], atol=1e-6)


def test_antithetic_with_interval_stratification():
    """per-interval stratification divides [0,1) into spp/tc strata
    (correlated.cpp:109-125)."""
    spp, tc = 8, 2
    s = make_correlated(spp=spp, tc=tc)
    st = seed_wavefront(s, n_pixels=1)
    v, st = s.next_1d_time(st, None, TIME_ANTITHETIC, 0.5, True)
    v = np.asarray(v)
    n_stratum = spp // tc
    # member 0 of pair k lies in stratum k
    for k in range(n_stratum):
        assert k / n_stratum <= v[2 * k] < (k + 1) / n_stratum


def test_periodic_group_offsets():
    s = make_correlated(spp=8, tc=4)
    st = seed_wavefront(s)
    v, st = s.next_1d_time(st, None, TIME_PERIODIC, 0.0, False)
    v = np.asarray(v)
    base = v[0::4]
    for k in range(1, 4):
        assert np.allclose(v[k::4], base + k / 4.0, atol=1e-6)


def test_stratified_time_covers_strata():
    s = make_correlated(spp=8, tc=8)
    st = seed_wavefront(s, n_pixels=1)
    v, st = s.next_1d_time(st, None, TIME_STRATIFIED, 0.0, False)
    v = np.sort(np.asarray(v))
    for k in range(8):
        assert k / 8 <= v[k] < (k + 1) / 8


def test_correlate_replay_within_group():
    """next_*_correlate(correlate=True) returns the shared path stream —
    group members see identical values (temporal replay)."""
    s = make_correlated(spp=8, tc=2)
    st = seed_wavefront(s)
    n = 32
    true_ = jnp.ones((n,), bool)
    v, st = s.next_1d_correlate(st, true_, true_)
    v = np.asarray(v)
    assert np.array_equal(v[0::2], v[1::2])
    # with correlate False the values are independent
    v2, st = s.next_1d_correlate(st, true_, jnp.zeros((n,), bool))
    v2 = np.asarray(v2)
    assert not np.array_equal(v2[0::2], v2[1::2])


def test_both_streams_always_advance():
    """correlated.cpp:156-161: both streams advance regardless of
    `correlate`, keeping lanes in lockstep."""
    s = make_correlated(spp=4, tc=2)
    st0 = seed_wavefront(s)
    n = 16
    act = jnp.ones((n,), bool)
    _, st_t = s.next_1d_correlate(st0, act, jnp.ones((n,), bool))
    _, st_f = s.next_1d_correlate(st0, act, jnp.zeros((n,), bool))
    assert np.array_equal(np.asarray(st_t.rng.state_lo),
                          np.asarray(st_f.rng.state_lo))
    assert np.array_equal(np.asarray(st_t.rng_path.state_lo),
                          np.asarray(st_f.rng_path.state_lo))


def test_timestratified_covers_and_jitters():
    p = Properties("timestratified")
    p["sample_count"] = 16
    s = TimeStratifiedSampler(p)
    s.set_samples_per_wavefront(16)
    st = s.seed(0, 16)
    v, st = s.next_1d_time(st)
    v = np.sort(np.asarray(v))
    for k in range(16):
        assert k / 16 <= v[k] < (k + 1) / 16


def test_independent_uniformity():
    p = Properties("independent")
    p["sample_count"] = 4
    s = IndependentSampler(p)
    s.set_samples_per_wavefront(4)
    st = s.seed(0, 1 << 14)
    v, st = s.next_1d(st)
    v = np.asarray(v)
    hist, _ = np.histogram(v, bins=16, range=(0, 1))
    assert hist.min() > 0.7 * v.size / 16 and hist.max() < 1.3 * v.size / 16


def test_stratified_2d_covers():
    from mitsuba3dopplertof_tpu.samplers import StratifiedSampler
    p = Properties("stratified")
    p["sample_count"] = 16
    s = StratifiedSampler(p)
    s.set_samples_per_wavefront(16)
    st = s.seed(0, 16)
    (fx, fy), st = s.next_2d(st)
    fx, fy = np.asarray(fx), np.asarray(fy)
    cells = set(zip((fx * 4).astype(int).tolist(), (fy * 4).astype(int).tolist()))
    assert len(cells) == 16     # every stratum hit exactly once


def test_multijitter_projections():
    from mitsuba3dopplertof_tpu.samplers import MultijitterSampler
    p = Properties("multijitter")
    p["sample_count"] = 16
    s = MultijitterSampler(p)
    s.set_samples_per_wavefront(16)
    st = s.seed(0, 16)
    (fx, fy), st = s.next_2d(st)
    fx, fy = np.asarray(fx), np.asarray(fy)
    # CMJ: 1D projections are N-stratified
    assert len(set((fx * 16).astype(int).tolist())) == 16
    assert len(set((fy * 16).astype(int).tolist())) == 16


def test_ldsampler_stratification():
    from mitsuba3dopplertof_tpu.samplers import LDSampler
    p = Properties("ldsampler")
    p["sample_count"] = 64
    s = LDSampler(p)
    s.set_samples_per_wavefront(64)
    st = s.seed(0, 64)
    v, st = s.next_1d(st)
    v = np.sort(np.asarray(v))
    for k in range(64):
        assert k / 64 <= v[k] < (k + 1) / 64


def test_orthogonal_array_property():
    import mitsuba3dopplertof_tpu as mi
    """Bose-construction OA (reference orthogonal.cpp:215-243): every pair
    of dimensions covers the res x res strata grid exactly once, and each
    1D projection is perfectly stratified into res^2 substrata."""
    sp = mi.load_dict({"type": "orthogonal", "sample_count": 25,
                       "jitter": False})
    assert sp.resolution == 5 and sp.sample_count == 25
    sp.set_samples_per_wavefront(25)
    st = sp.seed(0, 25)
    dims = []
    for _ in range(5):
        v, st = sp.next_1d(st)
        dims.append(np.asarray(v))
    res = sp.resolution
    for a in range(5):
        ia = np.floor(dims[a] * res * res).astype(int)
        assert len(set(ia.tolist())) == res * res       # 1d stratification
        for b in range(a + 1, 5):
            ib = np.floor(dims[b] * res).astype(int)
            cells = set(zip(np.floor(dims[a] * res).astype(int).tolist(),
                            ib.tolist()))
            assert len(cells) == res * res, (a, b)      # OA strength 2


def test_orthogonal_bush_strength3():
    import mitsuba3dopplertof_tpu as mi
    sp = mi.load_dict({"type": "orthogonal", "sample_count": 25,
                       "strength": 3, "jitter": True})
    sp.set_samples_per_wavefront(sp.sample_count)
    st = sp.seed(0, sp.sample_count)
    for _ in range(3):
        v, st = sp.next_1d(st)
        v = np.asarray(v)
        assert v.min() >= 0.0 and v.max() < 1.0


def test_ldsampler_02_sequence_elementary_intervals():
    """The ldsampler's 2D draws form a scrambled (0,2)-net: for N = 2^m
    samples of one pixel, EVERY dyadic elementary interval of area 1/N
    contains exactly one point (reference ldsampler.cpp sample02
    structure; VERDICT round-1 weak item 6)."""
    import numpy as np
    import jax.numpy as jnp
    import mitsuba3dopplertof_tpu as mi

    N = 64
    s = mi.load_dict({"type": "ldsampler", "sample_count": N})
    s.set_samples_per_wavefront(N)
    state = s.seed(0, N)        # one pixel's N samples
    (fx, fy), state = s.next_2d(state)
    x = np.asarray(fx)
    y = np.asarray(fy)
    assert ((x >= 0) & (x < 1) & (y >= 0) & (y < 1)).all()
    m = int(np.log2(N))
    for a in range(m + 1):
        b = m - a
        cells = (np.floor(x * (1 << a)).astype(int) * (1 << b)
                 + np.floor(y * (1 << b)).astype(int))
        counts = np.bincount(cells, minlength=N)
        assert (counts == 1).all(), (a, b, counts.max(), counts.min())


def test_advance_reseeds_pair_sync():
    """Pass advancement derives FRESH streams from (seed, pass, lane):
    masked in-pass draws desync correlation-group members' shared streams
    (pcg32 advances only where active), and continuing them into the next
    pass would break antithetic pair cancellation — the measured multi-pass
    variance inflation. After advance(), pair streams must be re-synced,
    decorrelated from the previous pass, and deterministic."""
    s = make_correlated(spp=8, tc=2)
    st = seed_wavefront(s)
    n = 32
    # desync pair members: only even lanes draw (mask advances even streams)
    mask = jnp.arange(n) % 2 == 0
    _, st = s.next_1d_correlate(st, mask, jnp.ones((n,), bool))
    assert not np.array_equal(np.asarray(st.rng_path.state_lo[0::2]),
                              np.asarray(st.rng_path.state_lo[1::2]))

    st2 = s.advance(st)
    for stream in (st2.rng_time, st2.rng_path):
        assert np.array_equal(np.asarray(stream.state_lo[0::2]),
                              np.asarray(stream.state_lo[1::2]))
        assert np.array_equal(np.asarray(stream.state_hi[0::2]),
                              np.asarray(stream.state_hi[1::2]))
    assert int(st2.sample_index) == 1
    assert int(st2.dimension_index) == 0
    # decorrelated from pass 0 and from pass 2
    st0 = seed_wavefront(s)
    assert not np.array_equal(np.asarray(st2.rng.state_lo),
                              np.asarray(st0.rng.state_lo))
    st3 = s.advance(st2)
    assert not np.array_equal(np.asarray(st3.rng.state_lo),
                              np.asarray(st2.rng.state_lo))
    # deterministic: advancing the same state twice gives the same streams
    st2b = s.advance(st)
    assert np.array_equal(np.asarray(st2b.rng.state_lo),
                          np.asarray(st2.rng.state_lo))


def test_advance_keeps_global_stratification():
    """sample_index stays GLOBAL across re-seeded passes, so per-interval
    stratification tiles [0,1) exactly over all passes (antithetic r spans
    stratum (pass*spw + lane_offs)//tc of sample_count//tc)."""
    s = make_correlated(spp=16, tc=2)
    s.set_samples_per_wavefront(4)          # 4 passes of 4 spp
    st = s.seed(0, 4)                       # one pixel, 4 lanes
    seen = []
    for _ in range(4):
        v, st = s.next_1d_time(st, None, TIME_ANTITHETIC, 0.5, True)
        seen.append(np.asarray(v)[0::2])    # pair leaders
        st = s.advance(st)
    seen = np.sort(np.concatenate(seen))
    # 8 leaders must each land in their own stratum of [0,1)
    for k in range(8):
        assert k / 8 <= seen[k] < (k + 1) / 8, seen
