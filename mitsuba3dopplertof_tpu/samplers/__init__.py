"""Sampler plugins as functional state machines.

The reference's samplers are stateful PCG32 wrappers
(reference src/render/sampler.cpp, src/samplers/{independent,correlated,
timestratified,stratified}.cpp). Here sampler state is an explicit pytree
threaded through the jitted wavefront; every draw returns (value, new_state).
Seeding, stream layout and draw-for-draw advancement are *bitwise identical*
to the reference:

  * main stream  : PCG32 seeded TEA(base_seed + seed, lane)          (sampler.cpp:115-135)
  * time stream  : PCG32 seeded TEA(base_seed + seed + 1, lane//Tc)  (correlated.cpp:44-59)
  * path stream  : PCG32 seeded TEA(base_seed + seed + 2, lane//Pc)
  * per-sequence permutation seed                                     (sampler.cpp:85-92)
  * next_1d_time strategies: uniform/stratified/antithetic/
    antithetic_mirror/periodic (+ per-interval stratification)        (correlated.cpp:92-153)
  * next_1d_correlate: draws BOTH streams, selects by `correlate`     (correlated.cpp:156-161)

Correlation groups (lanes sharing a stream) are a *layout contract*: lanes i
with equal i // time_correlate_number must stay contiguous in the wavefront
— the scheduler shards on pixel boundaries to preserve it (SURVEY.md §2.6).
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import numpy as np
import jax.numpy as jnp

from ..core.properties import Properties, register_plugin
from ..core.rng import (PCG32State, pcg32_seed_wavefront, pcg32_next_f32,
                        sample_tea_32, permute_kensler)

# ETimeSampling (reference include/mitsuba/render/sampler.h:27-34)
TIME_UNIFORM = 0
TIME_STRATIFIED = 1
TIME_ANTITHETIC = 2
TIME_ANTITHETIC_MIRROR = 3
TIME_PERIODIC = 4

TIME_SAMPLING_METHODS = {
    "uniform": TIME_UNIFORM,
    "stratified": TIME_STRATIFIED,
    "antithetic": TIME_ANTITHETIC,
    "antithetic_mirror": TIME_ANTITHETIC_MIRROR,
    "periodic": TIME_PERIODIC,
}


class SamplerStateT(NamedTuple):
    rng: PCG32State                 # main stream (per lane)
    rng_time: PCG32State            # correlated time stream
    rng_path: PCG32State            # correlated path stream
    permutation_seed: jnp.ndarray   # (N,) uint32 per-sequence seed
    sample_index: jnp.ndarray       # () uint32
    dimension_index: jnp.ndarray    # () uint32
    lane: jnp.ndarray               # (N,) uint32 global lane ids
    seed_value: jnp.ndarray         # () uint32 base seed of this render


class Sampler:
    """Host-side config; device state produced by ``seed``."""
    kind = "independent"

    def __init__(self, props: Properties):
        self.id = props.id
        self.sample_count = props.get_int("sample_count", 4)
        self.base_seed = props.get_int("seed", 0)
        self.samples_per_wavefront = 1
        self.time_correlate_number = 1
        self.path_correlate_number = 1
        self.jitter = True

    # -- seeding ------------------------------------------------------------
    def set_sample_count(self, spp: int):
        self.sample_count = spp

    def set_samples_per_wavefront(self, spw: int):
        if self.sample_count % spw != 0:
            raise RuntimeError(
                "sample_count must be a multiple of samples_per_wavefront")
        self.samples_per_wavefront = spw

    def _streams(self, seed_value, lane):
        """Derive the three PCG32 stream families for one pass. ``seed_value``
        may be a traced uint32 scalar (the per-pass re-seed folds the pass
        index into it inside jit)."""
        tc = max(int(self.time_correlate_number), 1)
        pc = max(int(self.path_correlate_number), 1)
        rng = pcg32_seed_wavefront(seed_value, lane, 0)
        rng_time = pcg32_seed_wavefront(seed_value, lane // np.uint32(tc), 1)
        rng_path = pcg32_seed_wavefront(seed_value, lane // np.uint32(pc), 2)
        return rng, rng_time, rng_path

    def seed(self, seed: int, wavefront_size: int,
             lane0: int = 0) -> SamplerStateT:
        """Seed lanes [lane0, lane0 + wavefront_size) of a (possibly larger)
        logical wavefront — per-lane TEA streams depend only on the global
        lane index, so any window reproduces the full-wavefront states
        (reference sampler.cpp:115-135)."""
        lane = jnp.uint32(lane0) + jnp.arange(wavefront_size, dtype=jnp.uint32)
        seed_value = np.uint32(self.base_seed + seed)
        rng, rng_time, rng_path = self._streams(seed_value, lane)
        # per-sequence permutation seed (reference sampler.cpp:85-92)
        spw = np.uint32(self.samples_per_wavefront)
        sequence_idx = spw * (lane // spw)
        perm_seed, _ = sample_tea_32(
            jnp.full(lane.shape, self.base_seed, jnp.uint32),
            sequence_idx + jnp.uint32(seed))
        return SamplerStateT(rng, rng_time, rng_path, perm_seed,
                             jnp.uint32(0), jnp.uint32(0),
                             lane, jnp.uint32(seed_value))

    def advance(self, state: SamplerStateT) -> SamplerStateT:
        """Advance to the next pass: FRESH streams derived from
        (seed, pass index, lane) — not a continuation of the previous
        pass's streams. Masked in-pass draws (pcg32_next's ``active``)
        leave correlation-group members (lane//tc / lane//pc share a
        stream) at DIFFERENT stream positions once their path depths
        diverge; continuing those streams into the next pass would break
        the antithetic pair sync that doppler variance cancellation
        relies on (measured: per-render variance inflation scaling with
        pass count). Re-seeding per pass matches the reference's
        per-pass ``sampler->seed(seed + i)`` (integrator.cpp:227-263)
        while keeping sample_index GLOBAL so per-interval stratification
        still tiles [0,1) exactly across passes."""
        idx = state.sample_index + jnp.uint32(1)
        sv = state.seed_value + idx * jnp.uint32(0x9E3779B9)
        rng, rng_time, rng_path = self._streams(sv, state.lane)
        return SamplerStateT(rng, rng_time, rng_path,
                             state.permutation_seed, idx, jnp.uint32(0),
                             state.lane, state.seed_value)

    def advance_window(self, state: SamplerStateT) -> SamplerStateT:
        """Advance to the next WINDOW of the global wavefront (strip-pass
        rendering: each pass covers the next pixel rows at full spp).
        Unlike ``advance``, the seed value stays fixed and the lane ids
        shift — every stream is exactly what a single giant wavefront
        would have produced for those lanes, so strip partitioning cannot
        perturb correlation groups or stratification."""
        n = state.lane.shape[0]
        lane = state.lane + jnp.uint32(n)
        rng, rng_time, rng_path = self._streams(state.seed_value, lane)
        spw = np.uint32(self.samples_per_wavefront)
        sequence_idx = spw * (lane // spw)
        seed_u = state.seed_value - jnp.uint32(np.uint32(self.base_seed))
        perm_seed, _ = sample_tea_32(
            jnp.full(lane.shape, self.base_seed, jnp.uint32),
            sequence_idx + seed_u)
        return SamplerStateT(rng, rng_time, rng_path, perm_seed,
                             jnp.uint32(0), jnp.uint32(0),
                             lane, state.seed_value)

    def current_sample_index(self, state: SamplerStateT, n: int):
        """reference sampler.cpp:94-103."""
        offs = state.lane % jnp.uint32(self.samples_per_wavefront)
        return state.sample_index * jnp.uint32(self.samples_per_wavefront) + offs

    # -- draws ----------------------------------------------------------------
    def next_1d(self, state, active=None):
        v, rng = pcg32_next_f32(state.rng, active)
        return v, state._replace(rng=rng)

    def next_2d(self, state, active=None):
        f1, state = self.next_1d(state, active)
        f2, state = self.next_1d(state, active)
        return (f1, f2), state

    def next_1d_time(self, state, active=None, strategy=TIME_UNIFORM,
                     antithetic_shift=0.0, stratified_interval=False):
        # base default (sampler.h:131): plain next_1d, unmasked
        v, rng = pcg32_next_f32(state.rng, None)
        return v, state._replace(rng=rng)

    def next_1d_correlate(self, state, active=None, correlate=None):
        return self.next_1d(state, active)

    def next_2d_correlate(self, state, active=None, correlate=None):
        return self.next_2d(state, active)


@register_plugin("sampler", "independent")
class IndependentSampler(Sampler):
    kind = "independent"


@register_plugin("sampler", "correlated")
class CorrelatedSampler(Sampler):
    """Temporal random replay (reference src/samplers/correlated.cpp)."""
    kind = "correlated"

    def __init__(self, props: Properties):
        super().__init__(props)
        self.time_correlate_number = props.get_int("time_correlate_number", 2)
        self.path_correlate_number = props.get_int(
            "path_correlate_number", self.time_correlate_number)

    def next_1d_time(self, state, active=None, strategy=TIME_UNIFORM,
                     antithetic_shift=0.0, stratified_interval=False):
        # (reference correlated.cpp:92-153)
        if strategy == TIME_UNIFORM:
            v, rng = pcg32_next_f32(state.rng, active)
            return v, state._replace(rng=rng)

        n = state.rng.state_lo.shape[0]
        sample_indices = self.current_sample_index(state, n)
        tc = int(self.time_correlate_number)

        if strategy == TIME_STRATIFIED:
            r, rng = pcg32_next_f32(state.rng, active)
            state = state._replace(rng=rng)
        else:
            r, rng_time = pcg32_next_f32(state.rng_time, active)
            state = state._replace(rng_time=rng_time)

        if stratified_interval:
            n_stratum = self.sample_count // tc
            if strategy == TIME_STRATIFIED:
                perm_seed = state.permutation_seed + state.dimension_index
                state = state._replace(dimension_index=state.dimension_index + 1)
                p1 = permute_kensler(sample_indices // tc, n_stratum, perm_seed, active)
                perm_seed = state.permutation_seed + state.dimension_index
                state = state._replace(dimension_index=state.dimension_index + 1)
                p2 = permute_kensler(sample_indices // tc, n_stratum, perm_seed, active)
                p = jnp.where(sample_indices % tc != 0, p1, p2)
                r = (p.astype(r.dtype) + r) / n_stratum
            else:
                p = (sample_indices // tc).astype(r.dtype)
                r = (p + r) / n_stratum

        rem = sample_indices % tc
        if strategy == TIME_STRATIFIED:
            return (rem.astype(r.dtype) + r) / tc, state
        if strategy == TIME_ANTITHETIC:
            if tc == 2:
                r2 = r + antithetic_shift
                return jnp.where(rem != 1, r, r2), state
            return r + rem.astype(r.dtype) / tc, state
        if strategy == TIME_ANTITHETIC_MIRROR:
            r2 = 1.0 - r + antithetic_shift
            return jnp.where(rem != 1, r, r2), state
        if strategy == TIME_PERIODIC:
            return r + rem.astype(r.dtype) / tc, state
        return r, state

    def next_1d_correlate(self, state, active=None, correlate=None):
        # both streams always advance (reference correlated.cpp:156-161)
        r1, rng_path = pcg32_next_f32(state.rng_path, active)
        r2, rng = pcg32_next_f32(state.rng, active)
        state = state._replace(rng=rng, rng_path=rng_path)
        if correlate is None:
            return r2, state
        correlate = jnp.broadcast_to(correlate, r1.shape)
        return jnp.where(correlate, r1, r2), state

    def next_2d_correlate(self, state, active=None, correlate=None):
        f1, state = self.next_1d_correlate(state, active, correlate)
        f2, state = self.next_1d_correlate(state, active, correlate)
        return (f1, f2), state


@register_plugin("sampler", "timestratified")
class TimeStratifiedSampler(Sampler):
    """Kensler-permuted stratified time (reference src/samplers/timestratified.cpp:117-130)."""
    kind = "timestratified"

    def __init__(self, props: Properties):
        super().__init__(props)
        self.jitter = props.get_bool("jitter", True)

    def next_1d_time(self, state, active=None, strategy=TIME_UNIFORM,
                     antithetic_shift=0.0, stratified_interval=False):
        n = state.rng.state_lo.shape[0]
        sample_indices = self.current_sample_index(state, n)
        perm_seed = state.permutation_seed + state.dimension_index
        state = state._replace(dimension_index=state.dimension_index + 1)
        p = permute_kensler(sample_indices, self.sample_count, perm_seed, active)
        if self.jitter:
            j, rng = pcg32_next_f32(state.rng, active)
            state = state._replace(rng=rng)
        else:
            j = jnp.float32(0.5)
        return (p.astype(jnp.float32) + j) / self.sample_count, state


__all__ = [
    "Sampler", "SamplerStateT", "IndependentSampler", "CorrelatedSampler",
    "TimeStratifiedSampler", "StratifiedSampler",
    "TIME_UNIFORM", "TIME_STRATIFIED", "TIME_ANTITHETIC",
    "TIME_ANTITHETIC_MIRROR", "TIME_PERIODIC", "TIME_SAMPLING_METHODS",
]


# replace the placeholder StratifiedSampler with the faithful version
class StratifiedSampler(Sampler):  # noqa: F811
    """2D-stratified sampler (reference src/samplers/stratified.cpp):
    Kensler-permuted stratum order + jitter; 2D draws use a sqrt grid."""
    kind = "stratified"

    def __init__(self, props: Properties):
        super().__init__(props)
        self.jitter = props.get_bool("jitter", True)
        self._update_resolution()

    def _update_resolution(self):
        r = 1
        while r * r < self.sample_count:
            r += 1
        self.resolution = r
        if r * r != self.sample_count:
            self.sample_count = r * r

    def set_sample_count(self, spp: int):
        self.sample_count = spp
        self._update_resolution()

    def next_1d(self, state, active=None):
        n = state.rng.state_lo.shape[0]
        idx = self.current_sample_index(state, n)
        perm_seed = state.permutation_seed + state.dimension_index
        state = state._replace(dimension_index=state.dimension_index + 1)
        p = permute_kensler(idx, self.sample_count, perm_seed, active)
        if self.jitter:
            j, rng = pcg32_next_f32(state.rng, active)
            state = state._replace(rng=rng)
        else:
            j = jnp.float32(0.5)
        return (p.astype(jnp.float32) + j) / self.sample_count, state

    def next_2d(self, state, active=None):
        n = state.rng.state_lo.shape[0]
        idx = self.current_sample_index(state, n)
        perm_seed = state.permutation_seed + state.dimension_index
        state = state._replace(dimension_index=state.dimension_index + 1)
        p = permute_kensler(idx, self.sample_count, perm_seed, active)
        res = self.resolution
        y = p // res
        x = p - y * res
        if self.jitter:
            jx, rng = pcg32_next_f32(state.rng, active)
            jy, rng = pcg32_next_f32(rng, active)
            state = state._replace(rng=rng)
        else:
            jx = jy = jnp.float32(0.5)
        inv = 1.0 / res
        return ((x.astype(jnp.float32) + jx) * inv,
                (y.astype(jnp.float32) + jy) * inv), state


register_plugin("sampler", "stratified")(StratifiedSampler)


@register_plugin("sampler", "multijitter")
class MultijitterSampler(Sampler):
    """Correlated multi-jittered sampler
    (reference src/samplers/multijitter.cpp, Kensler 2013)."""
    kind = "multijitter"

    def __init__(self, props: Properties):
        super().__init__(props)
        self.jitter = props.get_bool("jitter", True)
        self._update_resolution()

    def _update_resolution(self):
        import math as _m
        rx = max(1, int(_m.sqrt(self.sample_count)))
        while rx * rx < self.sample_count:
            rx += 1
        ry = (self.sample_count + rx - 1) // rx
        self.res_x, self.res_y = rx, ry
        self.sample_count = rx * ry

    def set_sample_count(self, spp: int):
        self.sample_count = spp
        self._update_resolution()

    def next_1d(self, state, active=None):
        n = state.rng.state_lo.shape[0]
        idx = self.current_sample_index(state, n)
        perm_seed = state.permutation_seed + state.dimension_index
        state = state._replace(dimension_index=state.dimension_index + 1)
        p = permute_kensler(idx, self.sample_count,
                            perm_seed * jnp.uint32(0x45FBE943), active)
        if self.jitter:
            j, rng = pcg32_next_f32(state.rng, active)
            state = state._replace(rng=rng)
        else:
            j = jnp.float32(0.5)
        return (p.astype(jnp.float32) + j) / self.sample_count, state

    def next_2d(self, state, active=None):
        n = state.rng.state_lo.shape[0]
        idx = self.current_sample_index(state, n)
        perm_seed = state.permutation_seed + state.dimension_index
        state = state._replace(dimension_index=state.dimension_index + 1)
        s = permute_kensler(idx, self.sample_count,
                            perm_seed * jnp.uint32(0x51633E2D), active)
        rx, ry = self.res_x, self.res_y
        y = s // rx
        x = s - y * rx
        sx = permute_kensler(x, rx, perm_seed * jnp.uint32(0x68BC21EB), active)
        sy = permute_kensler(y, ry, perm_seed * jnp.uint32(0x02E5BE93), active)
        if self.jitter:
            jx, rng = pcg32_next_f32(state.rng, active)
            jy, rng = pcg32_next_f32(rng, active)
            state = state._replace(rng=rng)
        else:
            jx = jy = jnp.float32(0.5)
        fx = (x.astype(jnp.float32) + (sy.astype(jnp.float32) + jx) / ry) / rx
        fy = (y.astype(jnp.float32) + (sx.astype(jnp.float32) + jy) / rx) / ry
        return (fx, fy), state


# Sobol' second-dimension direction numbers: v[0] = 2^31,
# v[k+1] = v[k] ^ (v[k] >> 1) — together with the van der Corput first
# dimension this forms the classic (0,2)-sequence in base 2
_SOBOL2_DIRS = []
_v = 1 << 31
for _ in range(32):
    _SOBOL2_DIRS.append(_v)
    _v ^= _v >> 1
_SOBOL2_DIRS = tuple(_SOBOL2_DIRS)


@register_plugin("sampler", "ldsampler")
class LDSampler(Sampler):
    """Low-discrepancy sampler (reference src/samplers/ldsampler.cpp):
    each 2D draw is a scrambled (0,2)-sequence pair — van der Corput +
    Sobol' — so every dyadic elementary interval of area 1/N holds exactly
    one of N = 2^m samples (the reference's sample02 structure). 1D draws
    use the scrambled van der Corput sequence per dimension."""
    kind = "ldsampler"

    def __init__(self, props: Properties):
        super().__init__(props)

    @staticmethod
    def _vdc(idx, scramble):
        v = idx
        # bit-reverse a uint32
        v = ((v >> 16) | (v << 16))
        v = (((v & jnp.uint32(0x00FF00FF)) << 8) | ((v & jnp.uint32(0xFF00FF00)) >> 8))
        v = (((v & jnp.uint32(0x0F0F0F0F)) << 4) | ((v & jnp.uint32(0xF0F0F0F0)) >> 4))
        v = (((v & jnp.uint32(0x33333333)) << 2) | ((v & jnp.uint32(0xCCCCCCCC)) >> 2))
        v = (((v & jnp.uint32(0x55555555)) << 1) | ((v & jnp.uint32(0xAAAAAAAA)) >> 1))
        v = v ^ scramble
        return v.astype(jnp.float32) * jnp.float32(2.3283064365386963e-10)

    @staticmethod
    def _sobol2(idx, scramble):
        v = scramble
        for bit, d in enumerate(_SOBOL2_DIRS):
            hit = ((idx >> jnp.uint32(bit)) & jnp.uint32(1)) != 0
            v = jnp.where(hit, v ^ jnp.uint32(d), v)
        return v.astype(jnp.float32) * jnp.float32(2.3283064365386963e-10)

    def next_1d(self, state, active=None):
        n = state.rng.state_lo.shape[0]
        idx = self.current_sample_index(state, n)
        scramble = state.permutation_seed + state.dimension_index * jnp.uint32(0x9E3779B9)
        state = state._replace(dimension_index=state.dimension_index + 1)
        return self._vdc(idx, scramble), state

    def next_2d(self, state, active=None):
        n = state.rng.state_lo.shape[0]
        idx = self.current_sample_index(state, n)
        s1 = state.permutation_seed + state.dimension_index * jnp.uint32(0x9E3779B9)
        s2 = state.permutation_seed + state.dimension_index * jnp.uint32(0x8D2FBC71) + jnp.uint32(0x4B1BD1B5)
        state = state._replace(dimension_index=state.dimension_index + 1)
        return (self._vdc(idx, s1), self._sobol2(idx, s2)), state


@register_plugin("sampler", "orthogonal")
class OrthogonalSampler(Sampler):
    """Orthogonal-array sampler (reference src/samplers/orthogonal.cpp):
    Bose construction for strength 2 (orthogonal.cpp:215-243), Bush for
    higher strengths (:194-212), both with the correlated multi-jitter
    randomization. The grid resolution is the smallest prime whose square
    covers the requested spp (:94-108)."""
    kind = "orthogonal"

    def __init__(self, props: Properties):
        super().__init__(props)
        self.strength = props.get_int("strength", 2)
        self.jitter = props.get_bool("jitter", True)
        self._update_resolution()

    @staticmethod
    def _is_prime(x):
        if x < 2:
            return False
        k = 2
        while k * k <= x:
            if x % k == 0:
                return False
            k += 1
        return True

    def _update_resolution(self):
        r = 2
        while r * r < self.sample_count or not self._is_prime(r):
            r += 1
        self.resolution = r
        self.sample_count = r * r

    def set_sample_count(self, spp: int):
        self.sample_count = spp
        self._update_resolution()

    def _jitter(self, state, active):
        if self.jitter:
            j, rng = pcg32_next_f32(state.rng, active)
            return j, state._replace(rng=rng)
        return jnp.float32(0.5), state

    def next_1d(self, state, active=None):
        n = state.rng.state_lo.shape[0]
        i = self.current_sample_index(state, n)
        p = state.permutation_seed
        j = state.dimension_index.astype(jnp.uint32)
        state = state._replace(dimension_index=state.dimension_index + 1)
        res = self.resolution
        if self.strength != 2:
            return self._bush(state, i, j, p, active)
        # Bose construction (strength 2)
        i = permute_kensler(i % jnp.uint32(self.sample_count),
                            self.sample_count, p, active)
        a_i0 = i // jnp.uint32(res)
        a_i1 = i - a_i0 * jnp.uint32(res)
        k = jnp.where(j % 2 > 0, j - jnp.uint32(1), j + jnp.uint32(1))
        a_ij = (a_i0 + (j - jnp.uint32(1)) * a_i1) % jnp.uint32(res)
        a_ik = (a_i0 + (k - jnp.uint32(1)) * a_i1) % jnp.uint32(res)
        a_ij = jnp.where(j == 0, a_i0, jnp.where(j == 1, a_i1, a_ij))
        a_ik = jnp.where(j == 0, a_i1, jnp.where(j == 1, a_i0, a_ik))
        stratum = permute_kensler(a_ij, res,
                                  p * (j + 1) * jnp.uint32(0x51633e2d),
                                  active)
        sub = permute_kensler(a_ik, res,
                              p * (j + 1) * jnp.uint32(0x68bc21eb), active)
        jit, state = self._jitter(state, active)
        v = (stratum.astype(jnp.float32)
             + (sub.astype(jnp.float32) + jit) / res) / res
        return v, state

    def _bush(self, state, i, j, p, active):
        res = self.resolution
        N = res ** self.strength
        stm = N // res
        i = permute_kensler(i % jnp.uint32(N), N, p, active)
        # digits of i in base res, reinterpreted as a polynomial at x = j
        digits = []
        tmp = i
        for _ in range(self.strength):
            digits.append(tmp % jnp.uint32(res))
            tmp = tmp // jnp.uint32(res)
        phi = jnp.zeros_like(i)
        for dgt in reversed(digits):
            phi = phi * j + dgt
        stratum = permute_kensler(phi % jnp.uint32(res), res,
                                  p * (j + 1) * jnp.uint32(0x51633e2d),
                                  active)
        sub = permute_kensler((i // jnp.uint32(res)) % jnp.uint32(stm), stm,
                              p * (j + 1) * jnp.uint32(0x68bc21eb), active)
        jit, state = self._jitter(state, active)
        v = (stratum.astype(jnp.float32)
             + (sub.astype(jnp.float32) + jit) / stm) / res
        return v, state

    def next_2d(self, state, active=None):
        f1, state = self.next_1d(state, active)
        f2, state = self.next_1d(state, active)
        return (f1, f2), state
