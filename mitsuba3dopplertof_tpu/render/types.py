"""Wavefront record types.

These are SoA pytrees (NamedTuples of jnp arrays, one entry per lane) — the
TPU-native equivalent of the reference's Ray3f / SurfaceInteraction3f /
DirectionSample3f Dr.Jit structs (reference include/mitsuba/core/ray.h,
include/mitsuba/render/interaction.h). All shapes are (N, ...) with N the
wavefront size; every field is a dense array so the whole record flows
through jit/scan/shard_map without host sync.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from ..core.math import dot, normalize, norm

# Epsilons matching reference include/mitsuba/core/math.h:18-22
RAY_EPSILON = float(1.5e3 * 2.0 ** -24)       # ~8.94e-5
SHADOW_EPSILON = RAY_EPSILON * 10.0


class Ray(NamedTuple):
    o: jnp.ndarray          # (N, 3)
    d: jnp.ndarray          # (N, 3)
    time: jnp.ndarray       # (N,)
    maxt: jnp.ndarray       # (N,)

    @staticmethod
    def make(o, d, time=None, maxt=None):
        n = o.shape[:-1]
        if time is None:
            time = jnp.zeros(n, dtype=o.dtype)
        if maxt is None:
            maxt = jnp.full(n, jnp.inf, dtype=o.dtype)
        return Ray(o, d, time, maxt)


class SurfaceInteraction(NamedTuple):
    """Surface interaction record. ``valid`` replaces si.is_valid()."""
    valid: jnp.ndarray      # (N,) bool
    t: jnp.ndarray          # (N,) hit distance
    p: jnp.ndarray          # (N, 3) world position
    n: jnp.ndarray          # (N, 3) geometric normal (world)
    sh_n: jnp.ndarray       # (N, 3) shading normal (world) == frame z
    sh_s: jnp.ndarray       # (N, 3) frame tangent
    sh_t: jnp.ndarray       # (N, 3) frame bitangent
    uv: jnp.ndarray         # (N, 2)
    wi: jnp.ndarray         # (N, 3) incident direction in *local* frame
    inst: jnp.ndarray       # (N,) int32 instance index (-1 = miss)
    prim: jnp.ndarray       # (N,) int32 primitive (triangle) index
    time: jnp.ndarray       # (N,)

    def to_local(self, v):
        return jnp.stack([dot(v, self.sh_s), dot(v, self.sh_t),
                          dot(v, self.sh_n)], axis=-1)

    def to_world(self, v):
        return (v[..., 0:1] * self.sh_s + v[..., 1:2] * self.sh_t
                + v[..., 2:3] * self.sh_n)

    # -- ray spawning (reference interaction.h:136-167) --------------------
    def _offset_p(self, d):
        mag = (1.0 + jnp.max(jnp.abs(self.p), axis=-1)) * RAY_EPSILON
        mag = jnp.where(dot(self.n, d) >= 0.0, mag, -mag)
        return self.p + mag[..., None] * self.n

    def spawn_ray(self, d):
        return Ray(self._offset_p(d), d, self.time,
                   jnp.full(self.t.shape, jnp.inf, dtype=self.t.dtype))

    def spawn_ray_to(self, target):
        o = self._offset_p(target - self.p)
        d = target - o
        dist = norm(d)
        d = d / jnp.maximum(dist[..., None], 1e-20)
        return Ray(o, d, self.time, dist * (1.0 - SHADOW_EPSILON))


class DirectionSample(NamedTuple):
    """NEE sample record (reference include/mitsuba/render/records.h)."""
    p: jnp.ndarray          # (N, 3) sampled position on emitter
    n: jnp.ndarray          # (N, 3) emitter normal at p
    d: jnp.ndarray          # (N, 3) unit direction ref -> p
    dist: jnp.ndarray       # (N,)
    pdf: jnp.ndarray        # (N,) solid-angle pdf (0 => invalid)
    delta: jnp.ndarray      # (N,) bool
    emitter: jnp.ndarray    # (N,) int32 emitter index (-1 = none)
    uv: jnp.ndarray         # (N, 2)


__all__ = ["Ray", "SurfaceInteraction", "DirectionSample",
           "RAY_EPSILON", "SHADOW_EPSILON"]
