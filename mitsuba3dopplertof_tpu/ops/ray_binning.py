"""Ray binning: manufacture lane-block coherence for the streamed kernel.

The streamed Pallas kernel (intersect_stream.py) culls triangle chunks per
LANE BLOCK (64/128 rows x 128 lanes) with one conservative slab test over
the block's ray bounds. Primary rays are coherent by construction (pixel
order), but bounce and shadow rays scatter across the scene: a block whose
rays point everywhere has useless bounds and visits every chunk — the O(T)
wall measured at >=10k triangles.

The fix is the TPU-native analog of the reference GPU's ray sorting /
shader-execution-reordering (the role OptiX's hardware scheduler plays for
scene_optix.inl traversal): sort the wavefront by a spatial-directional
key before the kernel and restore order after. On TPU a device-wide
multi-operand `lax.sort` is a dense, HBM-bandwidth-bound primitive (unlike
per-lane gathers, which serialize on the scalar core inside kernels), so
the whole reorder costs ~2 sorts of the wavefront per query — milliseconds
at 1M lanes — against a chunk-visit reduction that is often 10-100x.

Key layout (int32, ascending):
  * bit 30:      dead lane (inactive / maxt<=0) -> sorts last; whole blocks
                 of dead lanes cull every chunk via the block maxt bound
  * bits 21-23:  direction octant — blocks get same-sign d per axis, the
                 precondition for the slab test's axis culling
  * bits 0-20:   7-bit-per-axis Morton code of the quantized ray origin —
                 consecutive lanes get tight origin bounds

Scene bounds for quantization come from the chunk AABB table already
computed for culling (min/max over chunks, a trivial in-graph reduce).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..core.vec import Vec3
from ..render.types import Ray

_DEAD_KEY = jnp.int32(1 << 30)


def _part1by2(x):
    """Spread the low 7 bits of x so there are 2 zero bits between each
    (standard Morton interleave, 32-bit variant)."""
    x = x & 0x7F
    x = (x | (x << 8)) & 0x0300F00F
    x = (x | (x << 4)) & 0x030C30C3
    x = (x | (x << 2)) & 0x09249249
    return x


def first_super(ray: Ray, super_aabb) -> jnp.ndarray:
    """Index of the nearest super-chunk AABB each ray enters (int32; S =
    rows of ``super_aabb`` sorts last for rays that enter none).

    This is the cheap proxy for "which part of the scene does this ray's
    traversal start in": rays grouped by it agree on the PREFIX of their
    front-to-back visit lists, which is exactly what shrinks a lane
    block's visit-list union (scripts/coherence_lab.py: bounce-ray block
    unions are 8-15x the per-ray ideal under origin-Morton order alone).
    Runs as a fori loop over supers so no (N, S) buffer materializes."""
    S = super_aabb.shape[0]
    inv_x = 1.0 / jnp.where(ray.d.x == 0.0, 1e-30, ray.d.x)
    inv_y = 1.0 / jnp.where(ray.d.y == 0.0, 1e-30, ray.d.y)
    inv_z = 1.0 / jnp.where(ray.d.z == 0.0, 1e-30, ray.d.z)
    n = ray.o.x.shape[0]

    def body(s, carry):
        best_t, best_i = carry
        box = super_aabb[s]
        t0x = (box[0] - ray.o.x) * inv_x
        t1x = (box[3] - ray.o.x) * inv_x
        t0y = (box[1] - ray.o.y) * inv_y
        t1y = (box[4] - ray.o.y) * inv_y
        t0z = (box[2] - ray.o.z) * inv_z
        t1z = (box[5] - ray.o.z) * inv_z
        t_lo = jnp.maximum(jnp.maximum(jnp.minimum(t0x, t1x),
                                       jnp.minimum(t0y, t1y)),
                           jnp.maximum(jnp.minimum(t0z, t1z), 0.0))
        t_hi = jnp.minimum(jnp.minimum(jnp.maximum(t0x, t1x),
                                       jnp.maximum(t0y, t1y)),
                           jnp.minimum(jnp.maximum(t0z, t1z), ray.maxt))
        hit = (t_lo <= t_hi) & (box[0] <= box[3])
        t_ent = jnp.where(hit, t_lo, jnp.float32(np.inf))
        better = t_ent < best_t
        return (jnp.where(better, t_ent, best_t),
                jnp.where(better, jnp.int32(s), best_i))

    _, first = jax.lax.fori_loop(
        0, S, body, (jnp.full((n,), jnp.inf, jnp.float32),
                     jnp.full((n,), S, jnp.int32)))
    return first


def super_boxes(chunk_aabb, max_supers: int = 64):
    """Union consecutive (Morton-ordered) chunk AABBs into <= max_supers
    super boxes for the first_super prepass."""
    C = chunk_aabb.shape[0]
    width = -(-C // max_supers)
    S = -(-C // width)
    pad = S * width - C
    lo = jnp.concatenate([chunk_aabb[:, :3],
                          jnp.full((pad, 3), np.inf, jnp.float32)])
    hi = jnp.concatenate([chunk_aabb[:, 3:],
                          jnp.full((pad, 3), -np.inf, jnp.float32)])
    lo = lo.reshape(S, width, 3).min(axis=1)
    hi = hi.reshape(S, width, 3).max(axis=1)
    return jnp.concatenate([lo, hi], axis=-1)


def bin_key(ray: Ray, lo, hi, super_aabb=None) -> jnp.ndarray:
    """Coherence sort key per lane. ``lo``/``hi``: (3,) scene bounds.
    Lanes with maxt<=0 get the dead key (sort last, cull everything).

    With ``super_aabb`` (opt-in, MI_BIN_FIRSTSUPER=1), the top bits group
    rays by the super-chunk their traversal enters first (see
    first_super). Paired-ratio A/B (round 4) measured this 16-18% slower
    than the legacy key on both camera and bounce rays of the 40k bench
    scene — kept as a lab knob for scenes where traversal-prefix sharing
    may yet dominate (e.g. heavily occluded interiors).

    The octant sits above the origin Morton code: it makes a block's d
    same-sign per axis, the slab test's precondition. Finer direction bits
    at HIGHER priority than the origin were measured SLOWER at 10k tris
    (they fragment origin locality) — but 6 direction bits BELOW the
    origin Morton code subdivide only lanes whose quantized origins tie
    (camera rays from one pinhole, bounce clusters off one surface cell),
    which is exactly where a block's direction bounds were previously the
    whole octant. Strictly finer blocks, same origin order."""
    octant = ((ray.d.x < 0).astype(jnp.int32)
              | ((ray.d.y < 0).astype(jnp.int32) << 1)
              | ((ray.d.z < 0).astype(jnp.int32) << 2))
    ext = jnp.maximum(hi - lo, 1e-30)

    def q(p, ax):
        t = jnp.clip((p - lo[ax]) / ext[ax], 0.0, 1.0)
        return (t * 127.0).astype(jnp.int32)

    ax_ = jnp.abs(ray.d.x)
    ay_ = jnp.abs(ray.d.y)
    s = ax_ + ay_ + jnp.abs(ray.d.z)
    inv = 1.0 / jnp.maximum(s, 1e-30)
    db = (((ax_ * inv * 7.9999).astype(jnp.int32) << 3)
          | (ay_ * inv * 7.9999).astype(jnp.int32))
    morton = (_part1by2(q(ray.o.x, 0))
              | (_part1by2(q(ray.o.y, 1)) << 1)
              | (_part1by2(q(ray.o.z, 2)) << 2))
    if super_aabb is None:
        key = (octant << 27) | (morton << 6) | db
    else:
        # full 21-bit morton kept (coarsening it regresses bounce rays,
        # whose origins sit ON the geometry); the 6 direction sub-bits
        # give way to the first-super group id
        fs = jnp.minimum(first_super(ray, super_aabb), 63)
        key = (fs << 24) | (octant << 21) | morton
    return jnp.where(ray.maxt <= 0.0, _DEAD_KEY, key)


def should_bin(sa, n_lanes: int, rows_per_block: int, lanes: int) -> bool:
    """Binning pays only when there are multiple lane blocks to specialize
    and enough chunks that the O(visited chunks) kernel cost dominates the
    reorder sorts (and their one-time compile cost, see `binned`)."""
    import os
    if os.environ.get("MI_NO_RAY_BINNING"):
        return False
    if sa.chunk_aabb is None:
        return False
    n_tris = sa.n_static_tris + sa.n_anim_tris
    block = rows_per_block * lanes
    return n_tris > 1024 and n_lanes > block


def binned(sa, ray: Ray, active, run):
    """Sort the wavefront by `bin_key`, call ``run(sorted_ray) -> [outs]``
    ((N,) arrays), and restore original lane order. ``active`` (optional
    bool mask) deadens lanes via maxt so their blocks cull everything —
    the wavefront analog of the reference's masked trace.

    Implementation note (all measured on v5e through the same toolchain):
    XLA gathers/scatters run at ~30-90M elems/s (scalar-core serialized) —
    a gather-based permute costs ~0.25s per query at 1M lanes, eating the
    culling win. A device-wide multi-operand `lax.sort`, in contrast,
    executes at >10G elems/s (<1ms here) — "sort is the TPU's permute".
    Its cost is COMPILE time (~6s per operand instance), which is why the
    payload is carried in exactly two variadic sorts (forward rays,
    restore outputs) instead of per-field sorts, `time` is dropped for
    static scenes, and the package enables the persistent XLA compilation
    cache so the cost is paid once per scene shape ever."""
    import os
    n = ray.o.x.shape[0]
    aabb = sa.chunk_aabb
    lo = jnp.min(aabb[:, :3], axis=0)
    hi = jnp.max(aabb[:, 3:], axis=0)
    maxt = ray.maxt if active is None else jnp.where(active, ray.maxt, -1.0)
    # first-super grouping is OPT-IN: paired-ratio A/B on v5e (round 4,
    # _keylab.py, 40k animated scene) measured it 16-18% SLOWER than the
    # legacy key on both camera and bounce populations — the group id
    # fragments origin locality more than prefix-sharing buys back
    sup = super_boxes(aabb) if os.environ.get("MI_BIN_FIRSTSUPER") else None
    key = bin_key(ray._replace(maxt=maxt), lo, hi, super_aabb=sup)
    lane = jnp.arange(n, dtype=jnp.int32)
    carry_time = bool(sa.anim_ranges)
    ops = (key, lane, ray.o.x, ray.o.y, ray.o.z,
           ray.d.x, ray.d.y, ray.d.z, maxt) + (
        (ray.time,) if carry_time else ())
    s = jax.lax.sort(ops, num_keys=1)
    lane_s = s[1]
    time_s = s[9] if carry_time else ray.time
    ray_s = Ray(Vec3(s[2], s[3], s[4]), Vec3(s[5], s[6], s[7]),
                time_s, s[8])
    outs = run(ray_s)
    outs = [o.astype(jnp.int32) if o.dtype == jnp.bool_ else o for o in outs]
    restored = jax.lax.sort(tuple([lane_s] + outs), num_keys=1)
    return list(restored[1:])


__all__ = ["binned", "bin_key", "should_bin", "first_super", "super_boxes"]
