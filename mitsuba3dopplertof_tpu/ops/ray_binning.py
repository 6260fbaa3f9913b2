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


def bin_key(ray: Ray, lo, hi) -> jnp.ndarray:
    """Coherence sort key per lane. ``lo``/``hi``: (3,) scene bounds.
    Lanes with maxt<=0 get the dead key (sort last, cull everything).

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

    morton = (_part1by2(q(ray.o.x, 0))
              | (_part1by2(q(ray.o.y, 1)) << 1)
              | (_part1by2(q(ray.o.z, 2)) << 2))
    ax_ = jnp.abs(ray.d.x)
    ay_ = jnp.abs(ray.d.y)
    az_ = jnp.abs(ray.d.z)
    s = ax_ + ay_ + az_
    inv = 1.0 / jnp.maximum(s, 1e-30)
    db = (((ax_ * inv * 7.9999).astype(jnp.int32) << 3)
          | (ay_ * inv * 7.9999).astype(jnp.int32))
    key = (octant << 27) | (morton << 6) | db
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
    n = ray.o.x.shape[0]
    aabb = sa.chunk_aabb
    lo = jnp.min(aabb[:, :3], axis=0)
    hi = jnp.max(aabb[:, 3:], axis=0)
    maxt = ray.maxt if active is None else jnp.where(active, ray.maxt, -1.0)
    key = bin_key(ray._replace(maxt=maxt), lo, hi)
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


__all__ = ["binned", "bin_key", "should_bin"]
