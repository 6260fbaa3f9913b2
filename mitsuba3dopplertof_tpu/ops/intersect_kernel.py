"""Pallas TPU ray-intersection kernels.

The hot irregular op of the renderer (SURVEY.md §7 hard-part #1). XLA's
auto-fusion leaves the triangle loop memory-bound (measured ~27ms / 1M rays
/ 42 tris); this kernel keeps the per-ray state (best-t, index,
barycentrics, geometric normal) in registers across the whole triangle
loop, streams ray components through VMEM in (ROWS x 128) tiles, and
broadcasts triangle data from SMEM scalars — compute-bound VPU work.

Two entry points mirroring the reference's queries
(reference src/render/scene.cpp:125-167):
  * ``intersect_pallas``: closest-hit with (t, prim, u, v, gn) payload —
    the Pallas analog of the OptiX closest-hit payload registers
    (reference scene_optix.inl:552-570).
  * ``ray_test_pallas``:  boolean any-hit.

Motion blur happens *inside* the kernel: animated instances' keyframe
matrices live in SMEM; each ray is transformed by the inverse of its own
time-lerped matrix (semantics of reference instance.cpp:155-250 +
transform.h:458-466) before testing that instance's triangle range.

This brute-force-over-triangles kernel is optimal for small/medium scenes
(every ray tests every triangle, perfectly regular); the two-level BVH
variant swaps in for large scenes behind the same signature.
"""

from __future__ import annotations

import functools
import math
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128
# rows per grid step: block = (ROWS, 128) lanes. Keep the working set
# (10 in + 7 out + ~10 live temps, double-buffered) within the ~16MB scoped
# VMEM: 128 rows -> 64KB per array, ~3MB total.
DEF_ROWS = 128

_NEG = jnp.float32(-1.0)


class HitRecord(NamedTuple):
    t: jnp.ndarray        # (N,) inf on miss
    prim: jnp.ndarray     # (N,) int32 global triangle slot (-1 miss)
    u: jnp.ndarray        # (N,) barycentric
    v: jnp.ndarray
    gnx: jnp.ndarray      # geometric normal (hit space: object space for
    gny: jnp.ndarray      # animated instances), unnormalized e1 x e2
    gnz: jnp.ndarray


def _tri_hit(ox, oy, oz, dx, dy, dz, maxt, tri, bt):
    """Möller-Trumbore for one triangle (9 SMEM scalars) over a lane tile."""
    v0x, v0y, v0z, e1x, e1y, e1z, e2x, e2y, e2z = tri
    px = dy * e2z - dz * e2y
    py = dz * e2x - dx * e2z
    pz = dx * e2y - dy * e2x
    det = e1x * px + e1y * py + e1z * pz
    ok = jnp.abs(det) > 1e-12
    inv = 1.0 / jnp.where(ok, det, 1.0)
    tx = ox - v0x
    ty = oy - v0y
    tz = oz - v0z
    u = (tx * px + ty * py + tz * pz) * inv
    qx = ty * e1z - tz * e1y
    qy = tz * e1x - tx * e1z
    qz = tx * e1y - ty * e1x
    v = (dx * qx + dy * qy + dz * qz) * inv
    t = (e2x * qx + e2y * qy + e2z * qz) * inv
    hit = (ok & (u >= 0.0) & (v >= 0.0) & (u + v <= 1.0)
           & (t > 0.0) & (t < maxt) & (t < bt))
    return hit, t, u, v


def _inv_lerped(mc0, mc1, tw0, tw1, time):
    """Per-lane inverse of the clamped keyframe lerp of two 3x4 matrices
    given as SMEM scalar 12-tuples (reference transform.h:458-466)."""
    span = tw1 - tw0
    denom = jnp.where(span != 0.0, span, 1.0)
    uu = jnp.clip((time - tw0) / denom, 0.0, 1.0)
    c = [m0 * (1.0 - uu) + m1 * uu for m0, m1 in zip(mc0, mc1)]
    a00, a01, a02, t0, a10, a11, a12, t1, a20, a21, a22, t2 = c
    c00 = a11 * a22 - a12 * a21
    c01 = a02 * a21 - a01 * a22
    c02 = a01 * a12 - a02 * a11
    c10 = a12 * a20 - a10 * a22
    c11 = a00 * a22 - a02 * a20
    c12 = a02 * a10 - a00 * a12
    c20 = a10 * a21 - a11 * a20
    c21 = a01 * a20 - a00 * a21
    c22 = a00 * a11 - a01 * a10
    det = a00 * c00 + a01 * c10 + a02 * c20
    inv = 1.0 / det
    i = (c00 * inv, c01 * inv, c02 * inv, c10 * inv, c11 * inv, c12 * inv,
         c20 * inv, c21 * inv, c22 * inv)
    nt0 = -(i[0] * t0 + i[1] * t1 + i[2] * t2)
    nt1 = -(i[3] * t0 + i[4] * t1 + i[5] * t2)
    nt2 = -(i[6] * t0 + i[7] * t1 + i[8] * t2)
    return i, (nt0, nt1, nt2)


def _build_kernel(n_static: int, anim_ranges: Tuple[Tuple[int, int, int], ...],
                  any_hit: bool):
    """Kernel body closure. Triangle/instance data arrive via SMEM refs."""

    def kernel(tri_ref, inst_ref,            # SMEM tables
               ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref,
               time_ref, maxt_ref,           # VMEM lane tiles
               *out_refs):
        ox = ox_ref[:]
        oy = oy_ref[:]
        oz = oz_ref[:]
        dx = dx_ref[:]
        dy = dy_ref[:]
        dz = dz_ref[:]
        maxt = maxt_ref[:]

        bt = jnp.full(ox.shape, jnp.inf, jnp.float32)
        bi = jnp.full(ox.shape, -1, jnp.int32)
        if not any_hit:
            bu = jnp.zeros(ox.shape, jnp.float32)
            bv = jnp.zeros(ox.shape, jnp.float32)
            gx = jnp.zeros(ox.shape, jnp.float32)
            gy = jnp.zeros(ox.shape, jnp.float32)
            gz = jnp.zeros(ox.shape, jnp.float32)

        def tri(i):
            return tuple(tri_ref[i, j] for j in range(9))

        def apply_hits(ws, i, o3, d3):
            nonlocal bt, bi, bu, bv, gx, gy, gz
            hit, t, u, v = _tri_hit(*o3, *d3, maxt, ws, bt)
            bt = jnp.where(hit, t, bt)
            bi = jnp.where(hit, i, bi)
            if not any_hit:
                v0x, v0y, v0z, e1x, e1y, e1z, e2x, e2y, e2z = ws
                bu = jnp.where(hit, u, bu)
                bv = jnp.where(hit, v, bv)
                gx = jnp.where(hit, e1y * e2z - e1z * e2y, gx)
                gy = jnp.where(hit, e1z * e2x - e1x * e2z, gy)
                gz = jnp.where(hit, e1x * e2y - e1y * e2x, gz)

        # ---- static triangles (world space) ----------------------------
        for i in range(n_static):
            apply_hits(tri(i), i, (ox, oy, oz), (dx, dy, dz))

        # ---- animated instances: object-space rays at per-lane time ----
        if anim_ranges:
            time = time_ref[:]
            for a, (inst, start, count) in enumerate(anim_ranges):
                mc0 = tuple(inst_ref[a, j] for j in range(12))
                mc1 = tuple(inst_ref[a, 12 + j] for j in range(12))
                tw0 = inst_ref[a, 24]
                tw1 = inst_ref[a, 25]
                i3, it3 = _inv_lerped(mc0, mc1, tw0, tw1, time)
                oox = i3[0] * ox + i3[1] * oy + i3[2] * oz + it3[0]
                ooy = i3[3] * ox + i3[4] * oy + i3[5] * oz + it3[1]
                ooz = i3[6] * ox + i3[7] * oy + i3[8] * oz + it3[2]
                odx = i3[0] * dx + i3[1] * dy + i3[2] * dz
                ody = i3[3] * dx + i3[4] * dy + i3[5] * dz
                odz = i3[6] * dx + i3[7] * dy + i3[8] * dz
                for k in range(count):
                    slot = n_static + start + k
                    apply_hits(tri(slot), slot,
                               (oox, ooy, ooz), (odx, ody, odz))

        if any_hit:
            out_refs[0][:] = (bi >= 0).astype(jnp.int32)
        else:
            out_refs[0][:] = bt
            out_refs[1][:] = bi
            out_refs[2][:] = bu
            out_refs[3][:] = bv
            out_refs[4][:] = gx
            out_refs[5][:] = gy
            out_refs[6][:] = gz

    return kernel


@functools.lru_cache(maxsize=64)
def _compiled(n_static: int, anim_ranges, any_hit: bool, n_rows: int,
              rows_per_block: int, n_tris_padded: int, n_anim_inst: int,
              interpret: bool):
    kernel = _build_kernel(n_static, anim_ranges, any_hit)
    grid = (n_rows // rows_per_block,)
    lane_spec = pl.BlockSpec((rows_per_block, LANES), lambda i: (i, 0),
                             memory_space=pltpu.VMEM)
    in_specs = [
        pl.BlockSpec(memory_space=pltpu.SMEM),   # tri table
        pl.BlockSpec(memory_space=pltpu.SMEM),   # instance table
    ] + [lane_spec] * 8
    if any_hit:
        out_shape = [jax.ShapeDtypeStruct((n_rows, LANES), jnp.int32)]
        out_specs = [lane_spec]
    else:
        out_shape = [
            jax.ShapeDtypeStruct((n_rows, LANES), jnp.float32),
            jax.ShapeDtypeStruct((n_rows, LANES), jnp.int32),
        ] + [jax.ShapeDtypeStruct((n_rows, LANES), jnp.float32)] * 5
        out_specs = [lane_spec] * 7

    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        interpret=interpret,
    )


def _lane_tiles(arr, n_rows):
    return arr.reshape(n_rows, LANES)


def _run(sa, ray, any_hit: bool, rows_per_block: int = DEF_ROWS):
    n = ray.o.x.shape[0]
    n_pad = -(-n // (rows_per_block * LANES)) * (rows_per_block * LANES)
    n_rows = n_pad // LANES

    def pad(x, fill=0.0):
        if n_pad == n:
            return x
        return jnp.concatenate(
            [x, jnp.full((n_pad - n,), fill, x.dtype)], axis=0)

    # triangle table (T_total, 9): static rows then animated rows
    cols = ("v0x", "v0y", "v0z", "e1x", "e1y", "e1z", "e2x", "e2y", "e2z")
    stat = jnp.stack([sa.tri("s", c)[:max(sa.n_static_tris, 1)]
                      for c in cols], axis=-1)
    if sa.n_static_tris == 0:
        stat = stat[:0]
    anim = jnp.stack([sa.tri("a", c)[:max(sa.n_anim_tris, 1)]
                      for c in cols], axis=-1)
    if sa.n_anim_tris == 0:
        anim = anim[:0]
    tri_table = jnp.concatenate([stat, anim], axis=0)
    if tri_table.shape[0] == 0:
        tri_table = jnp.zeros((1, 9), jnp.float32)

    # instance table (A, 26): m0 (12) + m1 (12) + t0 + t1
    if sa.anim_ranges:
        rows = []
        for (inst, start, count) in sa.anim_ranges:
            rows.append(jnp.concatenate([
                sa.inst_m0c[:, inst], sa.inst_m1c[:, inst],
                sa.inst_t0[inst][None], sa.inst_t1[inst][None]]))
        inst_table = jnp.stack(rows, axis=0)
    else:
        inst_table = jnp.zeros((1, 26), jnp.float32)

    interpret = jax.default_backend() == "cpu"
    fn = _compiled(sa.n_static_tris, tuple(sa.anim_ranges), any_hit, n_rows,
                   min(rows_per_block, n_rows), int(tri_table.shape[0]),
                   int(inst_table.shape[0]), interpret)

    args = [tri_table, inst_table] + [
        _lane_tiles(pad(getattr(ray.o, c)), n_rows) for c in "xyz"] + [
        _lane_tiles(pad(getattr(ray.d, c)), n_rows) for c in "xyz"] + [
        _lane_tiles(pad(ray.time), n_rows),
        _lane_tiles(pad(ray.maxt, fill=-1.0), n_rows),
    ]
    outs = fn(*args)
    outs = [o.reshape(-1)[:n] for o in outs]
    return outs


def intersect_pallas(sa, ray) -> HitRecord:
    bt, bi, u, v, gx, gy, gz = _run(sa, ray, any_hit=False)
    return HitRecord(bt, bi, u, v, gx, gy, gz)


def ray_test_pallas(sa, ray):
    (occ,) = _run(sa, ray, any_hit=True)
    return occ > 0


__all__ = ["intersect_pallas", "ray_test_pallas", "HitRecord"]
