"""v4 large-scene intersection: v3's 32-triangle Woop visit units with the
per-visit scalar work hoisted out of the kernel.

Why v3 lost to v2 on chip (round-3 BENCH_TABLE) despite testing 4x fewer
triangles per visit: the measured per-visit cost of the ordered-traversal
kernels is DOMINATED by per-iteration control — the while-loop backedge,
the in-kernel conservative slab test (~500 scalar ops), and two block-wide
t_term reductions — ~8.5 us/visit against ~3.4 us of Möller work at 128-tri
chunks (scripts/v2_decompose.py, 40k-tri scene, rows=8). Shrinking the
visit to 32 triangles cut the vector work 4x but kept the scalar overhead
per visit, so v3's smaller units never paid off.

v4 removes essentially all of it:

  * The geometric part of the per-visit gate is precomputed DENSELY in XLA:
    `_unit_visit_order` (shared with v3) already produces, per lane block,
    the units sorted by conservative entry distance t_lo with unreachable
    units keyed out. The kernel's remaining per-unit decision is ONE scalar
    compare `t_lo <= bound` — the dynamic half of the old slab test — since
    by monotonicity of the termination bound everything else was static.
  * Units are processed in GROUPS of 8 per while-loop iteration with NO
    conditional regions inside the body at all: because the visit list is
    sorted by entry distance, the units a block still needs always form a
    PREFIX of the list, so the only decision that matters is the loop
    condition "does this group's first unit still beat the bound". All 8
    units of a live group are DMA'd, waited and intersected
    unconditionally — reprocessing a unit (or touching ≤7 tail units past
    the true cut) is idempotent for closest-hit (strict t < best_t) and
    any-hit alike, and costs ~1 us/unit, while every @pl.when region and
    per-unit scalar gate it replaces measured ~0.5-1 us of scalar-pipeline
    serialization (scripts/v2_decompose.py + the round-4 v4 profile: the
    4-unit gated variant spent 8.2 us/group on control alone).
  * The DMA pipeline runs one GROUP ahead (8 unconditional 4 KB copies
    into the other half of a double buffer), so copies overlap the
    previous group's compute; one drain after the loop waits the final
    prefetched group.

Role match: ordered BVH traversal, reference scene_optix.inl:552-570 /
scene_embree.inl:203-299 (the Embree/OptiX backends of the reference).
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .intersect_kernel import LANES, _inv_lerped
from .intersect_stream import CHUNK, _chunked_layout
from .intersect_mxu import _inst_table, payload_from_prim
from .intersect_v2 import scene_box_exit
from .intersect_v3 import _woop_records, _unit_visit_order, REC_ROWS

GROUP = 8                   # units per while-loop iteration
# 32-row lane blocks: the fori-repeat lab (round 4, _kernrep.py, 40k+64k
# animated scenes) measured r32 fastest for BOTH camera and bounce
# populations — per-block loop overhead amortizes 4x vs r8 while the
# visit-list union grows only ~15%
DEF_ROWS = 32
_BIG = np.float32(3.0e38)


def _build_v4_kernel(any_hit: bool, has_anim: bool, c_pad: int,
                     profile: str = ""):
    n_groups = c_pad // GROUP

    def kernel(meta_ref,     # (2, n_units) SMEM [anim slot | -1, slot0]
               inst_ref,     # (n_anim, 26) SMEM animated instance records
               tri_hbm,      # (n_units, REC_ROWS, 128) ANY/HBM Woop records
               order_hbm,    # (nb8/8, 8, c_pad) ANY/HBM visit order
               tlo_hbm,      # (nb8/8, 8, c_pad) ANY/HBM sorted entry dists
               ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref,
               time_ref, maxt_ref,          # (rows, 128) VMEM; maxt is maxt'
               t_out, prim_out,             # (rows, 128) VMEM outputs
               order_smem, tlo_smem,        # (8, c_pad) SMEM scratch
               tri_smem,                    # (2, GROUP, REC_ROWS, 128) SMEM
               slab_ref,                    # (1,) SMEM: cached slab index
               sem_o, sem_t, sem_tri):      # DMA sems (sem_tri: (2, GROUP))
        i = pl.program_id(0)
        slab = jax.lax.div(i, 8)
        row = jax.lax.rem(i, 8)

        # visit tables are shared by the 8 consecutive blocks of a slab:
        # re-fetch only when this block starts a new slab (grid is serial)
        need = jnp.logical_or(i == 0, slab_ref[0] != slab)

        @pl.when(need)
        def _fetch_tables():
            do = pltpu.make_async_copy(order_hbm.at[slab], order_smem, sem_o)
            dt_ = pltpu.make_async_copy(tlo_hbm.at[slab], tlo_smem, sem_t)
            do.start()
            dt_.start()
            do.wait()
            dt_.wait()
            slab_ref[0] = slab

        t_out[:] = jnp.full(t_out.shape, jnp.inf, jnp.float32)
        prim_out[:] = jnp.full(prim_out.shape, -1, jnp.int32)

        def t_term():
            """Block-wide improvement bound, monotonically non-increasing
            (the DMA-gating invariant relies on this)."""
            if profile == "noterm":
                return jnp.float32(1e36)
            if any_hit:
                per_lane = jnp.where(prim_out[:] >= 0, -_BIG, maxt_ref[:])
            else:
                per_lane = jnp.minimum(t_out[:], maxt_ref[:])
            # strictly below the _BIG pad key of the visit list
            return jnp.minimum(jnp.max(per_lane), jnp.float32(1e37))

        def dma(g, q):
            k = order_smem[row, jnp.minimum(g * GROUP + q, c_pad - 1)]
            b = jax.lax.rem(g, 2)
            return pltpu.make_async_copy(
                tri_hbm.at[k], tri_smem.at[b, q], sem_tri.at[b, q])

        def start_group(g):
            """Unconditional DMA starts for group g (index-clamped past the
            list end; a duplicate fetch is harmless and branch-free)."""
            for q in range(GROUP):
                dma(g, q).start()

        def unit(g, q):
            """One 32-triangle Woop unit."""
            v = jnp.minimum(g * GROUP + q, c_pad - 1)
            k = order_smem[row, v]
            b = jax.lax.rem(g, 2)
            ox = ox_ref[:]
            oy = oy_ref[:]
            oz = oz_ref[:]
            dx = dx_ref[:]
            dy = dy_ref[:]
            dz = dz_ref[:]
            if has_anim:
                ci = meta_ref[0, k]
                cia = jnp.maximum(ci, 0)
                fa = (ci >= 0).astype(jnp.float32)
                om = 1.0 - fa
                time = time_ref[:]
                mc0 = tuple(inst_ref[cia, j] for j in range(12))
                mc1 = tuple(inst_ref[cia, 12 + j] for j in range(12))
                i3, it3 = _inv_lerped(mc0, mc1, inst_ref[cia, 24],
                                      inst_ref[cia, 25], time)
                rox = fa * (i3[0] * ox + i3[1] * oy + i3[2] * oz + it3[0]) + om * ox
                roy = fa * (i3[3] * ox + i3[4] * oy + i3[5] * oz + it3[1]) + om * oy
                roz = fa * (i3[6] * ox + i3[7] * oy + i3[8] * oz + it3[2]) + om * oz
                rdx = fa * (i3[0] * dx + i3[1] * dy + i3[2] * dz) + om * dx
                rdy = fa * (i3[3] * dx + i3[4] * dy + i3[5] * dz) + om * dy
                rdz = fa * (i3[6] * dx + i3[7] * dy + i3[8] * dz) + om * dz
            else:
                rox, roy, roz, rdx, rdy, rdz = ox, oy, oz, dx, dy, dz
            maxt = maxt_ref[:]
            slot0 = meta_ref[1, k]

            best_t = t_out[:]
            best_p = prim_out[:]
            for j in range(CHUNK):
                def cf(c, j=j):
                    flat = c * CHUNK + j
                    return tri_smem[b, q, flat // 128, flat % 128]
                ozp = cf(8) * rox + cf(9) * roy + cf(10) * roz + cf(11)
                dzp = cf(8) * rdx + cf(9) * rdy + cf(10) * rdz
                t = -ozp / dzp          # degenerate rows -> NaN -> no hit
                o0 = cf(0) * rox + cf(1) * roy + cf(2) * roz + cf(3)
                d0 = cf(0) * rdx + cf(1) * rdy + cf(2) * rdz
                u = o0 + t * d0
                o1 = cf(4) * rox + cf(5) * roy + cf(6) * roz + cf(7)
                d1 = cf(4) * rdx + cf(5) * rdy + cf(6) * rdz
                vv = o1 + t * d1
                hit = ((u >= 0.0) & (vv >= 0.0) & (u + vv <= 1.0)
                       & (t > 0.0) & (t < maxt) & (t < best_t))
                best_t = jnp.where(hit, t, best_t)
                best_p = jnp.where(hit, slot0 + j, best_p)
            t_out[:] = best_t
            prim_out[:] = best_p

        # ---- grouped ordered traversal ----------------------------------
        # carry = (g, bound): the body is branch-free — a live group (its
        # first, minimal entry distance beats the bound) is fetched,
        # waited and processed in full.
        start_group(0)

        def cond(carry):
            g, bound = carry
            tg = tlo_smem[row, jnp.minimum(g * GROUP, c_pad - 1)]
            return (g < n_groups) & (tg <= bound)

        def body(carry):
            g, bound = carry
            start_group(g + 1)            # prefetch under this group's work
            for q in range(GROUP):
                dma(g, q).wait()
                if profile != "noop":
                    unit(g, q)
            return g + 1, t_term()

        gend, _ = jax.lax.while_loop(cond, body, (jnp.int32(0), t_term()))

        # drain: group gend was prefetched (by the last body iteration, or
        # by the pre-loop start when the loop never ran)
        for q in range(GROUP):
            dma(gend, q).wait()

        if profile == "count":
            t_out[:] = jnp.full(t_out.shape, 1.0, jnp.float32) * \
                gend.astype(jnp.float32)

    return kernel


@functools.lru_cache(maxsize=16)
def _compiled_v4(any_hit: bool, has_anim: bool, n_rows: int,
                 rows_per_block: int, c_pad: int, interpret: bool,
                 profile: str = ""):
    kernel = _build_v4_kernel(any_hit, has_anim, c_pad, profile)
    grid = (n_rows // rows_per_block,)
    lane = pl.BlockSpec((rows_per_block, LANES), lambda i: (i, 0),
                        memory_space=pltpu.VMEM)
    in_specs = [
        pl.BlockSpec(memory_space=pltpu.SMEM),        # meta
        pl.BlockSpec(memory_space=pltpu.SMEM),        # instances
        pl.BlockSpec(memory_space=pl.ANY),            # Woop records (HBM)
        pl.BlockSpec(memory_space=pl.ANY),            # visit order (HBM)
        pl.BlockSpec(memory_space=pl.ANY),            # entry dists (HBM)
    ] + [lane] * 8
    out_shape = [jax.ShapeDtypeStruct((n_rows, LANES), jnp.float32),
                 jax.ShapeDtypeStruct((n_rows, LANES), jnp.int32)]
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=[lane, lane],
        out_shape=out_shape,
        scratch_shapes=[
            pltpu.SMEM((8, c_pad), jnp.int32),
            pltpu.SMEM((8, c_pad), jnp.float32),
            pltpu.SMEM((2, GROUP, REC_ROWS, 128), jnp.float32),
            pltpu.SMEM((1,), jnp.int32),
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA((2, GROUP)),
        ],
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
    )


def v4_rows() -> int:
    return int(os.environ.get("MI_V4_ROWS", DEF_ROWS))


def intersect_v4(sa, ray, any_hit: bool = False, rows_per_block: int = None,
                 profile: str = None):
    """Phase-1 closest-hit (or any-hit) over all triangles, 32-tri Woop
    visit units in groups of 4 per loop iteration. Returns (t, prim) in
    the global slot convention; the caller merges spheres and reconstructs
    the payload with `payload_from_prim`."""
    if rows_per_block is None:
        rows_per_block = v4_rows()
    if profile is None:
        profile = os.environ.get("MI_V4_PROFILE", "")
    n = ray.o.x.shape[0]
    blk = rows_per_block * LANES
    n_pad = -(-n // blk) * blk
    n_rows = n_pad // LANES

    segments, meta32 = _chunked_layout(sa.n_static_tris, sa.anim_ranges)
    n_units = meta32.shape[0]
    tri = _woop_records(sa, segments, n_units)
    inst_table = _inst_table(sa)
    has_anim = bool(sa.anim_ranges)

    box = sa.chunk_aabb
    if box is None:
        box = jnp.concatenate(
            [jnp.full((n_units, 3), -_BIG),
             jnp.full((n_units, 3), _BIG)], axis=1)
    c_pad = -(-n_units // 128) * 128

    def pad(x, fill=None):
        if n_pad == n:
            return x
        if fill is None:      # edge-replicate keeps block ray bounds tight
            tail = jnp.broadcast_to(x[-1], (n_pad - n,)).astype(x.dtype)
        else:
            tail = jnp.full((n_pad - n,), fill, x.dtype)
        return jnp.concatenate([x, tail], axis=0)

    o = (pad(ray.o.x), pad(ray.o.y), pad(ray.o.z))
    d = (pad(ray.d.x), pad(ray.d.y), pad(ray.d.z))
    exit_t = scene_box_exit(box, o, d)
    maxtp = jnp.minimum(pad(jnp.minimum(ray.maxt, _BIG), fill=-1.0), exit_t)

    x = jnp.stack(list(o) + [jnp.ones((n_pad,), jnp.float32)]
                  + list(d) + [maxtp], axis=0)
    order, tlo = _unit_visit_order(box, n_units, c_pad, x, min(blk, n_pad))

    interpret = jax.default_backend() == "cpu"
    fn = _compiled_v4(any_hit, has_anim, n_rows,
                      min(rows_per_block, n_rows), c_pad, interpret, profile)
    args = [jnp.asarray(meta32.T), inst_table, tri, order, tlo] + [
        c.reshape(n_rows, LANES) for c in o] + [
        c.reshape(n_rows, LANES) for c in d] + [
        pad(ray.time).reshape(n_rows, LANES),
        maxtp.reshape(n_rows, LANES)]
    t_o, prim_o = fn(*args)
    return t_o.reshape(-1)[:n], prim_o.reshape(-1)[:n]


__all__ = ["intersect_v4", "payload_from_prim"]
