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
                     profile: str = "", seeded: bool = False,
                     cap: int = 0, report_end: bool = False):
    n_groups = c_pad // GROUP
    eff_groups = min(n_groups, cap) if cap else n_groups

    def kernel(meta_ref,     # (2, n_units) SMEM [anim slot | -1, slot0]
               inst_ref,     # (n_anim, 26) SMEM animated instance records
               tri_hbm,      # (n_units, REC_ROWS, 128) ANY/HBM Woop records
               order_hbm,    # (nb8/8, 8, c_pad) ANY/HBM visit order
               tlo_hbm,      # (nb8/8, 8, c_pad) ANY/HBM sorted entry dists
               *rest):
        # rest: ox oy oz dx dy dz time maxt [t_in p_in] t_out prim_out
        #       [bound_out] order_smem tlo_smem tri_smem slab_ref sems
        (ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref,
         time_ref, maxt_ref) = rest[:8]
        k = 8
        if seeded:
            t_in_ref, p_in_ref = rest[k:k + 2]
            k += 2
        t_out, prim_out = rest[k:k + 2]
        k += 2
        if report_end:
            bound_out = rest[k]
            k += 1
        (order_smem, tlo_smem, tri_smem, slab_ref,
         sem_o, sem_t, sem_tri) = rest[k:]
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

        if seeded:
            # round-2 seeding: start from round-1 results so finished
            # (deadened) lanes pass through and survivors keep their
            # current-best hit as the strict-improvement threshold
            t_out[:] = t_in_ref[:]
            prim_out[:] = p_in_ref[:]
        else:
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
            return (g < eff_groups) & (tg <= bound)

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

        if report_end:
            # entry distance of the first unit this block did NOT visit
            # (the _BIG pad key when the list was exhausted): a lane whose
            # own termination value is below it can never improve — the
            # per-lane done test for the two-round traversal
            nxt = tlo_smem[row, jnp.minimum(gend * GROUP, c_pad - 1)]
            bound_out[:] = jnp.full(bound_out.shape, nxt, jnp.float32)

        if profile == "count":
            t_out[:] = jnp.full(t_out.shape, 1.0, jnp.float32) * \
                gend.astype(jnp.float32)

    return kernel


@functools.lru_cache(maxsize=32)
def _compiled_v4(any_hit: bool, has_anim: bool, n_rows: int,
                 rows_per_block: int, c_pad: int, interpret: bool,
                 profile: str = "", seeded: bool = False, cap: int = 0,
                 report_end: bool = False):
    kernel = _build_v4_kernel(any_hit, has_anim, c_pad, profile,
                              seeded, cap, report_end)
    grid = (n_rows // rows_per_block,)
    lane = pl.BlockSpec((rows_per_block, LANES), lambda i: (i, 0),
                        memory_space=pltpu.VMEM)
    in_specs = [
        pl.BlockSpec(memory_space=pltpu.SMEM),        # meta
        pl.BlockSpec(memory_space=pltpu.SMEM),        # instances
        pl.BlockSpec(memory_space=pl.ANY),            # Woop records (HBM)
        pl.BlockSpec(memory_space=pl.ANY),            # visit order (HBM)
        pl.BlockSpec(memory_space=pl.ANY),            # entry dists (HBM)
    ] + [lane] * (10 if seeded else 8)
    out_shape = [jax.ShapeDtypeStruct((n_rows, LANES), jnp.float32),
                 jax.ShapeDtypeStruct((n_rows, LANES), jnp.int32)]
    if report_end:
        out_shape.append(jax.ShapeDtypeStruct((n_rows, LANES), jnp.float32))
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=[lane] * len(out_shape),
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


def _v4_tables(sa):
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
    return meta32, tri, inst_table, has_anim, box, n_units, c_pad


def _pad_to(x, n_pad, fill=None):
    n = x.shape[0]
    if n_pad == n:
        return x
    if fill is None:          # edge-replicate keeps block ray bounds tight
        tail = jnp.broadcast_to(x[-1], (n_pad - n,)).astype(x.dtype)
    else:
        tail = jnp.full((n_pad - n,), fill, x.dtype)
    return jnp.concatenate([x, tail], axis=0)


def _v4_call(tables, oxyz, dxyz, time, maxt, any_hit, rows_per_block,
             profile="", seed=None, cap=0, report_end=False, precomp=None):
    """One kernel launch over already-ordered (N,) ray columns. ``maxt``
    must already be the deadened per-lane maxt (inactive lanes < 0);
    the scene-box exit clamp and visit-order precompute happen here
    (pass ``precomp=(order, tlo)`` to reuse tables across rounds — any
    conservative superset of the live lanes' reachable units is valid).
    Returns (t, prim[, first_unvisited_tlo]) at n_pad length."""
    meta32, tri, inst_table, has_anim, box, n_units, c_pad = tables
    n = oxyz[0].shape[0]
    blk = rows_per_block * LANES
    n_pad = -(-n // blk) * blk
    n_rows = n_pad // LANES

    o = tuple(_pad_to(c, n_pad) for c in oxyz)
    d = tuple(_pad_to(c, n_pad) for c in dxyz)
    exit_t = scene_box_exit(box, o, d)
    maxtp = jnp.minimum(_pad_to(jnp.minimum(maxt, _BIG), n_pad, fill=-1.0),
                        exit_t)
    if precomp is not None:
        order, tlo = precomp
    else:
        x = jnp.stack(list(o) + [jnp.ones((n_pad,), jnp.float32)]
                      + list(d) + [maxtp], axis=0)
        order, tlo = _unit_visit_order(box, n_units, c_pad, x,
                                       min(blk, n_pad))

    interpret = jax.default_backend() == "cpu"
    fn = _compiled_v4(any_hit, has_anim, n_rows,
                      min(rows_per_block, n_rows), c_pad, interpret,
                      profile, seed is not None, cap, report_end)
    args = [jnp.asarray(meta32.T), inst_table, tri, order, tlo] + [
        c.reshape(n_rows, LANES) for c in o] + [
        c.reshape(n_rows, LANES) for c in d] + [
        _pad_to(time, n_pad).reshape(n_rows, LANES),
        maxtp.reshape(n_rows, LANES)]
    if seed is not None:
        t_in, p_in = seed
        args += [_pad_to(t_in, n_pad, fill=jnp.inf).reshape(n_rows, LANES),
                 _pad_to(p_in, n_pad, fill=-1).reshape(n_rows, LANES)]
    outs = fn(*args)
    return tuple(o_.reshape(-1)[:n] for o_ in outs) + (maxtp[:n],)


def intersect_v4(sa, ray, any_hit: bool = False, rows_per_block: int = None,
                 profile: str = None):
    """Phase-1 closest-hit (or any-hit) over all triangles, 32-tri Woop
    visit units in groups of 8 per loop iteration. Returns (t, prim) in
    the global slot convention; the caller merges spheres and reconstructs
    the payload with `payload_from_prim`."""
    if rows_per_block is None:
        rows_per_block = v4_rows()
    if profile is None:
        profile = os.environ.get("MI_V4_PROFILE", "")
    tables = _v4_tables(sa)
    t_o, prim_o, _ = _v4_call(
        tables, (ray.o.x, ray.o.y, ray.o.z), (ray.d.x, ray.d.y, ray.d.z),
        ray.time, ray.maxt, any_hit, rows_per_block, profile)
    return t_o, prim_o


def v4_cap() -> int:
    return int(os.environ.get("MI_V4_CAP", "16"))


def intersect_v4_2lite(sa, ray, any_hit: bool = False,
                       rows_per_block: int = None, cap: int = None):
    """Two-round bound tightening WITHOUT resorting (round 5).

    The single-round kernel's waste is the tail: a block whose monotone
    termination bound is set by one far/miss lane walks its whole
    front-to-back list. Round 1 walks at most ``cap`` groups per block
    and reports the entry distance of the first unit it did NOT visit;
    a lane whose own termination value lies below that bound is provably
    finished (any unvisited unit can only produce t >= its entry
    distance). Finished lanes are deadened (maxt = -1) so they drop out
    of the block bound, and round 2 re-runs the SAME blocks with the
    SAME visit tables (no second sort, no second visit-order
    precompute), seeded with round-1 bests — revisits are idempotent
    under the strict-improvement hit test. A block whose lanes all
    finished starts with bound = -1 < every entry key and exits without
    visiting a unit.

    vs ``intersect_v4_2r`` (kept for fat spp-sliced unions): no lane
    permutation, so survivors stay thinly spread — the win is bounded by
    how concentrated the tail blocks are, but the fixed overhead is two
    cheap kernel launches instead of three variadic sorts + a second
    precompute. Reference role: per-ray BVH early-out
    (scene_embree.inl:203-299).

    Expects pre-sorted rays (call through ``ray_binning.binned``).
    Returns (t, prim) in input lane order."""
    if rows_per_block is None:
        rows_per_block = v4_rows()
    if cap is None:
        cap = v4_cap()
    tables = _v4_tables(sa)
    box, n_units, c_pad = tables[4], tables[5], tables[6]
    oxyz = (ray.o.x, ray.o.y, ray.o.z)
    dxyz = (ray.d.x, ray.d.y, ray.d.z)
    n = oxyz[0].shape[0]
    blk = rows_per_block * LANES
    n_pad = -(-n // blk) * blk
    o = tuple(_pad_to(c, n_pad) for c in oxyz)
    d = tuple(_pad_to(c, n_pad) for c in dxyz)
    exit_t = scene_box_exit(box, o, d)
    maxtp = jnp.minimum(
        _pad_to(jnp.minimum(ray.maxt, _BIG), n_pad, fill=-1.0), exit_t)
    x = jnp.stack(list(o) + [jnp.ones((n_pad,), jnp.float32)]
                  + list(d) + [maxtp], axis=0)
    pre = _unit_visit_order(box, n_units, c_pad, x, min(blk, n_pad))

    t1, prim1, bound1, maxtp1 = _v4_call(
        tables, oxyz, dxyz, ray.time, ray.maxt, any_hit, rows_per_block,
        cap=cap, report_end=True, precomp=pre)
    if any_hit:
        term = jnp.where(prim1 >= 0, -_BIG, maxtp1)
    else:
        term = jnp.minimum(t1, maxtp1)
    done = bound1 >= term
    maxt2 = jnp.where(done, -1.0, ray.maxt)
    t2, prim2, _ = _v4_call(
        tables, oxyz, dxyz, ray.time, maxt2, any_hit, rows_per_block,
        seed=(t1, prim1), precomp=pre)
    return t2, prim2


def v4_rows2() -> int:
    return int(os.environ.get("MI_V4_ROWS2", "8"))


def intersect_v4_2r(sa, ray, active=None, any_hit: bool = False,
                    rows_per_block: int = None, rows2: int = None,
                    cap: int = None):
    """Two-round bound-tightening traversal (binning included).

    The single-round kernel's waste is the BLOCK termination bound: it is
    a max over 4096 lanes, so one miss/far lane forces the whole block
    through its full front-to-back list (measured 40k-tri scene,
    _countlab.py: blocks visit 236-340 units vs a per-lane ideal of ~17).
    Round 1 walks at most ``cap`` groups per block and reports the entry
    distance of the first unit it did NOT visit; a lane whose own
    termination value (closest hit so far, or clamped maxt for misses)
    lies below that bound is provably finished. Survivors — typically a
    small minority — are re-sorted to the front (finished lanes deadened
    to sort last with empty visit lists), and a second, uncapped launch
    with smaller blocks and now-tight per-block bounds finishes them,
    seeded with round-1 bests so revisits stay idempotent.

    Reference role: Embree/OptiX ordered BVH traversal with early-out
    (scene_embree.inl:203-299, scene_optix.inl:552-570); the two-round
    split is the TPU-native substitute for their per-ray stacks.

    Returns (t, prim) in ORIGINAL lane order.
    """
    from .ray_binning import bin_key
    if rows_per_block is None:
        rows_per_block = v4_rows()
    if rows2 is None:
        rows2 = v4_rows2()
    if cap is None:
        cap = v4_cap()
    n = ray.o.x.shape[0]
    tables = _v4_tables(sa)
    box = tables[4]
    lo = jnp.min(box[:, :3], axis=0)
    hi = jnp.max(box[:, 3:], axis=0)

    maxt0 = ray.maxt if active is None else jnp.where(active, ray.maxt,
                                                      -1.0)
    key = bin_key(ray._replace(maxt=maxt0), lo, hi)
    lane = jnp.arange(n, dtype=jnp.int32)
    carry_time = bool(sa.anim_ranges)
    ops = (key, lane, ray.o.x, ray.o.y, ray.o.z,
           ray.d.x, ray.d.y, ray.d.z, maxt0) + (
        (ray.time,) if carry_time else ())
    s = jax.lax.sort(ops, num_keys=1)
    key_s, lane_s = s[0], s[1]
    o_s, d_s, maxt_s = s[2:5], s[5:8], s[8]
    time_s = s[9] if carry_time else ray.time

    t1, prim1, bound1, maxtp1 = _v4_call(
        tables, o_s, d_s, time_s, maxt_s, any_hit, rows_per_block,
        cap=cap, report_end=True)

    # per-lane done test: every unvisited unit's (block-conservative,
    # hence per-lane-conservative) entry distance is >= bound1; a unit
    # can only produce t >= its entry distance, and improving requires
    # strict t < term — so bound1 >= term means finished
    if any_hit:
        term = jnp.where(prim1 >= 0, -_BIG, maxtp1)
    else:
        term = jnp.minimum(t1, maxtp1)
    done = bound1 >= term

    key2 = jnp.where(done, key_s | jnp.int32(1 << 30), key_s)
    maxt2 = jnp.where(done, -1.0, maxt_s)
    ops2 = (key2, lane_s, o_s[0], o_s[1], o_s[2],
            d_s[0], d_s[1], d_s[2], maxt2, t1, prim1) + (
        (time_s,) if carry_time else ())
    s2 = jax.lax.sort(ops2, num_keys=1)
    lane_s2 = s2[1]
    o_s2, d_s2, maxt_s2 = s2[2:5], s2[5:8], s2[8]
    t1_p, prim1_p = s2[9], s2[10]
    time_s2 = s2[11] if carry_time else ray.time

    t2, prim2, _ = _v4_call(
        tables, o_s2, d_s2, time_s2, maxt_s2, any_hit, rows2,
        seed=(t1_p, prim1_p))

    back = jax.lax.sort((lane_s2, t2, prim2), num_keys=1)
    return back[1], back[2]


__all__ = ["intersect_v4", "intersect_v4_2r", "intersect_v4_2lite",
           "payload_from_prim"]
