"""v2 large-scene intersection: two-phase VPU kernel with per-block
front-to-back visit lists, on-demand chunk DMA, and early termination.

This is the TPU-native replacement for ordered BVH traversal (the role of
reference scene_optix.inl:552-570 / scene_embree.inl:203-299), built from
three measured facts about this hardware (PROGRESS.md round-2 ledger +
scripts/traversal_lab.py):

  1. COMPUTE dominates, not DMA: at 40k tris the v1 stream kernel's cost
     is the Möller loop over every chunk that passes the static slab test
     — and the static test alone leaves 25-45% of chunks for camera rays
     and 15-35% for bounce rays, because a ray's frustum crosses the
     whole scene even though its closest hit is in the first chunk along
     the ray. Ordering visits by conservative entry distance and stopping
     at the first block-wide hit is worth an order of magnitude, exactly
     like ordered BVH traversal.
  2. Per-lane pointer chasing is fatal (gathers serialize on the scalar
     core) but PER-BLOCK scalar control is free: the visit list is
     computed densely in XLA (`intersect_mxu._visit_order`), sorted by
     entry distance, and consumed with two scalar reads per chunk.
  3. The MXU formulation loses (K=8 contraction at ~6% utilization,
     f32-HIGHEST 6-pass emulation — see intersect_mxu.py): the VPU Möller
     loop with phase 1 restricted to (t, prim) is faster per triangle and
     its VMEM state is two accumulators, so lane blocks can be large.

Early termination (the piece v1 lacks): chunks are visited in ascending
conservative entry distance t_lo. A lane can still improve iff
t_lo <= min(best_t, maxt, box_exit): past its scene-box EXIT distance a
ray can hit nothing (all geometry lives in the box), so blocks of
escaping bounce rays terminate as fast as blocks where every lane hit.
The per-lane bound rides in as maxt' = min(maxt, exit*(1+1e-3)+1e-4)
(computed densely in XLA), making one block-wide bound
t_term = max_lanes(min(best_t, maxt')) that is monotonically
non-increasing — which is what makes the DMA prefetch sound: the chunk
for visit v+1 is prefetched iff t_lo[v+1] <= t_term_now, and because
t_term only shrinks, a chunk that was not prefetched can never be needed
later. The while-loop condition IS the prefetch condition one step
behind, so the body runs exactly when its buffer has a DMA in flight.

Memory strategy: phase-1 triangle records (v0, e1, e2 = 9 floats, padded
to 16 sublanes for DMA tiling) stay in HBM as (n_chunks, 16, 128) and one
8 KB chunk is copied HBM->SMEM only when its visit survives ordering —
double-buffered so the copy hides under the previous chunk's ~30 us of
VPU work. 32-triangle sub-box refinement (4 sub-AABBs per 128-tri chunk,
the same boxes v1 culls with) gates each quarter of the unrolled loop.

Phase 2 reuses `intersect_mxu.payload_from_prim`: one row-gather + dense
recompute of the winning triangle's fat payload (reference
instance.cpp:155-250 compute_surface_interaction).
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
from .intersect_stream import CHUNK, PAD_TO, _chunked_layout
from .intersect_mxu import _visit_order, _inst_table, payload_from_prim

T = PAD_TO                  # triangles per visit chunk (= transform-group pad)
SUBS = T // CHUNK           # 32-tri culling sub-boxes per chunk
TRI_ROWS = 16               # 9 used rows padded to a DMA-tileable sublane count
DEF_ROWS = 128              # lanes per block = DEF_ROWS * 128
_BIG = np.float32(3.0e38)


def _build_v2_kernel(any_hit: bool, has_anim: bool, c_pad: int,
                     profile: str = ""):

    def kernel(meta_ref,     # (2, n_chunks) SMEM [anim slot | -1, slot0]
               sub_ref,      # (6, SUBS*n_chunks) SMEM 32-tri world AABBs
               inst_ref,     # (n_anim, 26) SMEM animated instance records
               tri_hbm,      # (n_chunks, TRI_ROWS, T) ANY/HBM Möller records
               order_hbm,    # (nb8/8, 8, c_pad) ANY/HBM visit order
               tlo_hbm,      # (nb8/8, 8, c_pad) ANY/HBM sorted entry dists
               ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref,
               time_ref, maxt_ref,          # (rows, 128) VMEM; maxt is maxt'
               t_out, prim_out,             # (rows, 128) VMEM outputs
               order_smem, tlo_smem,        # (8, c_pad) SMEM scratch
               tri_smem,                    # (2, TRI_ROWS, T) SMEM scratch
               blk_ref,                     # (16,) SMEM block ray bounds
               sem_o, sem_t, sem_tri):      # DMA semaphores (sem_tri: (2,))
        i = pl.program_id(0)
        slab = jax.lax.div(i, 8)
        row = jax.lax.rem(i, 8)

        do = pltpu.make_async_copy(order_hbm.at[slab], order_smem, sem_o)
        dt_ = pltpu.make_async_copy(tlo_hbm.at[slab], tlo_smem, sem_t)
        do.start()
        dt_.start()

        t_out[:] = jnp.full(t_out.shape, jnp.inf, jnp.float32)
        prim_out[:] = jnp.full(prim_out.shape, -1, jnp.int32)

        # block-wide conservative ray bounds for the sub-box slab tests
        for ax, r in enumerate((ox_ref, oy_ref, oz_ref)):
            v = r[:]
            blk_ref[ax] = jnp.min(v)
            blk_ref[3 + ax] = jnp.max(v)
        for ax, r in enumerate((dx_ref, dy_ref, dz_ref)):
            v = r[:]
            blk_ref[6 + ax] = jnp.min(v)
            blk_ref[9 + ax] = jnp.max(v)
        if profile == "countsub":
            blk_ref[12] = 0.0
        do.wait()
        dt_.wait()

        def t_term():
            """Block-wide improvement bound: monotonically non-increasing.
            closest-hit: a lane can still improve iff the next chunk's
            entry distance is below min(best_t, maxt'); any-hit: iff the
            lane is still unoccluded (then bounded by maxt')."""
            if profile == "noterm":
                return jnp.float32(1e36)
            if any_hit:
                per_lane = jnp.where(prim_out[:] >= 0, -_BIG, maxt_ref[:])
            else:
                per_lane = jnp.minimum(t_out[:], maxt_ref[:])
            # cap strictly below the _BIG pad key of the visit list so a
            # degenerate unbounded lane cannot make `pad_tlo <= t_term`
            # true and walk the pad entries
            return jnp.minimum(jnp.max(per_lane), jnp.float32(1e37))

        # conservative (block, box) interval slab test — same algebra as
        # intersect_stream.py (o/d intervals per axis; mixed-sign d
        # disables the axis)
        def slab_test(box, t_hi):
            t_lo = jnp.float32(0.0)
            for ax in range(3):
                ol, oh = blk_ref[ax], blk_ref[3 + ax]
                dl, dh = blk_ref[6 + ax], blk_ref[9 + ax]
                bmin, bmax = box(ax)
                same_sign = (dl > 1e-12) | (dh < -1e-12)
                inv_a = 1.0 / jnp.where(same_sign, dl, 1.0)
                inv_b = 1.0 / jnp.where(same_sign, dh, 1.0)
                lo = _BIG
                hi = -_BIG
                for p in (bmin, bmax):
                    for oo in (ol, oh):
                        num = p - oo
                        for iv in (inv_a, inv_b):
                            val = num * iv
                            lo = jnp.minimum(lo, val)
                            hi = jnp.maximum(hi, val)
                lo = jnp.where(same_sign, lo, -_BIG)
                hi = jnp.where(same_sign, hi, _BIG)
                t_lo = jnp.maximum(t_lo, lo)
                t_hi = jnp.minimum(t_hi, hi)
            return t_lo <= t_hi

        def dma_for(v):
            k = order_smem[row, v]
            b = jax.lax.rem(v, 2)
            return pltpu.make_async_copy(
                tri_hbm.at[k], tri_smem.at[b], sem_tri.at[b])

        def process(v, bound):
            k = order_smem[row, v]
            b = jax.lax.rem(v, 2)
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

            for s in range(SUBS):
                poss = slab_test(
                    lambda ax, s=s: (sub_ref[ax, k * SUBS + s],
                                     sub_ref[3 + ax, k * SUBS + s]),
                    bound)

                @pl.when(poss)
                def _sub_body(s=s):
                    if profile == "countsub":    # executed-quarter counter
                        blk_ref[12] = blk_ref[12] + 1.0
                    best_t = t_out[:]
                    best_p = prim_out[:]
                    for j in range(s * CHUNK, (s + 1) * CHUNK):
                        v0x = tri_smem[b, 0, j]
                        v0y = tri_smem[b, 1, j]
                        v0z = tri_smem[b, 2, j]
                        e1x = tri_smem[b, 3, j]
                        e1y = tri_smem[b, 4, j]
                        e1z = tri_smem[b, 5, j]
                        e2x = tri_smem[b, 6, j]
                        e2y = tri_smem[b, 7, j]
                        e2z = tri_smem[b, 8, j]
                        px = rdy * e2z - rdz * e2y
                        py = rdz * e2x - rdx * e2z
                        pz = rdx * e2y - rdy * e2x
                        det = e1x * px + e1y * py + e1z * pz
                        okd = jnp.abs(det) > 1e-12
                        inv = 1.0 / jnp.where(okd, det, 1.0)
                        tx = rox - v0x
                        ty = roy - v0y
                        tz = roz - v0z
                        u = (tx * px + ty * py + tz * pz) * inv
                        qx = ty * e1z - tz * e1y
                        qy = tz * e1x - tx * e1z
                        qz = tx * e1y - ty * e1x
                        vv = (rdx * qx + rdy * qy + rdz * qz) * inv
                        t = (e2x * qx + e2y * qy + e2z * qz) * inv
                        hit = (okd & (u >= 0.0) & (vv >= 0.0)
                               & (u + vv <= 1.0) & (t > 0.0) & (t < maxt)
                               & (t < best_t))
                        best_t = jnp.where(hit, t, best_t)
                        best_p = jnp.where(hit, slot0 + j, best_p)
                    t_out[:] = best_t
                    prim_out[:] = best_p

        # ---- ordered traversal with prefetch-coupled while loop ----------
        # invariant: the loop body runs for visit v exactly when the DMA
        # for v was started (the condition tlo[v] <= t_term was evaluated
        # on the SAME t_term value both times — monotonicity makes stale
        # prefetch decisions a superset of later run decisions, never a
        # subset, so no chunk is both needed and unfetched).
        t0 = t_term()

        if profile != "nodma":
            @pl.when(tlo_smem[row, 0] <= t0)
            def _first():
                dma_for(0).start()

        def cond(carry):
            v, t_prev, _ = carry
            tv = tlo_smem[row, jnp.minimum(v, c_pad - 1)]
            return (v < c_pad) & (tv <= t_prev)

        def body(carry):
            # the carried pref flag records whether the PREVIOUS iteration
            # started the DMA for visit v+1 — prefetch uses the bound
            # available BEFORE processing v (stale but conservative:
            # monotone t_term makes the stale decision a superset of the
            # loop condition at v+1), so the copy overlaps v's compute;
            # a started-but-then-terminated copy is drained after the loop
            v, t_prev, pref = carry
            if profile != "nodma":
                dma_for(v).wait()
            bound = t_term()
            nxt = jnp.minimum(v + 1, c_pad - 1)
            pref_next = (v + 1 < c_pad) & (tlo_smem[row, nxt] <= bound)

            if profile != "nodma":
                @pl.when(pref_next)
                def _prefetch():
                    dma_for(v + 1).start()

            if profile != "noop":
                @pl.when(tlo_smem[row, v] <= bound)
                def _run():
                    process(v, bound)

            return v + 1, t_term(), pref_next

        vend, _, pref_end = jax.lax.while_loop(
            cond, body, (jnp.int32(0), t0, tlo_smem[row, 0] <= t0))
        if profile != "nodma":
            # drain: the loop exited at v=vend whose DMA may be in flight
            @pl.when(pref_end & (vend < c_pad))
            def _drain():
                dma_for(vend).wait()
        if profile == "count":
            t_out[:] = jnp.full(t_out.shape, 1.0, jnp.float32) * \
                vend.astype(jnp.float32)
        if profile == "countsub":
            t_out[:] = jnp.full(t_out.shape, 1.0, jnp.float32) * blk_ref[12]

    return kernel


@functools.lru_cache(maxsize=16)
def _compiled_v2(any_hit: bool, has_anim: bool, n_rows: int,
                 rows_per_block: int, c_pad: int, interpret: bool,
                 profile: str = ""):
    kernel = _build_v2_kernel(any_hit, has_anim, c_pad, profile)
    grid = (n_rows // rows_per_block,)
    lane = pl.BlockSpec((rows_per_block, LANES), lambda i: (i, 0),
                        memory_space=pltpu.VMEM)
    in_specs = [
        pl.BlockSpec(memory_space=pltpu.SMEM),        # meta
        pl.BlockSpec(memory_space=pltpu.SMEM),        # sub AABBs
        pl.BlockSpec(memory_space=pltpu.SMEM),        # instances
        pl.BlockSpec(memory_space=pl.ANY),            # tri records (HBM)
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
            pltpu.SMEM((2, TRI_ROWS, T), jnp.float32),
            pltpu.SMEM((16,), jnp.float32),
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",)),
    )


def _tri_records(sa, segments, n_chunks: int):
    """In-graph phase-1 triangle table, (n_chunks, TRI_ROWS, T) f32:
    rows 0-8 = v0/e1/e2 components, rest zero (degenerate pad triangles
    have zero edges -> det == 0 -> never hit)."""
    cols = ("v0x", "v0y", "v0z", "e1x", "e1y", "e1z", "e2x", "e2y", "e2z")
    parts = []
    for kind, start, count in segments:
        if kind == "pad":
            parts.append(jnp.zeros((count, 9), jnp.float32))
            continue
        parts.append(jnp.stack(
            [sa.tri(kind, c)[start:start + count] for c in cols], axis=-1))
    p = jnp.concatenate(parts, axis=0)                   # (C*T, 9)
    p = p.reshape(n_chunks, T, 9).transpose(0, 2, 1)     # (C, 9, T)
    return jnp.concatenate(
        [p, jnp.zeros((n_chunks, TRI_ROWS - 9, T), jnp.float32)], axis=1)


def scene_box_exit(sub, o, d):
    """Per-lane exit distance of the overall scene box (union of the live
    chunk AABBs): a ray can hit nothing past the point where it leaves the
    box, so min(maxt, exit) is a valid per-lane traversal bound. Rays that
    miss the box entirely get -1 (dead: the whole block culls). Dense XLA.
    """
    lo = jnp.min(sub[:, :3], axis=0)                     # inverted pads
    hi = jnp.max(sub[:, 3:], axis=0)                     # union away
    t_en = jnp.full_like(o[0], -_BIG)
    t_ex = jnp.full_like(o[0], _BIG)
    for ax in range(3):
        da = d[ax]
        oa = o[ax]
        ok = jnp.abs(da) > 1e-20
        inv = 1.0 / jnp.where(ok, da, 1.0)
        ta = (lo[ax] - oa) * inv
        tb = (hi[ax] - oa) * inv
        alo = jnp.minimum(ta, tb)
        ahi = jnp.maximum(ta, tb)
        inside = (oa >= lo[ax]) & (oa <= hi[ax])
        alo = jnp.where(ok, alo, jnp.where(inside, -_BIG, _BIG))
        ahi = jnp.where(ok, ahi, jnp.where(inside, _BIG, -_BIG))
        t_en = jnp.maximum(t_en, alo)
        t_ex = jnp.minimum(t_ex, ahi)
    hit_box = (t_en <= t_ex) & (t_ex > 0.0)
    ex_pad = jnp.minimum(t_ex, _BIG) * 1.001 + 1e-4
    return jnp.where(hit_box, ex_pad, -1.0)


def v2_rows() -> int:
    return int(os.environ.get("MI_V2_ROWS", DEF_ROWS))


def intersect_v2(sa, ray, any_hit: bool = False, rows_per_block: int = None,
                 profile: str = None):
    """Phase-1 closest-hit (or any-hit) over all triangles. Returns
    (t, prim) with prim in the global slot convention; the caller merges
    spheres and reconstructs the payload with `payload_from_prim`.

    `profile` selects a diagnostic kernel variant ("", "noop", "nodma",
    "noterm", "count"); it defaults to MI_V2_PROFILE but should be passed
    explicitly by sweeps so a jitted caller cannot bake a stale env value
    at trace time."""
    if rows_per_block is None:
        rows_per_block = v2_rows()
    if profile is None:
        profile = os.environ.get("MI_V2_PROFILE", "")
    n = ray.o.x.shape[0]
    blk = rows_per_block * LANES
    n_pad = -(-n // blk) * blk
    n_rows = n_pad // LANES

    segments, meta32 = _chunked_layout(sa.n_static_tris, sa.anim_ranges)
    n_chunks = meta32.shape[0] // SUBS
    meta = meta32[::SUBS]
    tri = _tri_records(sa, segments, n_chunks)
    inst_table = _inst_table(sa)
    has_anim = bool(sa.anim_ranges)

    sub = sa.chunk_aabb
    if sub is None:
        sub = jnp.concatenate(
            [jnp.full((SUBS * n_chunks, 3), -_BIG),
             jnp.full((SUBS * n_chunks, 3), _BIG)], axis=1)
    c_pad = -(-n_chunks // 128) * 128      # visit-table DMA: 128-col tiles

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
    exit_t = scene_box_exit(sub, o, d)
    maxtp = jnp.minimum(pad(jnp.minimum(ray.maxt, _BIG), fill=-1.0), exit_t)

    # visit order over the (8, N) packed layout _visit_order expects
    x = jnp.stack(list(o) + [jnp.ones((n_pad,), jnp.float32)]
                  + list(d) + [maxtp], axis=0)
    order, tlo = _visit_order(sub, n_chunks, c_pad, x, min(blk, n_pad))

    interpret = jax.default_backend() == "cpu"
    fn = _compiled_v2(any_hit, has_anim, n_rows,
                      min(rows_per_block, n_rows), c_pad, interpret,
                      profile)
    args = [jnp.asarray(meta.T), sub.T, inst_table, tri, order, tlo] + [
        c.reshape(n_rows, LANES) for c in o] + [
        c.reshape(n_rows, LANES) for c in d] + [
        pad(ray.time).reshape(n_rows, LANES),
        maxtp.reshape(n_rows, LANES)]
    t_o, prim_o = fn(*args)
    return t_o.reshape(-1)[:n], prim_o.reshape(-1)[:n]


__all__ = ["intersect_v2", "payload_from_prim", "scene_box_exit"]
