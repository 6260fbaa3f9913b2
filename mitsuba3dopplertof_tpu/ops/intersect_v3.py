"""v3 large-scene intersection: v2's ordered traversal at 32-triangle
granularity with Woop unit-triangle records.

Two deltas against ops/intersect_v2.py (same traversal architecture —
per-block front-to-back visit lists, prefetch-coupled while loop, monotone
termination bound with per-lane scene-box exit caps):

  * visit unit = ONE 32-triangle chunk (v2: 128 triangles refined by four
    sub-box tests). Ordering, early termination and DMA now act at the
    culling granularity itself, which is where mid-size scenes live: at
    2k-10k triangles a lane block used to pay for a whole 128-tri chunk
    whenever any quarter of it passed.
  * the inner loop evaluates Woop's unit-triangle transform
    [Woop 2004; the same formulation the MXU kernel uses] instead of
    Möller-Trumbore: with rows of B = [e1|e2|e1xe2]^-1 and c = -B v0
    precomputed per triangle,
        t = -(r2.o + c2)/(r2.d),  u = (r0.o + c0) + t (r0.d),  v likewise
    is ~25% fewer VPU ops per triangle (the cross products fold into the
    precompute). Degenerate/pad triangles store all-zero rows -> t = 0/0
    = NaN -> every hit comparison is false (NaN-safe, no guard needed).

Records are (12 coeffs x 32 tris) = 384 floats packed into one (8, 128)
f32 tile — the minimum DMA-tileable SMEM block — so each visited chunk
costs a 4 KB HBM->SMEM copy, double-buffered behind the previous chunk's
compute. Phase 2 payload reconstruction reuses
`intersect_mxu.payload_from_prim` (global slot convention is shared).

Role match: ordered BVH traversal, reference scene_optix.inl:552-570 /
scene_embree.inl:203-299.
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

REC_ROWS = 8                # one (8, 128) tile holds 12 x 32 coefficients
DEF_ROWS = 128
_BIG = np.float32(3.0e38)


def _build_v3_kernel(any_hit: bool, has_anim: bool, c_pad: int,
                     profile: str = ""):

    def kernel(meta_ref,     # (2, n_units) SMEM [anim slot | -1, slot0]
               box_ref,      # (6, n_units) SMEM 32-tri world AABBs
               inst_ref,     # (n_anim, 26) SMEM animated instance records
               tri_hbm,      # (n_units, REC_ROWS, 128) ANY/HBM Woop records
               order_hbm,    # (nb8/8, 8, c_pad) ANY/HBM visit order
               tlo_hbm,      # (nb8/8, 8, c_pad) ANY/HBM sorted entry dists
               ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref,
               time_ref, maxt_ref,          # (rows, 128) VMEM; maxt is maxt'
               t_out, prim_out,             # (rows, 128) VMEM outputs
               order_smem, tlo_smem,        # (8, c_pad) SMEM scratch
               tri_smem,                    # (2, REC_ROWS, 128) SMEM scratch
               blk_ref,                     # (16,) SMEM block ray bounds
               slab_ref,                    # (1,) SMEM: cached slab index
               sem_o, sem_t, sem_tri):      # DMA semaphores (sem_tri: (2,))
        i = pl.program_id(0)
        slab = jax.lax.div(i, 8)
        row = jax.lax.rem(i, 8)

        # visit-table DMA is shared by the 8 consecutive blocks of a slab:
        # re-fetch only when this block starts a new slab (grid is serial)
        need = jnp.logical_or(i == 0, slab_ref[0] != slab)

        @pl.when(need)
        def _fetch_tables():
            do = pltpu.make_async_copy(order_hbm.at[slab], order_smem,
                                       sem_o)
            dt_ = pltpu.make_async_copy(tlo_hbm.at[slab], tlo_smem, sem_t)
            do.start()
            dt_.start()
            do.wait()
            dt_.wait()
            slab_ref[0] = slab

        t_out[:] = jnp.full(t_out.shape, jnp.inf, jnp.float32)
        prim_out[:] = jnp.full(prim_out.shape, -1, jnp.int32)

        for ax, r in enumerate((ox_ref, oy_ref, oz_ref)):
            v = r[:]
            blk_ref[ax] = jnp.min(v)
            blk_ref[3 + ax] = jnp.max(v)
        for ax, r in enumerate((dx_ref, dy_ref, dz_ref)):
            v = r[:]
            blk_ref[6 + ax] = jnp.min(v)
            blk_ref[9 + ax] = jnp.max(v)

        def t_term():
            if profile == "noterm":
                return jnp.float32(1e36)
            if any_hit:
                per_lane = jnp.where(prim_out[:] >= 0, -_BIG, maxt_ref[:])
            else:
                per_lane = jnp.minimum(t_out[:], maxt_ref[:])
            # strictly below the _BIG pad key of the visit list
            return jnp.minimum(jnp.max(per_lane), jnp.float32(1e37))

        def slab_test(k, t_hi):
            t_lo = jnp.float32(0.0)
            for ax in range(3):
                ol, oh = blk_ref[ax], blk_ref[3 + ax]
                dl, dh = blk_ref[6 + ax], blk_ref[9 + ax]
                bmin = box_ref[ax, k]
                bmax = box_ref[3 + ax, k]
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

            best_t = t_out[:]
            best_p = prim_out[:]
            for j in range(CHUNK):
                def cf(c, j=j):
                    flat = c * CHUNK + j
                    return tri_smem[b, flat // 128, flat % 128]
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
                @pl.when((tlo_smem[row, v] <= bound)
                         & slab_test(order_smem[row, v], bound))
                def _run():
                    process(v, bound)

            return v + 1, t_term(), pref_next

        vend, _, pref_end = jax.lax.while_loop(
            cond, body, (jnp.int32(0), t0, tlo_smem[row, 0] <= t0))
        if profile != "nodma":
            @pl.when(pref_end & (vend < c_pad))
            def _drain():
                dma_for(vend).wait()
        if profile == "count":
            t_out[:] = jnp.full(t_out.shape, 1.0, jnp.float32) * \
                vend.astype(jnp.float32)

    return kernel


@functools.lru_cache(maxsize=16)
def _compiled_v3(any_hit: bool, has_anim: bool, n_rows: int,
                 rows_per_block: int, c_pad: int, interpret: bool,
                 profile: str = ""):
    kernel = _build_v3_kernel(any_hit, has_anim, c_pad, profile)
    grid = (n_rows // rows_per_block,)
    lane = pl.BlockSpec((rows_per_block, LANES), lambda i: (i, 0),
                        memory_space=pltpu.VMEM)
    in_specs = [
        pl.BlockSpec(memory_space=pltpu.SMEM),        # meta
        pl.BlockSpec(memory_space=pltpu.SMEM),        # unit AABBs
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
            pltpu.SMEM((2, REC_ROWS, 128), jnp.float32),
            pltpu.SMEM((16,), jnp.float32),
            pltpu.SMEM((1,), jnp.int32),
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
    )


def _woop_records(sa, segments, n_units: int):
    """In-graph Woop table, (n_units, REC_ROWS, 128) f32. Coefficient c of
    triangle j lives at flat index c*32+j of the (8,128) tile. Rows of
    B = [e1 | e2 | n]^-1 (n = e1 x e2) via the adjugate; c = -B v0."""
    cols = ("v0x", "v0y", "v0z", "e1x", "e1y", "e1z", "e2x", "e2y", "e2z")
    parts = []
    for kind, start, count in segments:
        if kind == "pad":
            parts.append(jnp.zeros((count, 9), jnp.float32))
            continue
        parts.append(jnp.stack(
            [sa.tri(kind, c)[start:start + count] for c in cols], axis=-1))
    g = jnp.concatenate(parts, axis=0)                   # (P, 9)
    v0 = g[:, 0:3]
    e1 = g[:, 3:6]
    e2 = g[:, 6:9]
    nrm = jnp.cross(e1, e2)
    det = jnp.sum(nrm * nrm, axis=-1, keepdims=True)     # det(A) = |n|^2
    ok = det > 1e-32
    inv = jnp.where(ok, 1.0 / jnp.where(ok, det, 1.0), 0.0)
    r0 = jnp.cross(e2, nrm) * inv
    r1 = jnp.cross(nrm, e1) * inv
    r2 = nrm * inv
    c0 = -jnp.sum(r0 * v0, axis=-1, keepdims=True)
    c1 = -jnp.sum(r1 * v0, axis=-1, keepdims=True)
    c2 = -jnp.sum(r2 * v0, axis=-1, keepdims=True)
    w = jnp.concatenate([r0, c0, r1, c1, r2, c2], axis=-1)   # (P, 12)
    # (n_units, 32, 12) -> coeff-major (n_units, 12, 32) -> (nu, 8, 128)
    w = w.reshape(n_units, CHUNK, 12).transpose(0, 2, 1)
    w = w.reshape(n_units, 12 * CHUNK)
    pad = REC_ROWS * 128 - 12 * CHUNK
    w = jnp.concatenate(
        [w, jnp.zeros((n_units, pad), jnp.float32)], axis=1)
    return w.reshape(n_units, REC_ROWS, 128)


def _unit_visit_order(box, n_units: int, c_pad: int, x, blk: int):
    """Per-block front-to-back visit lists over 32-tri units (the
    granularity-1 form of intersect_mxu._visit_order; same slab algebra)."""
    nb = x.shape[1] // blk
    xb = x.reshape(8, nb, blk)
    ol = jnp.min(xb[0:3], axis=2).T
    oh = jnp.max(xb[0:3], axis=2).T
    dl = jnp.min(xb[4:7], axis=2).T
    dh = jnp.max(xb[4:7], axis=2).T
    mt = jnp.minimum(jnp.max(xb[7], axis=1), _BIG)

    blo = box[:, :3]
    bhi = box[:, 3:]
    live = blo[:, 0] <= bhi[:, 0]

    t_lo = jnp.zeros((nb, n_units), jnp.float32)
    t_hi = jnp.broadcast_to(mt[:, None], (nb, n_units))
    for ax in range(3):
        dla = dl[:, ax:ax + 1]
        dha = dh[:, ax:ax + 1]
        same = (dla > 1e-12) | (dha < -1e-12)
        inv_a = 1.0 / jnp.where(same, dla, 1.0)
        inv_b = 1.0 / jnp.where(same, dha, 1.0)
        lo = jnp.full((nb, n_units), _BIG)
        hi = jnp.full((nb, n_units), -_BIG)
        for p in (blo[None, :, ax], bhi[None, :, ax]):
            for oo in (ol[:, ax:ax + 1], oh[:, ax:ax + 1]):
                num = p - oo
                for iv in (inv_a, inv_b):
                    val = num * iv
                    lo = jnp.minimum(lo, val)
                    hi = jnp.maximum(hi, val)
        lo = jnp.where(same, lo, -_BIG)
        hi = jnp.where(same, hi, _BIG)
        t_lo = jnp.maximum(t_lo, lo)
        t_hi = jnp.minimum(t_hi, hi)
    possible = (t_lo <= t_hi) & live[None, :]
    key = jnp.where(possible, t_lo, _BIG)
    order = jnp.argsort(key, axis=1).astype(jnp.int32)
    tlo_sorted = jnp.take_along_axis(key, order, axis=1)
    if c_pad > n_units:
        pad = c_pad - n_units
        order = jnp.concatenate(
            [order, jnp.zeros((nb, pad), jnp.int32)], axis=1)
        tlo_sorted = jnp.concatenate(
            [tlo_sorted, jnp.full((nb, pad), _BIG, jnp.float32)], axis=1)
    nb8 = -(-nb // 8) * 8
    if nb8 > nb:
        order = jnp.concatenate(
            [order, jnp.zeros((nb8 - nb, c_pad), jnp.int32)], axis=0)
        tlo_sorted = jnp.concatenate(
            [tlo_sorted, jnp.full((nb8 - nb, c_pad), _BIG, jnp.float32)],
            axis=0)
    return (order.reshape(nb8 // 8, 8, c_pad),
            tlo_sorted.reshape(nb8 // 8, 8, c_pad))


def v3_rows() -> int:
    return int(os.environ.get("MI_V3_ROWS", DEF_ROWS))


def intersect_v3(sa, ray, any_hit: bool = False, rows_per_block: int = None):
    """Phase-1 closest-hit (or any-hit) over all triangles at 32-tri visit
    granularity. Returns (t, prim), global slot convention; the caller
    merges spheres and reconstructs the payload with payload_from_prim."""
    if rows_per_block is None:
        rows_per_block = v3_rows()
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
        if fill is None:
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
    fn = _compiled_v3(any_hit, has_anim, n_rows,
                      min(rows_per_block, n_rows), c_pad, interpret,
                      os.environ.get("MI_V3_PROFILE", ""))
    args = [jnp.asarray(meta32.T), box.T, inst_table, tri, order, tlo] + [
        c.reshape(n_rows, LANES) for c in o] + [
        c.reshape(n_rows, LANES) for c in d] + [
        pad(ray.time).reshape(n_rows, LANES),
        maxtp.reshape(n_rows, LANES)]
    t_o, prim_o = fn(*args)
    return t_o.reshape(-1)[:n], prim_o.reshape(-1)[:n]


__all__ = ["intersect_v3", "payload_from_prim"]
