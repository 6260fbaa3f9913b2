"""Two-phase MXU ray-triangle intersection with per-block front-to-back
chunk ordering: the large-scene hot path.

Phase 1 (this kernel) computes ONLY (closest t, winning prim slot); phase 2
(`payload_from_prim`, dense XLA) reconstructs the fat surface-interaction
payload for the single winning triangle per lane via one row-gather.
Splitting the phases removes ~2/3 of the inner-loop VPU work and all but
two (1, BLK) accumulators of VMEM hit state.

MXU formulation (replaces the scalar Möller loop of intersect_stream.py):
each triangle's intersection is an affine map of the ray [Woop 2004-style
unit-triangle transform]. With B = A^-1 for A = [e1 | e2 | e1 x e2] and
c = -B v0:

    o' = B o + c,   d' = B d
    t  = -o'_z / d'_z,   u = o'_x + t d'_x,   v = o'_y + t d'_y
    hit iff u >= 0, v >= 0, u + v <= 1, t in (0, maxt), t < best

so a 128-triangle chunk against a BLK-lane ray block is ONE
(6*128, 8) x (8, BLK) matmul on the MXU (K = 8: [ox oy oz 1 dx dy dz *])
followed by a short dense VPU epilogue and a cross-sublane min-reduction.

Front-to-back ordering (the TPU-native replacement for BVH traversal
order, matching the role of `scene_optix.inl:552-570` / Embree's ordered
traversal): the candidate set per (lane block, chunk) is small enough to
compute DENSELY in XLA — `_visit_order` runs the same conservative
interval slab test the kernel uses, over all (block, chunk) pairs at once
(a (nb, C) elementwise computation, microseconds on the VPU), sorts each
block's surviving chunks by conservative entry distance t_lo, and hands
the kernel a per-block visit list. Inside the kernel a chunk whose sorted
t_lo exceeds the block's worst best-t is skipped with two scalar reads —
and because the list is ascending, once one chunk is skipped every later
chunk is too, giving BVH-style early termination after the first
block-wide hit without any per-lane pointer chasing (XLA gathers
serialize on the TPU scalar core; dense slab tests + one sort do not).

Memory strategy: the Woop table is ~192 B/triangle — streaming it per lane
block through BlockSpec would put a hard HBM floor of
n_blocks x n_chunks x 24 KB per trace *regardless of culling*. Instead the
table stays in HBM (`pl.ANY`) and the kernel issues a `make_async_copy`
of one chunk's 24 KB slice into VMEM scratch ONLY when the chunk survives
ordering + the 32-triangle sub-box refinement (transform groups pad to
128-triangle boundaries — intersect_stream.PAD_TO — so each chunk owns 4
of the 32-triangle culling AABBs; the chunk runs if ANY sub-box passes,
strictly tighter than one 128-wide box). The per-block visit list (~2.5 KB)
is DMA'd HBM->SMEM once per block.

Two-level motion handling is identical to intersect_stream.py (the Pallas
analog of the reference's motion IAS, optix/shapes.h:232-258): each chunk
belongs to one transform group; rays are moved to object space per chunk
by the per-lane inverse of the clamped keyframe matrix lerp
(transform.h:458-466) before the matmul, leaving t in world units.

Lane layout: rays are packed as one (8, N) array (features x lanes), so
ray blocks are (8, BLK) matmul operands directly; outputs are (1, N).
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .intersect_kernel import _inv_lerped
from .intersect_stream import CHUNK, PAD_TO, _chunked_layout, _inst_table

T = PAD_TO              # triangles per chunk = one MXU matmul
SUBS = T // CHUNK       # 32-triangle culling sub-boxes per chunk
CPG = 4                 # chunks visited per grid step (amortizes step cost)
DEF_BLK = 2048          # lanes per block (ray-block matmul N dim)
_BIG = np.float32(3.0e38)
_WROWS = 8              # W is stored (n_chunks*8, 6*T): K-major, dense lanes


def _build_mxu_kernel(any_hit: bool, has_anim: bool):

    def kernel(meta_ref,     # (2, n_chunks) SMEM [anim slot | -1, slot0]
               sub_ref,      # (6, SUBS*n_chunks) SMEM 32-tri AABBs
               inst_ref,     # (n_anim, 26) SMEM animated instance records
               w_hbm,        # (n_chunks*8, 6T) ANY/HBM Woop table
               order_hbm,    # (nb8/8, 8, c_pad) ANY/HBM per-block visit order
               tlo_hbm,      # (nb8/8, 8, c_pad) ANY/HBM sorted entry dists
               x_ref,        # (8, BLK) VMEM [ox oy oz 1 dx dy dz maxt]
               time_ref,     # (1, BLK) VMEM ray times
               t_out, prim_out,          # (1, BLK) VMEM, revisited over g
               w_vmem, blk_ref, order_smem, tlo_smem,
               sem_w, sem_o, sem_t):     # scratch
        i = pl.program_id(0)
        g = pl.program_id(1)

        row = jax.lax.rem(i, 8)

        @pl.when(g == 0)
        def _init():
            t_out[:] = jnp.full(t_out.shape, jnp.inf, jnp.float32)
            prim_out[:] = jnp.full(prim_out.shape, -1, jnp.int32)
            # this block's visit list: one DMA per block of the 8-row slab
            # containing it — the tables are (nb8/8, 8, c_pad) so the slab
            # is a leading-dim index (no sublane-alignment proof needed;
            # Mosaic cannot prove `i - i%8` divisible by 8); the kernel
            # reads sub-row i % 8
            slab = jax.lax.div(i, 8)
            do = pltpu.make_async_copy(
                order_hbm.at[slab], order_smem, sem_o)
            dt_ = pltpu.make_async_copy(
                tlo_hbm.at[slab], tlo_smem, sem_t)
            do.start()
            dt_.start()
            # block-wide conservative ray bounds for the sub-box slab test
            for ax in range(3):
                v = x_ref[ax:ax + 1, :]
                blk_ref[ax] = jnp.min(v)
                blk_ref[3 + ax] = jnp.max(v)
            for ax in range(3):
                v = x_ref[4 + ax:5 + ax, :]
                blk_ref[6 + ax] = jnp.min(v)
                blk_ref[9 + ax] = jnp.max(v)
            blk_ref[12] = jnp.minimum(jnp.max(x_ref[7:8, :]), _BIG)
            do.wait()
            dt_.wait()

        # ---- conservative (block, box) interval slab test ----------------
        # (same algebra as intersect_stream.py: o/d intervals per axis;
        # mixed-sign d disables the axis)
        def slab_test(box, t_hi):
            t_lo = jnp.float32(0.0)
            for ax in range(3):
                ol, oh = blk_ref[ax], blk_ref[3 + ax]
                dl, dh = blk_ref[6 + ax], blk_ref[9 + ax]
                bmin, bmax = box(ax)
                pos = dl > 1e-12
                neg = dh < -1e-12
                same_sign = pos | neg
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

        def _t_hi():
            # closest-hit: once every lane has SOME hit, the block max
            # best-t bounds the interval; with the ascending t_lo visit
            # list this is the early-termination test
            t_hi = jnp.minimum(blk_ref[12],
                               jnp.minimum(jnp.max(t_out[:]), _BIG))
            if any_hit:
                all_occ = jnp.min(prim_out[:]) >= 0
                t_hi = jnp.where(all_occ, -_BIG, t_hi)
            return t_hi

        def _run_chunk(k):
            if has_anim:
                ci = meta_ref[0, k]
                cia = jnp.maximum(ci, 0)
                is_anim = ci >= 0
                time = time_ref[:]                       # (1, BLK)
                mc0 = tuple(inst_ref[cia, j] for j in range(12))
                mc1 = tuple(inst_ref[cia, 12 + j] for j in range(12))
                i3, it3 = _inv_lerped(mc0, mc1, inst_ref[cia, 24],
                                      inst_ref[cia, 25], time)
                fa = is_anim.astype(jnp.float32)
                om = 1.0 - fa
                ox, oy, oz = (x_ref[0:1, :], x_ref[1:2, :], x_ref[2:3, :])
                dx, dy, dz = (x_ref[4:5, :], x_ref[5:6, :], x_ref[6:7, :])
                rox = fa * (i3[0] * ox + i3[1] * oy + i3[2] * oz + it3[0]) + om * ox
                roy = fa * (i3[3] * ox + i3[4] * oy + i3[5] * oz + it3[1]) + om * oy
                roz = fa * (i3[6] * ox + i3[7] * oy + i3[8] * oz + it3[2]) + om * oz
                rdx = fa * (i3[0] * dx + i3[1] * dy + i3[2] * dz) + om * dx
                rdy = fa * (i3[3] * dx + i3[4] * dy + i3[5] * dz) + om * dy
                rdz = fa * (i3[6] * dx + i3[7] * dy + i3[8] * dz) + om * dz
                xp = jnp.concatenate(
                    [rox, roy, roz, x_ref[3:4, :],
                     rdx, rdy, rdz, x_ref[7:8, :]], axis=0)
            else:
                xp = x_ref[:]

            w = w_vmem[:]                                # (8, 6T)
            # (6T, BLK) = W^T (6T, 8) @ X (8, BLK) — contraction over K=8.
            # Precision must be explicit: the TPU MXU default truncates f32
            # operands to bf16 (~0.4% relative), which produced 0.5-5% t
            # errors on-chip while interpret-mode parity was exact. Mosaic
            # supports only DEFAULT | HIGHEST (contract_precision<fp32>).
            res = jax.lax.dot_general(
                w, xp, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST)
            oxp = res[0 * T:1 * T]
            oyp = res[1 * T:2 * T]
            ozp = res[2 * T:3 * T]
            dxp = res[3 * T:4 * T]
            dyp = res[4 * T:5 * T]
            dzp = res[5 * T:6 * T]
            dz_ok = jnp.abs(dzp) > 1e-30
            t = -ozp / jnp.where(dz_ok, dzp, 1.0)
            u = oxp + t * dxp
            v = oyp + t * dyp
            maxt = x_ref[7:8, :]
            best = t_out[:]
            hit = (dz_ok & (jnp.minimum(u, v) >= 0.0) & (u + v <= 1.0)
                   & (t > 0.0) & (t < maxt) & (t < best))
            tc = jnp.where(hit, t, jnp.inf)
            tmin = jnp.min(tc, axis=0, keepdims=True)    # (1, BLK)
            won = tmin < best
            t_out[:] = jnp.where(won, tmin, best)
            if any_hit:
                prim_out[:] = jnp.where(won, 1, prim_out[:])
            else:
                iota = jax.lax.broadcasted_iota(jnp.int32, (T, t.shape[1]), 0)
                lmin = jnp.min(jnp.where(tc <= tmin, iota, T),
                               axis=0, keepdims=True)
                slot0 = meta_ref[1, k]
                prim_out[:] = jnp.where(won, slot0 + lmin, prim_out[:])

        # ---- ordered dispatch --------------------------------------------
        for j in range(CPG):
            step = g * CPG + j
            t_hi = _t_hi()
            # ascending-t_lo visit list: t_lo > t_hi here implies the same
            # for every later chunk — each is skipped by these two scalars
            run = tlo_smem[row, step] <= t_hi

            @pl.when(run)
            def _visit(step=step):
                k = order_smem[row, step]
                poss = False
                for s in range(SUBS):
                    poss = jnp.logical_or(poss, slab_test(
                        lambda ax, s=s: (sub_ref[ax, k * SUBS + s],
                                         sub_ref[3 + ax, k * SUBS + s]),
                        _t_hi()))

                @pl.when(poss)
                def _chunk_body(k=k):
                    dma = pltpu.make_async_copy(
                        w_hbm.at[pl.ds(k * _WROWS, _WROWS), :],
                        w_vmem, sem_w)
                    dma.start()
                    dma.wait()
                    _run_chunk(k)

    return kernel


@functools.lru_cache(maxsize=16)
def _compiled_mxu(any_hit: bool, has_anim: bool, n: int, blk: int,
                  n_chunks: int, c_pad: int, interpret: bool):
    kernel = _build_mxu_kernel(any_hit, has_anim)
    grid = (n // blk, c_pad // CPG)
    lane = lambda i, g: (0, i)
    in_specs = [
        pl.BlockSpec(memory_space=pltpu.SMEM),            # meta
        pl.BlockSpec(memory_space=pltpu.SMEM),            # sub AABBs
        pl.BlockSpec(memory_space=pltpu.SMEM),            # instances
        pl.BlockSpec(memory_space=pl.ANY),                # W (HBM)
        pl.BlockSpec(memory_space=pl.ANY),                # order (HBM)
        pl.BlockSpec(memory_space=pl.ANY),                # tlo (HBM)
        pl.BlockSpec((8, blk), lane, memory_space=pltpu.VMEM),   # X
        pl.BlockSpec((1, blk), lane, memory_space=pltpu.VMEM),   # time
    ]
    out_specs = [pl.BlockSpec((1, blk), lane, memory_space=pltpu.VMEM)] * 2
    out_shape = [jax.ShapeDtypeStruct((1, n), jnp.float32),
                 jax.ShapeDtypeStruct((1, n), jnp.int32)]
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=[
            pltpu.VMEM((_WROWS, 6 * T), jnp.float32),
            pltpu.SMEM((16,), jnp.float32),
            pltpu.SMEM((8, c_pad), jnp.int32),
            pltpu.SMEM((8, c_pad), jnp.float32),
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary")),
    )


def _visit_order(sub, n_chunks: int, c_pad: int, x, blk: int):
    """Per-block front-to-back visit lists, densely in XLA.

    For every (lane block, chunk) pair run the kernel's conservative
    interval slab test on the block's ray bounds vs the chunk AABB (the
    union of its 4 sub-boxes), then sort each block's chunks by
    conservative entry distance. Returns
      order (nb, c_pad) i32  — chunk indices, ascending t_lo, misses last
      tlo   (nb, c_pad) f32  — the sorted t_lo values (+BIG for misses).

    Animated chunks are tested on their conservative union-of-keyframes
    world AABB (sub boxes already are that union), against the block's
    WORLD-space ray bounds — consistent with the kernel, which moves rays
    to object space only inside the exact per-chunk test.
    """
    nb = x.shape[1] // blk
    xb = x.reshape(8, nb, blk)
    ol = jnp.min(xb[0:3], axis=2).T                      # (nb, 3)
    oh = jnp.max(xb[0:3], axis=2).T
    dl = jnp.min(xb[4:7], axis=2).T
    dh = jnp.max(xb[4:7], axis=2).T
    mt = jnp.minimum(jnp.max(xb[7], axis=1), _BIG)       # (nb,)

    # chunk AABB = union of its SUBS sub-boxes ((C*SUBS, 6) -> (C, 6));
    # inverted pad boxes union away naturally
    sb = sub.reshape(n_chunks, SUBS, 6)
    blo = jnp.min(sb[:, :, :3], axis=1)                  # (C, 3)
    bhi = jnp.max(sb[:, :, 3:], axis=1)
    live = blo[:, 0] <= bhi[:, 0]

    t_lo = jnp.zeros((nb, n_chunks), jnp.float32)
    t_hi = jnp.broadcast_to(mt[:, None], (nb, n_chunks))
    for ax in range(3):
        dla = dl[:, ax:ax + 1]
        dha = dh[:, ax:ax + 1]
        same = (dla > 1e-12) | (dha < -1e-12)
        inv_a = 1.0 / jnp.where(same, dla, 1.0)
        inv_b = 1.0 / jnp.where(same, dha, 1.0)
        lo = jnp.full((nb, n_chunks), _BIG)
        hi = jnp.full((nb, n_chunks), -_BIG)
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
    if c_pad > n_chunks:
        pad = c_pad - n_chunks
        order = jnp.concatenate(
            [order, jnp.zeros((nb, pad), jnp.int32)], axis=1)
        tlo_sorted = jnp.concatenate(
            [tlo_sorted, jnp.full((nb, pad), _BIG, jnp.float32)], axis=1)
    # pad rows to a multiple of 8: the kernel DMAs 8-row slabs (Mosaic
    # sublane alignment); pad rows are never indexed by a live block
    nb8 = -(-nb // 8) * 8
    if nb8 > nb:
        order = jnp.concatenate(
            [order, jnp.zeros((nb8 - nb, c_pad), jnp.int32)], axis=0)
        tlo_sorted = jnp.concatenate(
            [tlo_sorted, jnp.full((nb8 - nb, c_pad), _BIG, jnp.float32)],
            axis=0)
    return (order.reshape(nb8 // 8, 8, c_pad),
            tlo_sorted.reshape(nb8 // 8, 8, c_pad))


_PAY_COLS = ("v0x", "v0y", "v0z", "e1x", "e1y", "e1z", "e2x", "e2y", "e2z",
             "n0x", "n0y", "n0z", "n1x", "n1y", "n1z", "n2x", "n2y", "n2z",
             "uv0u", "uv0v", "uv1u", "uv1v", "uv2u", "uv2v")


def _woop_table(sa, segments, n_chunks: int):
    """In-graph Woop coefficient table, (n_chunks*8, 6T) f32.

    Row r of a chunk's (8, 6T) block holds coefficient r (of the K=8 ray
    feature vector) for all 6 components x T triangles, component-major.
    Degenerate/pad triangles get all-zero rows: d'_z == 0 -> no hit.
    """
    v0p, e1p, e2p = [], [], []
    for kind, start, count in segments:
        if kind == "pad":
            z = jnp.zeros((count, 3), jnp.float32)
            v0p.append(z)
            e1p.append(z)
            e2p.append(z)
            continue
        sl = slice(start, start + count)

        def col3(a, b, c, kind=kind, sl=sl):
            return jnp.stack([sa.tri(kind, a)[sl], sa.tri(kind, b)[sl],
                              sa.tri(kind, c)[sl]], axis=-1)
        v0p.append(col3("v0x", "v0y", "v0z"))
        e1p.append(col3("e1x", "e1y", "e1z"))
        e2p.append(col3("e2x", "e2y", "e2z"))
    v0 = jnp.concatenate(v0p, axis=0)
    e1 = jnp.concatenate(e1p, axis=0)
    e2 = jnp.concatenate(e2p, axis=0)
    nrm = jnp.cross(e1, e2)
    det = jnp.sum(nrm * nrm, axis=-1, keepdims=True)     # det(A) = |n|^2
    ok = det > 1e-32
    inv = jnp.where(ok, 1.0 / jnp.where(ok, det, 1.0), 0.0)
    r0 = jnp.cross(e2, nrm) * inv        # rows of B = A^-1
    r1 = jnp.cross(nrm, e1) * inv
    r2 = nrm * inv
    c0 = -jnp.sum(r0 * v0, axis=-1)
    c1 = -jnp.sum(r1 * v0, axis=-1)
    c2 = -jnp.sum(r2 * v0, axis=-1)
    z = jnp.zeros_like(c0)
    rows = lambda r, c: (r[:, 0], r[:, 1], r[:, 2], c, z, z, z, z)
    drows = lambda r: (z, z, z, z, r[:, 0], r[:, 1], r[:, 2], z)
    # (P, 6, 8): per tri, per component, per K-feature
    w = jnp.stack([jnp.stack(rows(r0, c0), axis=-1),
                   jnp.stack(rows(r1, c1), axis=-1),
                   jnp.stack(rows(r2, c2), axis=-1),
                   jnp.stack(drows(r0), axis=-1),
                   jnp.stack(drows(r1), axis=-1),
                   jnp.stack(drows(r2), axis=-1)], axis=1)
    # -> (n_chunks, 8, 6, T) -> (n_chunks*8, 6T)
    w = w.reshape(n_chunks, T, 6, 8).transpose(0, 3, 2, 1)
    return w.reshape(n_chunks * 8, 6 * T)


def _payload_table(sa):
    """Unpadded (T_total, 26) per-triangle record in global slot order:
    24 geometry/uv floats + instance id + animated-range index (-1 static),
    consumed by one row-gather in `payload_from_prim` (row-gathers run at
    ~180M rows/s on v5e; only column/scalar gathers serialize)."""
    parts = []
    for kind in ("s", "a"):
        ntri = sa.n_static_tris if kind == "s" else sa.n_anim_tris
        if ntri == 0:
            continue
        cols = [sa.tri(kind, c) for c in _PAY_COLS]
        cols.append(sa.tri(kind, "inst").astype(jnp.float32))
        if kind == "a":
            aidx = np.repeat(
                np.arange(len(sa.anim_ranges), dtype=np.float32),
                [c for (_, _, c) in sa.anim_ranges])
            cols.append(jnp.asarray(aidx))
        else:
            cols.append(jnp.full((ntri,), -1.0, jnp.float32))
        parts.append(jnp.stack(cols, axis=-1))
    if not parts:
        return jnp.zeros((1, 26), jnp.float32)
    return jnp.concatenate(parts, axis=0)


def payload_from_prim(sa, ray, t, prim):
    """Phase 2: reconstruct the fat HitRecord for the winning triangle per
    lane — one row-gather + dense Möller/interpolation recompute (the XLA
    analog of compute_surface_interaction, reference instance.cpp:155-250).
    """
    from .intersect_kernel import HitRecord

    tbl = _payload_table(sa)
    n_tot = tbl.shape[0]
    idx = jnp.clip(prim, 0, n_tot - 1)
    rec = jnp.take(tbl, idx, axis=0)                     # (N, 26)
    valid = prim >= 0

    o = (ray.o.x, ray.o.y, ray.o.z)
    d = (ray.d.x, ray.d.y, ray.d.z)
    if sa.anim_ranges:
        aidx = rec[:, 25].astype(jnp.int32)
        is_anim = aidx >= 0
        it = _inst_table(sa)                             # (n_anim, 26)
        irec = jnp.take(it, jnp.maximum(aidx, 0), axis=0)
        i3, it3 = _inv_lerped(tuple(irec[:, j] for j in range(12)),
                              tuple(irec[:, 12 + j] for j in range(12)),
                              irec[:, 24], irec[:, 25], ray.time)
        fa = is_anim.astype(jnp.float32)
        om = 1.0 - fa
        o = (fa * (i3[0] * o[0] + i3[1] * o[1] + i3[2] * o[2] + it3[0]) + om * o[0],
             fa * (i3[3] * o[0] + i3[4] * o[1] + i3[5] * o[2] + it3[1]) + om * o[1],
             fa * (i3[6] * o[0] + i3[7] * o[1] + i3[8] * o[2] + it3[2]) + om * o[2])
        d = (fa * (i3[0] * d[0] + i3[1] * d[1] + i3[2] * d[2]) + om * d[0],
             fa * (i3[3] * d[0] + i3[4] * d[1] + i3[5] * d[2]) + om * d[1],
             fa * (i3[6] * d[0] + i3[7] * d[1] + i3[8] * d[2]) + om * d[2])

    v0 = (rec[:, 0], rec[:, 1], rec[:, 2])
    e1 = (rec[:, 3], rec[:, 4], rec[:, 5])
    e2 = (rec[:, 6], rec[:, 7], rec[:, 8])
    # barycentrics at the known hit point (object space): p = o + t d
    px = o[0] + t * d[0] - v0[0]
    py = o[1] + t * d[1] - v0[1]
    pz = o[2] + t * d[2] - v0[2]
    # solve p = u e1 + v e2 in the triangle plane (2x2 Gram system)
    d11 = e1[0] * e1[0] + e1[1] * e1[1] + e1[2] * e1[2]
    d12 = e1[0] * e2[0] + e1[1] * e2[1] + e1[2] * e2[2]
    d22 = e2[0] * e2[0] + e2[1] * e2[1] + e2[2] * e2[2]
    dp1 = px * e1[0] + py * e1[1] + pz * e1[2]
    dp2 = px * e2[0] + py * e2[1] + pz * e2[2]
    den = d11 * d22 - d12 * d12
    den = jnp.where(jnp.abs(den) > 1e-30, den, 1.0)
    u = jnp.clip((d22 * dp1 - d12 * dp2) / den, 0.0, 1.0)
    v = jnp.clip((d11 * dp2 - d12 * dp1) / den, 0.0, 1.0)
    w = 1.0 - u - v

    gx = e1[1] * e2[2] - e1[2] * e2[1]
    gy = e1[2] * e2[0] - e1[0] * e2[2]
    gz = e1[0] * e2[1] - e1[1] * e2[0]
    nx = w * rec[:, 9] + u * rec[:, 12] + v * rec[:, 15]
    ny = w * rec[:, 10] + u * rec[:, 13] + v * rec[:, 16]
    nz = w * rec[:, 11] + u * rec[:, 14] + v * rec[:, 17]
    if sa.anim_ranges:
        def inv_t(x, y, z):
            return (fa * (i3[0] * x + i3[3] * y + i3[6] * z) + om * x,
                    fa * (i3[1] * x + i3[4] * y + i3[7] * z) + om * y,
                    fa * (i3[2] * x + i3[5] * y + i3[8] * z) + om * z)
        gx, gy, gz = inv_t(gx, gy, gz)
        nx, ny, nz = inv_t(nx, ny, nz)
    uv_u = w * rec[:, 18] + u * rec[:, 20] + v * rec[:, 22]
    uv_v = w * rec[:, 19] + u * rec[:, 21] + v * rec[:, 23]

    neg = jnp.float32(-1.0)
    return HitRecord(
        t=jnp.where(valid, t, jnp.inf),
        prim=prim,
        inst=jnp.where(valid, rec[:, 24].astype(jnp.int32), -1),
        u=jnp.where(valid, u, 0.0), v=jnp.where(valid, v, 0.0),
        gnx=jnp.where(valid, gx, 0.0), gny=jnp.where(valid, gy, 0.0),
        gnz=jnp.where(valid, gz, neg),
        nsx=jnp.where(valid, nx, 0.0), nsy=jnp.where(valid, ny, 0.0),
        nsz=jnp.where(valid, nz, neg),
        uv_u=jnp.where(valid, uv_u, 0.0),
        uv_v=jnp.where(valid, uv_v, 0.0))


def intersect_mxu(sa, ray, any_hit: bool = False, blk: int = None):
    """Phase-1 closest-hit (or any-hit) over all triangles. Returns
    (t, prim) with prim in the global slot convention; spheres merge in the
    caller as with intersect_stream."""
    if blk is None:
        blk = int(os.environ.get("MI_MXU_BLK", DEF_BLK))
    n = ray.o.x.shape[0]
    blk = min(blk, max(128, 1 << (n - 1).bit_length()))
    n_pad = -(-n // blk) * blk

    segments, meta32 = _chunked_layout(sa.n_static_tris, sa.anim_ranges)
    n_chunks = meta32.shape[0] // SUBS
    meta = meta32[::SUBS]                                # (n_chunks, 2)
    w = _woop_table(sa, segments, n_chunks)
    inst_table = _inst_table(sa)
    has_anim = bool(sa.anim_ranges)

    sub = sa.chunk_aabb
    if sub is None:
        sub = jnp.concatenate(
            [jnp.full((SUBS * n_chunks, 3), -_BIG),
             jnp.full((SUBS * n_chunks, 3), _BIG)], axis=1)
    # visit tables pad to 128 columns: Mosaic DMA slices must be
    # 128-aligned along the minor dimension (also a CPG multiple)
    c_pad = -(-n_chunks // 128) * 128

    def pad(x, fill=None):
        if n_pad == n:
            return x
        if fill is None:      # edge-replicate keeps block ray bounds tight
            tail = jnp.broadcast_to(x[-1], (n_pad - n,)).astype(x.dtype)
        else:
            tail = jnp.full((n_pad - n,), fill, x.dtype)
        return jnp.concatenate([x, tail], axis=0)

    # maxt rides in X row 7 (coefficient 0 in every W row) — clamp inf to
    # _BIG first or the MXU contraction produces 0*inf = NaN lane-wide
    x = jnp.stack([pad(ray.o.x), pad(ray.o.y), pad(ray.o.z),
                   jnp.ones((n_pad,), jnp.float32),
                   pad(ray.d.x), pad(ray.d.y), pad(ray.d.z),
                   pad(jnp.minimum(ray.maxt, _BIG), fill=-1.0)], axis=0)
    time = pad(ray.time).reshape(1, n_pad)

    order, tlo = _visit_order(sub, n_chunks, c_pad, x, min(blk, n_pad))

    interpret = jax.default_backend() == "cpu"
    fn = _compiled_mxu(any_hit, has_anim, n_pad, min(blk, n_pad),
                       n_chunks, c_pad, interpret)
    t_o, prim_o = fn(jnp.asarray(meta.T), sub.T, inst_table,
                     w, order, tlo, x, time)
    return t_o.reshape(-1)[:n], prim_o.reshape(-1)[:n]


__all__ = ["intersect_mxu", "payload_from_prim"]
