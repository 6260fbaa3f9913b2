"""Streamed Pallas closest-hit for large static meshes.

The fat-payload kernel in intersect_kernel.py unrolls the triangle loop —
ideal for small scenes, but compile time grows with triangle count. This
variant streams triangles in fixed SMEM chunks over a second grid dimension
with the hit state accumulated in the (revisited) output blocks, so compile
time is constant and runtime is linear in T. Handles STATIC world-space
triangles; animated instances and spheres (always few) stay on the unrolled
kernel and results merge by closest t (render/scene.py _closest_hit).

Grid: (lane_blocks [parallel], tri_chunks [arbitrary]); Mosaic keeps each
lane block's outputs resident in VMEM across the chunk dimension — the same
revisit pattern as a matmul K-loop.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .intersect_kernel import TRI_REC, LANES

CHUNK = 32          # triangles per grid step (SMEM block)
DEF_ROWS = 128


def _build_stream_kernel(any_hit: bool):

    def kernel(tri_ref,      # (CHUNK, TRI_REC) SMEM — this chunk
               nt_ref,       # (1,) SMEM — true triangle count
               ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref, maxt_ref,
               *out_refs):
        k = pl.program_id(1)

        @pl.when(k == 0)
        def _init():
            out_refs[0][:] = jnp.full(out_refs[0].shape, jnp.inf, jnp.float32)
            out_refs[1][:] = jnp.full(out_refs[1].shape, -1, jnp.int32)
            if not any_hit:
                for r in out_refs[2:]:
                    r[:] = jnp.zeros(r.shape, r.dtype)

        ox = ox_ref[:]
        oy = oy_ref[:]
        oz = oz_ref[:]
        dx = dx_ref[:]
        dy = dy_ref[:]
        dz = dz_ref[:]
        maxt = maxt_ref[:]
        n_tris = nt_ref[0]

        st = {"t": out_refs[0][:], "prim": out_refs[1][:]}
        if not any_hit:
            keys = ("inst", "u", "v", "gx", "gy", "gz", "nx", "ny", "nz",
                    "uu", "vv")
            for r, key in zip(out_refs[2:], keys):
                st[key] = r[:]

        base = k * CHUNK
        for j in range(CHUNK):
            slot = base + j
            r = tuple(tri_ref[j, c] for c in range(TRI_REC))
            v0x, v0y, v0z, e1x, e1y, e1z, e2x, e2y, e2z = r[0:9]
            px = dy * e2z - dz * e2y
            py = dz * e2x - dx * e2z
            pz = dx * e2y - dy * e2x
            det = e1x * px + e1y * py + e1z * pz
            okd = jnp.abs(det) > 1e-12
            inv = 1.0 / jnp.where(okd, det, 1.0)
            tx = ox - v0x
            ty = oy - v0y
            tz = oz - v0z
            u = (tx * px + ty * py + tz * pz) * inv
            qx = ty * e1z - tz * e1y
            qy = tz * e1x - tx * e1z
            qz = tx * e1y - ty * e1x
            v = (dx * qx + dy * qy + dz * qz) * inv
            t = (e2x * qx + e2y * qy + e2z * qz) * inv
            hit = (okd & (u >= 0.0) & (v >= 0.0) & (u + v <= 1.0)
                   & (t > 0.0) & (t < maxt) & (t < st["t"])
                   & (slot < n_tris))
            st["t"] = jnp.where(hit, t, st["t"])
            st["prim"] = jnp.where(hit, slot, st["prim"])
            if not any_hit:
                w = 1.0 - u - v
                st["inst"] = jnp.where(hit, r[24].astype(jnp.int32),
                                       st["inst"])
                st["u"] = jnp.where(hit, u, st["u"])
                st["v"] = jnp.where(hit, v, st["v"])
                st["gx"] = jnp.where(hit, e1y * e2z - e1z * e2y, st["gx"])
                st["gy"] = jnp.where(hit, e1z * e2x - e1x * e2z, st["gy"])
                st["gz"] = jnp.where(hit, e1x * e2y - e1y * e2x, st["gz"])
                n0x, n0y, n0z, n1x, n1y, n1z, n2x, n2y, n2z = r[9:18]
                st["nx"] = jnp.where(hit, w * n0x + u * n1x + v * n2x, st["nx"])
                st["ny"] = jnp.where(hit, w * n0y + u * n1y + v * n2y, st["ny"])
                st["nz"] = jnp.where(hit, w * n0z + u * n1z + v * n2z, st["nz"])
                uv0u, uv0v, uv1u, uv1v, uv2u, uv2v = r[18:24]
                st["uu"] = jnp.where(hit, w * uv0u + u * uv1u + v * uv2u,
                                     st["uu"])
                st["vv"] = jnp.where(hit, w * uv0v + u * uv1v + v * uv2v,
                                     st["vv"])

        out_refs[0][:] = st["t"]
        out_refs[1][:] = st["prim"]
        if not any_hit:
            for r, key in zip(out_refs[2:], keys):
                r[:] = st[key]

    return kernel


@functools.lru_cache(maxsize=16)
def _compiled_stream(any_hit: bool, n_rows: int, rows_per_block: int,
                     n_chunks: int, interpret: bool):
    kernel = _build_stream_kernel(any_hit)
    grid = (n_rows // rows_per_block, n_chunks)
    lane_spec = pl.BlockSpec((rows_per_block, LANES), lambda i, k: (i, 0),
                             memory_space=pltpu.VMEM)
    in_specs = [
        pl.BlockSpec((CHUNK, TRI_REC), lambda i, k: (k, 0),
                     memory_space=pltpu.SMEM),
        pl.BlockSpec(memory_space=pltpu.SMEM),      # n_tris scalar
    ] + [lane_spec] * 7
    f32, i32 = jnp.float32, jnp.int32
    dtypes = [f32, i32] if any_hit else [f32, i32, i32] + [f32] * 10
    out_shape = [jax.ShapeDtypeStruct((n_rows, LANES), dt) for dt in dtypes]
    out_specs = [lane_spec] * len(dtypes)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary")),
    )


def intersect_static_stream(tri_table, n_tris: int, ray,
                            rows_per_block: int = DEF_ROWS, any_hit=False):
    """Closest-hit over ``tri_table`` (T_pad, TRI_REC) world-space static
    triangles. Returns the fat-payload arrays (t, prim, inst, u, v, gn, ns,
    uv) or (t, prim) for any-hit."""
    n = ray.o.x.shape[0]
    blk = rows_per_block * LANES
    n_pad = -(-n // blk) * blk
    n_rows = n_pad // LANES

    t_pad = -(-int(tri_table.shape[0]) // CHUNK) * CHUNK
    if t_pad != tri_table.shape[0]:
        tri_table = jnp.concatenate(
            [tri_table, jnp.zeros((t_pad - tri_table.shape[0], TRI_REC),
                                  jnp.float32)], axis=0)
    n_chunks = t_pad // CHUNK

    def pad(x, fill=0.0):
        if n_pad == n:
            return x
        return jnp.concatenate(
            [x, jnp.full((n_pad - n,), fill, x.dtype)], axis=0)

    interpret = jax.default_backend() == "cpu"
    fn = _compiled_stream(any_hit, n_rows, min(rows_per_block, n_rows),
                          n_chunks, interpret)
    args = [tri_table, jnp.asarray([n_tris], jnp.int32)] + [
        pad(getattr(ray.o, c)).reshape(n_rows, LANES) for c in "xyz"] + [
        pad(getattr(ray.d, c)).reshape(n_rows, LANES) for c in "xyz"] + [
        pad(ray.maxt, fill=-1.0).reshape(n_rows, LANES)]
    outs = fn(*args)
    return [o.reshape(-1)[:n] for o in outs]


__all__ = ["intersect_static_stream", "CHUNK"]
