"""Pallas TPU ray-intersection kernels.

The hot irregular op of the renderer (SURVEY.md §7 hard-part #1). XLA's
auto-fusion leaves the triangle loop memory-bound; this kernel keeps the
per-ray hit state in VMEM tiles across the whole triangle loop, streams ray
components in (ROWS x 128) blocks, and broadcasts triangle data from SMEM
scalars — dense VPU work with zero gather traffic.

Fat payload: the kernel *finishes* the surface interaction — interpolated
shading normal, geometric normal, uv, instance id — all transformed to
world space in-kernel (the per-lane lerped-matrix inverse for animated
instances is already computed for the ray transform, reference
instance.cpp:155-250 + transform.h:458-466). This is the Pallas analog of
OptiX closest-hit payload registers (reference scene_optix.inl:552-570)
fused with compute_surface_interaction; it eliminates every per-lane gather
the XLA path would need.

Entry points mirroring reference scene.cpp:125-167:
  * ``intersect_pallas`` — closest hit, full payload
  * ``ray_test_pallas``  — boolean any-hit

Brute-force over triangles: optimal for small/medium scenes; the two-level
BVH variant swaps in behind the same signature for large ones.
"""

from __future__ import annotations

import functools
import os
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128
# rows per grid step; keep (10 in + 13 out + live temps, double buffered)
# well under the ~16MB scoped VMEM
DEF_ROWS = 128

# SMEM triangle record layout (floats)
#  0:9   v0, e1, e2
#  9:18  n0, n1, n2 (vertex shading normals, hit space)
# 18:24  uv0, uv1, uv2
# 24     instance id (as float)
TRI_REC = 25
_SPH_SLOT_BASE = 1 << 28      # prim slots >= this are analytic spheres


class HitRecord(NamedTuple):
    t: jnp.ndarray        # (N,) inf on miss
    prim: jnp.ndarray     # (N,) int32 global triangle slot (-1 miss)
    inst: jnp.ndarray     # (N,) int32 instance id (-1 miss)
    u: jnp.ndarray
    v: jnp.ndarray
    gnx: jnp.ndarray      # geometric normal, world space, unnormalized
    gny: jnp.ndarray
    gnz: jnp.ndarray
    nsx: jnp.ndarray      # shading normal, world space, unnormalized
    nsy: jnp.ndarray
    nsz: jnp.ndarray
    uv_u: jnp.ndarray
    uv_v: jnp.ndarray


def _inv_lerped(mc0, mc1, tw0, tw1, time):
    """Per-lane inverse of the clamped keyframe lerp of two 3x4 matrices
    (reference transform.h:458-466). Returns (inv3x3 9-tuple, inv_t 3-tuple)."""
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


def _atan2(y, x):
    """Kernel-safe atan2: Mosaic has no atan2/atan lowering, so build it
    from a degree-9 minimax polynomial on [0,1] + octant reduction
    (max err ~1e-5 rad — far below any uv tolerance)."""
    ax = jnp.abs(x)
    ay = jnp.abs(y)
    hi = jnp.maximum(ax, ay)
    lo = jnp.minimum(ax, ay)
    a = lo / jnp.maximum(hi, 1e-30)
    s = a * a
    r = a * (0.99997726 + s * (-0.33262347 + s * (0.19354346
             + s * (-0.11643287 + s * (0.05265332 - s * 0.01172120)))))
    r = jnp.where(ay > ax, jnp.float32(np.pi / 2) - r, r)
    r = jnp.where(x < 0.0, jnp.float32(np.pi) - r, r)
    return jnp.where(y < 0.0, -r, r)


def _acos(z):
    """Kernel-safe acos via _atan2 (z pre-clipped by the caller)."""
    return _atan2(jnp.sqrt(jnp.maximum(1.0 - z * z, 0.0)), z)


def _sphere_hit(oox, ooy, ooz, odx, ody, odz, maxt, bt):
    """Nearest positive root of the unit-sphere quadratic (object space),
    reference src/shapes/sphere.cpp ray_intersect_preliminary semantics."""
    a = odx * odx + ody * ody + odz * odz
    b = 2.0 * (oox * odx + ooy * ody + ooz * odz)
    c = oox * oox + ooy * ooy + ooz * ooz - 1.0
    disc = b * b - 4.0 * a * c
    ok = disc >= 0.0
    sq = jnp.sqrt(jnp.maximum(disc, 0.0))
    # numerically stable roots
    q = -0.5 * (b + jnp.where(b >= 0.0, sq, -sq))
    safe_a = jnp.where(a != 0.0, a, 1.0)
    safe_q = jnp.where(q != 0.0, q, 1.0)
    t0 = q / safe_a
    t1 = c / safe_q
    tn = jnp.minimum(t0, t1)
    tf = jnp.maximum(t0, t1)
    t = jnp.where(tn > 0.0, tn, tf)
    hit = ok & (t > 0.0) & (t < maxt) & (t < bt)
    return hit, t


def _build_kernel(n_static: int, anim_ranges, any_hit: bool,
                  n_spheres: int = 0, sphere_animated=()):

    def kernel(tri_ref, inst_ref, sph_ref,
               ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref,
               time_ref, maxt_ref,
               *out_refs):
        ox = ox_ref[:]
        oy = oy_ref[:]
        oz = oz_ref[:]
        dx = dx_ref[:]
        dy = dy_ref[:]
        dz = dz_ref[:]
        maxt = maxt_ref[:]

        st = {
            "t": jnp.full(ox.shape, jnp.inf, jnp.float32),
            "prim": jnp.full(ox.shape, -1, jnp.int32),
            "inst": jnp.full(ox.shape, -1, jnp.int32),
        }
        if not any_hit:
            for k in ("u", "v", "gx", "gy", "gz", "nx", "ny", "nz",
                      "uu", "vv"):
                st[k] = jnp.zeros(ox.shape, jnp.float32)

        def test_tri(slot, o3, d3):
            r = tuple(tri_ref[slot, j] for j in range(TRI_REC))
            v0x, v0y, v0z, e1x, e1y, e1z, e2x, e2y, e2z = r[0:9]
            rox, roy, roz = o3
            rdx, rdy, rdz = d3
            px = rdy * e2z - rdz * e2y
            py = rdz * e2x - rdx * e2z
            pz = rdx * e2y - rdy * e2x
            det = e1x * px + e1y * py + e1z * pz
            ok = jnp.abs(det) > 1e-12
            inv = 1.0 / jnp.where(ok, det, 1.0)
            tx = rox - v0x
            ty = roy - v0y
            tz = roz - v0z
            u = (tx * px + ty * py + tz * pz) * inv
            qx = ty * e1z - tz * e1y
            qy = tz * e1x - tx * e1z
            qz = tx * e1y - ty * e1x
            v = (rdx * qx + rdy * qy + rdz * qz) * inv
            t = (e2x * qx + e2y * qy + e2z * qz) * inv
            hit = (ok & (u >= 0.0) & (v >= 0.0) & (u + v <= 1.0)
                   & (t > 0.0) & (t < maxt) & (t < st["t"]))
            st["t"] = jnp.where(hit, t, st["t"])
            st["prim"] = jnp.where(hit, slot, st["prim"])
            if not any_hit:
                inst_id = r[24]
                st["inst"] = jnp.where(hit, inst_id.astype(jnp.int32),
                                       st["inst"])
                w = 1.0 - u - v
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
                st["uu"] = jnp.where(hit, w * uv0u + u * uv1u + v * uv2u, st["uu"])
                st["vv"] = jnp.where(hit, w * uv0v + u * uv1v + v * uv2v, st["vv"])

        # ---- static triangles (world space) -----------------------------
        for i in range(n_static):
            test_tri(i, (ox, oy, oz), (dx, dy, dz))

        # ---- animated instances ------------------------------------------
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
                    test_tri(n_static + start + k,
                             (oox, ooy, ooz), (odx, ody, odz))

        # ---- analytic spheres (object-space unit sphere per instance) ----
        if n_spheres:
            time_s = time_ref[:]
            for s in range(n_spheres):
                mc0 = tuple(sph_ref[s, j] for j in range(12))
                if sphere_animated[s]:
                    mc1 = tuple(sph_ref[s, 12 + j] for j in range(12))
                    tw0 = sph_ref[s, 24]
                    tw1 = sph_ref[s, 25]
                    i3, it3 = _inv_lerped(mc0, mc1, tw0, tw1, time_s)
                else:
                    i3, it3 = _inv_lerped(mc0, mc0, sph_ref[s, 24],
                                          sph_ref[s, 25],
                                          jnp.zeros_like(time_s))
                oox = i3[0] * ox + i3[1] * oy + i3[2] * oz + it3[0]
                ooy = i3[3] * ox + i3[4] * oy + i3[5] * oz + it3[1]
                ooz = i3[6] * ox + i3[7] * oy + i3[8] * oz + it3[2]
                odx = i3[0] * dx + i3[1] * dy + i3[2] * dz
                ody = i3[3] * dx + i3[4] * dy + i3[5] * dz
                odz = i3[6] * dx + i3[7] * dy + i3[8] * dz
                hit, t = _sphere_hit(oox, ooy, ooz, odx, ody, odz, maxt,
                                     st["t"])
                st["t"] = jnp.where(hit, t, st["t"])
                slot = _SPH_SLOT_BASE + s
                st["prim"] = jnp.where(hit, slot, st["prim"])
                if not any_hit:
                    st["inst"] = jnp.where(
                        hit, sph_ref[s, 26].astype(jnp.int32), st["inst"])
                    # object-space normal = hit point; to world via inv^T
                    pnx = oox + t * odx
                    pny = ooy + t * ody
                    pnz = ooz + t * odz
                    wnx = i3[0] * pnx + i3[3] * pny + i3[6] * pnz
                    wny = i3[1] * pnx + i3[4] * pny + i3[7] * pnz
                    wnz = i3[2] * pnx + i3[5] * pny + i3[8] * pnz
                    for pre in ("g", "n"):
                        st[pre + "x"] = jnp.where(hit, wnx, st[pre + "x"])
                        st[pre + "y"] = jnp.where(hit, wny, st[pre + "y"])
                        st[pre + "z"] = jnp.where(hit, wnz, st[pre + "z"])
                    # spherical uv (reference sphere.cpp uv convention;
                    # _atan2/_acos: Mosaic-lowerable replacements)
                    phi = _atan2(pny, pnx)
                    u = phi * jnp.float32(0.15915494309)
                    u = jnp.where(u < 0.0, u + 1.0, u)
                    v = _acos(jnp.clip(pnz, -1.0, 1.0)) * jnp.float32(
                        0.31830988618)
                    st["uu"] = jnp.where(hit, u, st["uu"])
                    st["vv"] = jnp.where(hit, v, st["vv"])
                    st["u"] = jnp.where(hit, 0.0, st["u"])
                    st["v"] = jnp.where(hit, 0.0, st["v"])

        if anim_ranges:
            if not any_hit:
                # normals of animated hits: world = inv(M)^T * n_obj
                for a, (inst, start, count) in enumerate(anim_ranges):
                    mc0 = tuple(inst_ref[a, j] for j in range(12))
                    mc1 = tuple(inst_ref[a, 12 + j] for j in range(12))
                    tw0 = inst_ref[a, 24]
                    tw1 = inst_ref[a, 25]
                    i3, _ = _inv_lerped(mc0, mc1, tw0, tw1, time)
                    m = st["inst"] == inst
                    for pre in ("g", "n"):
                        x = st[pre + "x"]
                        y = st[pre + "y"]
                        z = st[pre + "z"]
                        wx = i3[0] * x + i3[3] * y + i3[6] * z
                        wy = i3[1] * x + i3[4] * y + i3[7] * z
                        wz = i3[2] * x + i3[5] * y + i3[8] * z
                        st[pre + "x"] = jnp.where(m, wx, x)
                        st[pre + "y"] = jnp.where(m, wy, y)
                        st[pre + "z"] = jnp.where(m, wz, z)

        if any_hit:
            out_refs[0][:] = (st["prim"] >= 0).astype(jnp.int32)
        else:
            for ref, k in zip(out_refs,
                              ("t", "prim", "inst", "u", "v", "gx", "gy",
                               "gz", "nx", "ny", "nz", "uu", "vv")):
                ref[:] = st[k]

    return kernel


@functools.lru_cache(maxsize=64)
def _compiled(n_static: int, anim_ranges, any_hit: bool, n_rows: int,
              rows_per_block: int, interpret: bool,
              n_spheres: int = 0, sphere_animated=()):
    kernel = _build_kernel(n_static, anim_ranges, any_hit, n_spheres,
                           sphere_animated)
    grid = (n_rows // rows_per_block,)
    lane_spec = pl.BlockSpec((rows_per_block, LANES), lambda i: (i, 0),
                             memory_space=pltpu.VMEM)
    in_specs = [
        pl.BlockSpec(memory_space=pltpu.SMEM),   # triangle records
        pl.BlockSpec(memory_space=pltpu.SMEM),   # animated-instance records
        pl.BlockSpec(memory_space=pltpu.SMEM),   # sphere records
    ] + [lane_spec] * 8
    f32 = jnp.float32
    i32 = jnp.int32
    if any_hit:
        dtypes = [i32]
    else:
        dtypes = [f32, i32, i32] + [f32] * 10
    out_shape = [jax.ShapeDtypeStruct((n_rows, LANES), dt) for dt in dtypes]
    out_specs = [lane_spec] * len(dtypes)

    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        interpret=interpret,
    )


def scene_tables(sa):
    """Build the SMEM triangle/instance/sphere tables from SceneArrays.
    Built in-graph on every trace (XLA CSEs the stacks); caching them on the
    SceneArrays object would leak tracers across jit scopes."""
    cols = ("v0x", "v0y", "v0z", "e1x", "e1y", "e1z", "e2x", "e2y", "e2z",
            "n0x", "n0y", "n0z", "n1x", "n1y", "n1z", "n2x", "n2y", "n2z",
            "uv0u", "uv0v", "uv1u", "uv1v", "uv2u", "uv2v")

    def table(prefix, n):
        if n == 0:
            return jnp.zeros((0, TRI_REC), jnp.float32)
        parts = [sa.tri(prefix, c)[:n] for c in cols]
        parts.append(sa.tri(prefix, "inst")[:n].astype(jnp.float32))
        return jnp.stack(parts, axis=-1)

    tri_table = jnp.concatenate(
        [table("s", sa.n_static_tris), table("a", sa.n_anim_tris)], axis=0)
    if tri_table.shape[0] == 0:
        tri_table = jnp.zeros((1, TRI_REC), jnp.float32)

    if sa.anim_ranges:
        rows = []
        for (inst, start, count) in sa.anim_ranges:
            rows.append(jnp.concatenate([
                sa.inst_m0c[:, inst], sa.inst_m1c[:, inst],
                sa.inst_t0[inst][None], sa.inst_t1[inst][None]]))
        inst_table = jnp.stack(rows, axis=0)
    else:
        inst_table = jnp.zeros((1, 26), jnp.float32)

    # sphere records: m0c(12) + m1c(12) + t0 + t1 + inst
    if sa.n_spheres:
        sph_table = jnp.concatenate([
            sa.sph_m0c.T, sa.sph_m1c.T, sa.sph_t0[:, None],
            sa.sph_t1[:, None], sa.sph_inst[:, None].astype(jnp.float32),
        ], axis=1)
    else:
        sph_table = jnp.zeros((1, 27), jnp.float32)

    return tri_table, inst_table, sph_table


def _run(sa, ray, any_hit: bool, rows_per_block: int = DEF_ROWS,
         spheres_only: bool = False):
    n = ray.o.x.shape[0]
    blk = rows_per_block * LANES
    n_pad = -(-n // blk) * blk
    n_rows = n_pad // LANES

    def pad(x, fill=0.0):
        if n_pad == n:
            return x
        return jnp.concatenate(
            [x, jnp.full((n_pad - n,), fill, x.dtype)], axis=0)

    tri_table, inst_table, sph_table = scene_tables(sa)
    n_static = sa.n_static_tris
    anim_ranges = tuple(sa.anim_ranges)
    if spheres_only:
        # triangles handled by the streamed kernel; this pass unrolls only
        # the (always few) analytic spheres
        tri_table = jnp.zeros((1, TRI_REC), jnp.float32)
        n_static = 0
        anim_ranges = ()
    interpret = jax.default_backend() == "cpu"
    fn = _compiled(n_static, anim_ranges, any_hit, n_rows,
                   min(rows_per_block, n_rows), interpret,
                   sa.n_spheres, tuple(sa.sphere_animated))

    args = [tri_table, inst_table, sph_table] + [
        pad(getattr(ray.o, c)).reshape(n_rows, LANES) for c in "xyz"] + [
        pad(getattr(ray.d, c)).reshape(n_rows, LANES) for c in "xyz"] + [
        pad(ray.time).reshape(n_rows, LANES),
        pad(ray.maxt, fill=-1.0).reshape(n_rows, LANES),
    ]
    outs = fn(*args)
    return [o.reshape(-1)[:n] for o in outs]


# above this TOTAL triangle count (static + animated), the unrolled kernel's
# compile time gets impractical: stream all triangles through the two-level
# chunked kernel (intersect_stream.py) with O(1) compile time
STREAM_THRESHOLD = 192


def _stream_rows(sa):
    from .intersect_stream import ANIM_ROWS, DEF_ROWS
    return ANIM_ROWS if sa.anim_ranges else DEF_ROWS


def _kernel_choice() -> str:
    """Large-scene kernel selector (MI_STREAM_KERNEL): 'v4' (default) is
    the 32-tri Woop-unit kernel with XLA-precomputed visit gates and
    grouped iterations (intersect_v4.py); 'v2' the 128-tri-chunk two-phase
    VPU kernel (intersect_v2.py); 'v3' the ungrouped 32-tri predecessor;
    'v1' the always-streamed two-level kernel (intersect_stream.py); 'mxu'
    the two-phase MXU formulation (intersect_mxu.py, parity-exact but ~3x
    slower than v1 at 40k tris on v5e: K=8 contraction at ~6% MXU
    utilization and f32-HIGHEST is a 6-pass emulation)."""
    import os
    return os.environ.get("MI_STREAM_KERNEL", "v4")


def intersect_pallas(sa, ray, active=None) -> HitRecord:
    if sa.n_static_tris + sa.n_anim_tris <= STREAM_THRESHOLD:
        return HitRecord(*_run(sa, ray, any_hit=False))
    from .ray_binning import binned, should_bin
    n = ray.o.x.shape[0]
    choice = _kernel_choice()
    if choice in ("v2", "v3", "v4"):
        from .intersect_mxu import payload_from_prim
        if choice == "v4":
            from .intersect_v4 import (intersect_v4 as isect,
                                       intersect_v4_2r, intersect_v4_2lite,
                                       v4_rows as krows)
        elif choice == "v3":
            from .intersect_v3 import intersect_v3 as isect, v3_rows as krows
        else:
            from .intersect_v2 import intersect_v2 as isect, v2_rows as krows
        if should_bin(sa, n, krows(), LANES):
            # MI_V4_ROUNDS: "1" single uncapped walk, "lite" the in-place
            # capped round 1 + seeded round 2 (no resort — see
            # intersect_v4_2lite), "2" the full resorting two-round
            # scheme. Under strip-pass populations (round 5) "2" measured
            # +17 ms per closest-hit / +31 ms per any-hit vs "1"
            # (_passdecomp.py).
            rounds = os.environ.get("MI_V4_ROUNDS", "1")
            if choice == "v4" and rounds == "2":
                t, prim = intersect_v4_2r(sa, ray, active)
            elif choice == "v4" and rounds == "lite":
                t, prim = binned(sa, ray, active,
                                 lambda r: list(intersect_v4_2lite(sa, r)))
            else:
                t, prim = binned(sa, ray, active,
                                 lambda r: list(isect(sa, r)))
        else:
            t, prim = isect(sa, ray)
        hit_s = payload_from_prim(sa, ray, t, prim)
    elif choice == "mxu":
        from .intersect_mxu import DEF_BLK, intersect_mxu, payload_from_prim
        if should_bin(sa, n, DEF_BLK // LANES, LANES):
            t, prim = binned(sa, ray, active,
                             lambda r: list(intersect_mxu(sa, r)))
        else:
            t, prim = intersect_mxu(sa, ray)
        hit_s = payload_from_prim(sa, ray, t, prim)
    else:
        from .intersect_stream import intersect_stream
        if should_bin(sa, n, _stream_rows(sa), LANES):
            outs = binned(sa, ray, active,
                          lambda r: intersect_stream(sa, r))
            hit_s = HitRecord(*outs)
        else:
            hit_s = HitRecord(*intersect_stream(sa, ray))
    if sa.n_spheres == 0:
        return hit_s
    hit_d = HitRecord(*_run(sa, ray, any_hit=False, spheres_only=True))
    take_d = hit_d.t < hit_s.t
    merged = [jnp.where(take_d, d, s_) for d, s_ in zip(hit_d, hit_s)]
    return HitRecord(*merged)


def ray_test_pallas(sa, ray, active=None):
    if sa.n_static_tris + sa.n_anim_tris <= STREAM_THRESHOLD:
        (occ,) = _run(sa, ray, any_hit=True)
        return occ > 0
    from .ray_binning import binned, should_bin
    n = ray.o.x.shape[0]
    choice = _kernel_choice()
    if choice in ("v2", "v3", "v4"):
        if choice == "v4":
            from .intersect_v4 import (intersect_v4 as isect,
                                       intersect_v4_2r, intersect_v4_2lite,
                                       v4_rows as krows)
        elif choice == "v3":
            from .intersect_v3 import intersect_v3 as isect, v3_rows as krows
        else:
            from .intersect_v2 import intersect_v2 as isect, v2_rows as krows
        if should_bin(sa, n, krows(), LANES):
            rounds = os.environ.get("MI_V4_ROUNDS", "1")
            if choice == "v4" and rounds == "2":
                occ = intersect_v4_2r(sa, ray, active, any_hit=True)[1] >= 0
            elif choice == "v4" and rounds == "lite":
                (occ_i,) = binned(
                    sa, ray, active,
                    lambda r: [intersect_v4_2lite(
                        sa, r, any_hit=True)[1] >= 0])
                occ = occ_i > 0
            else:
                (occ_i,) = binned(
                    sa, ray, active,
                    lambda r: [isect(sa, r, any_hit=True)[1] >= 0])
                occ = occ_i > 0
        else:
            occ = isect(sa, ray, any_hit=True)[1] >= 0
    elif choice == "mxu":
        from .intersect_mxu import DEF_BLK, intersect_mxu
        if should_bin(sa, n, DEF_BLK // LANES, LANES):
            (occ_i,) = binned(
                sa, ray, active,
                lambda r: [intersect_mxu(sa, r, any_hit=True)[1] >= 0])
            occ = occ_i > 0
        else:
            occ = intersect_mxu(sa, ray, any_hit=True)[1] >= 0
    else:
        from .intersect_stream import intersect_stream
        if should_bin(sa, n, _stream_rows(sa), LANES):
            (occ_i,) = binned(
                sa, ray, active,
                lambda r: [intersect_stream(sa, r, any_hit=True)[1] >= 0])
            occ = occ_i > 0
        else:
            t_s, prim_s = intersect_stream(sa, ray, any_hit=True)
            occ = prim_s >= 0
    if sa.n_spheres > 0:
        (occ_d,) = _run(sa, ray, any_hit=True, spheres_only=True)
        occ = occ | (occ_d > 0)
    return occ


__all__ = ["intersect_pallas", "ray_test_pallas", "HitRecord",
           "scene_tables"]
