"""Quantify the block-coherence gap of the large-scene kernels.

For real ray populations (camera / diffuse bounce / shadow) on the bench
scenes, measures — per lane block after the production binning sort —

  1. `list`   : visit-list length the production `_visit_order` computes
                (conservative interval slab test over BLOCK ray bounds);
  2. `union`  : the per-lane-EXACT union — number of chunks any lane in the
                block actually needs under per-lane front-to-back traversal
                (slab overlap AND entry distance <= that lane's true hit t);
  3. `ideal`  : mean per-LANE need — the single-ray BVH-class lower bound.

`list/union` is the looseness of interval arithmetic over block bounds
(mixed-sign direction axes are disabled entirely); `union/ideal` is the
residual cost of lockstep blocks. Whichever ratio is big is the lever.

Usage: python scripts/coherence_lab.py [--rows 8,16,32] [--scene anim40k]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

import mitsuba3dopplertof_tpu as mi
from mitsuba3dopplertof_tpu.core import transform as tf
from mitsuba3dopplertof_tpu.core.transform import AnimatedTransform
from mitsuba3dopplertof_tpu.core.vec import Vec3, normalize, dot, cross
from mitsuba3dopplertof_tpu.render.types import Ray
from mitsuba3dopplertof_tpu.render.scene import ray_intersect
from mitsuba3dopplertof_tpu.ops.ray_binning import bin_key
from mitsuba3dopplertof_tpu.ops.intersect_stream import CHUNK, PAD_TO
from mitsuba3dopplertof_tpu.sensors import sample_ray as sensor_sample_ray

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from bench_suite import animated_mesh_scene, static_mesh_scene  # noqa: E402

SUBS = PAD_TO // CHUNK
_BIG = np.float32(3.0e38)


def lane_slabs(o, d, boxes):
    """Per-(lane, box) exact slab entry/exit. o,d: (3, N); boxes: (C, 6).
    Returns t_lo, t_hi with empty-overlap pairs t_lo>t_hi."""
    t_lo = jnp.zeros((o.shape[1], boxes.shape[0]), jnp.float32)
    t_hi = jnp.full((o.shape[1], boxes.shape[0]), _BIG, jnp.float32)
    for ax in range(3):
        da = d[ax][:, None]
        oa = o[ax][:, None]
        ok = jnp.abs(da) > 1e-20
        inv = 1.0 / jnp.where(ok, da, 1.0)
        ta = (boxes[None, :, ax] - oa) * inv
        tb = (boxes[None, :, 3 + ax] - oa) * inv
        lo = jnp.minimum(ta, tb)
        hi = jnp.maximum(ta, tb)
        inside = (oa >= boxes[None, :, ax]) & (oa <= boxes[None, :, 3 + ax])
        lo = jnp.where(ok, lo, jnp.where(inside, -_BIG, _BIG))
        hi = jnp.where(ok, hi, jnp.where(inside, _BIG, -_BIG))
        t_lo = jnp.maximum(t_lo, lo)
        t_hi = jnp.minimum(t_hi, hi)
    return t_lo, t_hi


def analyze(sa, ray, t_true, label, rows_list):
    n = ray.o.x.shape[0]
    aabb = sa.chunk_aabb
    lo = jnp.min(aabb[:, :3], axis=0)
    hi = jnp.max(aabb[:, 3:], axis=0)
    if os.environ.get("MI_LAB_KEY", "") == "firstchunk":
        # group lanes by the chunk they would test FIRST (min t_lo over
        # overlapped chunks) — the coherence metric the kernel actually
        # consumes; ties broken by the production morton key
        sb_ = aabb.reshape(-1, SUBS, 6)
        cb_ = jnp.concatenate([jnp.min(sb_[:, :, :3], axis=1),
                               jnp.max(sb_[:, :, 3:], axis=1)], axis=1)
        oo = jnp.stack([ray.o.x, ray.o.y, ray.o.z])
        dd = jnp.stack([ray.d.x, ray.d.y, ray.d.z])
        t_lo_, t_hi_ = lane_slabs(oo, dd, cb_)
        live_ = cb_[:, 0] <= cb_[:, 3]
        ok_ = ((t_lo_ <= t_hi_) & (t_hi_ > 0.0) & live_[None]
               & (t_lo_ <= jnp.asarray(ray.maxt)[:, None]))
        first = jnp.argmin(jnp.where(ok_, t_lo_, _BIG), axis=1)
        first = jnp.where(jnp.any(ok_, axis=1), first, 1 << 20)
        sub_key = np.asarray(bin_key(ray, lo, hi)).astype(np.int64)
        key = np.asarray(first).astype(np.int64) << 32 | sub_key
    else:
        key = np.asarray(bin_key(ray, lo, hi))
    perm = np.argsort(key, kind="stable")

    o = jnp.stack([ray.o.x, ray.o.y, ray.o.z])[:, perm]
    d = jnp.stack([ray.d.x, ray.d.y, ray.d.z])[:, perm]
    tt = jnp.asarray(t_true)[perm]
    mt = jnp.asarray(ray.maxt)[perm]

    # chunk-level union boxes (C, 6)
    sb = aabb.reshape(-1, SUBS, 6)
    cb = jnp.concatenate([jnp.min(sb[:, :, :3], axis=1),
                          jnp.max(sb[:, :, 3:], axis=1)], axis=1)
    C = cb.shape[0]

    @jax.jit
    def per_lane(o, d, tt, mt):
        t_lo, t_hi = lane_slabs(o, d, cb)
        bound = jnp.minimum(tt, mt)[:, None] * 1.0001 + 1e-4
        # lane needs chunk iff slab overlap non-empty, starts before its
        # own termination bound, and the chunk is live
        live = cb[:, 0] <= cb[:, 3]
        need = (t_lo <= t_hi) & (t_hi > 0.0) & (t_lo <= bound) & live[None]
        return need

    need = per_lane(o, d, tt, mt)                     # (N, C) bool
    ideal = float(jnp.mean(jnp.sum(need, axis=1)))

    out = {"label": label, "n": n, "chunks": int(C), "ideal": round(ideal, 1)}
    for rows in rows_list:
        blk = rows * 128
        nb = n // blk
        m = nb * blk
        nd = need[:m].reshape(nb, blk, C)
        union = float(jnp.mean(jnp.sum(jnp.any(nd, axis=1), axis=1)))
        # production visit-list length (interval arithmetic over block
        # bounds, maxt as t_hi cap)
        from mitsuba3dopplertof_tpu.ops.intersect_mxu import _visit_order
        x = jnp.concatenate([o[:, :m], jnp.ones((1, m)), d[:, :m],
                             mt[None, :m]], axis=0)
        _, tlo = _visit_order(aabb, C, -(-C // 128) * 128, x, blk)
        tlo = tlo.reshape(-1, tlo.shape[-1])[:nb]
        lst = float(jnp.mean(jnp.sum(tlo < 1e37, axis=1)))
        out[f"r{rows}"] = {"list": round(lst, 1), "union": round(union, 1)}
    return out


def main():
    rows_list = [8, 16, 32]
    scene_name = "anim40k"
    for a in sys.argv[1:]:
        if a.startswith("--rows"):
            rows_list = [int(x) for x in a.split("=", 1)[1].split(",")]
        if a.startswith("--scene"):
            scene_name = a.split("=", 1)[1]

    if scene_name == "anim40k":
        ntri, scene = animated_mesh_scene(mi, tf, AnimatedTransform,
                                          144, 140, 16)
    else:
        ntri, scene = static_mesh_scene(mi, tf, 160, 158, 16)
    sa = scene.compile()
    print(f"scene {scene_name}: {ntri} tris, "
          f"{sa.chunk_aabb.shape[0] // SUBS} chunks", flush=True)

    n = 1 << 19
    k = jax.random.PRNGKey(0)
    k1, k2, k3 = jax.random.split(k, 3)
    su = jax.random.uniform(k1, (2, n))
    params = scene.sensor.device_params()
    time = jnp.full((n,), 0.00075, jnp.float32)
    ray, _ = sensor_sample_ray(params, time, su[0], su[1],
                               jnp.full((n,), 0.5), jnp.full((n,), 0.5))
    ray = ray._replace(maxt=jnp.full((n,), _BIG, jnp.float32))
    si = ray_intersect(sa, ray)
    t_cam = jnp.where(si.valid, si.t, jnp.float32(_BIG))
    print(analyze(sa, ray, t_cam, "camera", rows_list), flush=True)

    # diffuse bounce from the camera hits (valid lanes only, compacted)
    v = np.asarray(si.valid)
    idx = np.nonzero(v)[0]
    m = (len(idx) // 1024) * 1024
    idx = idx[:m]

    def take(a):
        return jnp.asarray(np.asarray(a)[idx])

    p = Vec3(take(si.p.x), take(si.p.y), take(si.p.z))
    nrm = Vec3(take(si.sh_n.x), take(si.sh_n.y), take(si.sh_n.z))
    u = jax.random.uniform(k2, (2, m))
    r = jnp.sqrt(u[0])
    phi = 2 * np.pi * u[1]
    lx = r * jnp.cos(phi)
    ly = r * jnp.sin(phi)
    lz = jnp.sqrt(jnp.maximum(0.0, 1.0 - u[0]))
    # frame around normal
    tang = normalize(cross(nrm, Vec3(jnp.where(jnp.abs(nrm.x) < 0.9,
                                               1.0, 0.0),
                                     jnp.where(jnp.abs(nrm.x) < 0.9,
                                               0.0, 1.0),
                                     jnp.zeros(m))))
    bit = cross(nrm, tang)
    wd = Vec3(tang.x * lx + bit.x * ly + nrm.x * lz,
              tang.y * lx + bit.y * ly + nrm.y * lz,
              tang.z * lx + bit.z * ly + nrm.z * lz)
    po = Vec3(p.x + nrm.x * 1e-4, p.y + nrm.y * 1e-4, p.z + nrm.z * 1e-4)
    bray = Ray(po, wd, take(si.time), jnp.full((m,), _BIG, jnp.float32))
    bsi = ray_intersect(sa, bray)
    t_b = jnp.where(bsi.valid, bsi.t, jnp.float32(_BIG))
    print(analyze(sa, bray, t_b, "bounce", rows_list), flush=True)

    # shadow rays to the point light
    lightp = jnp.asarray([0.0, 4.0, -4.0])
    sd = Vec3(lightp[0] - po.x, lightp[1] - po.y, lightp[2] - po.z)
    dist = jnp.sqrt(sd.x**2 + sd.y**2 + sd.z**2)
    sdn = Vec3(sd.x / dist, sd.y / dist, sd.z / dist)
    sray = Ray(po, sdn, take(si.time), dist * 0.9999)
    # any-hit "true t": first hit distance (use closest as proxy)
    ssi = ray_intersect(sa, sray)
    t_s = jnp.where(ssi.valid, ssi.t, jnp.asarray(sray.maxt))
    print(analyze(sa, sray, t_s, "shadow", rows_list), flush=True)


if __name__ == "__main__":
    main()
