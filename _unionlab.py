"""Union lab: for each lane block (rows x 128), measure
  * interval-possible: units passing the block's interval slab test
    (what _unit_visit_order puts on the list, mt-capped)
  * exact-possible:    units SOME lane's per-lane slab test enters
    (t_lo <= min(maxt, scene-exit)) — what exact per-block unions give
  * exact-ideal:       units some lane enters BEFORE its own closest hit
    (t_lo <= min(t_hit, maxt)) — the floor for any two-round scheme

on camera / bounce / shadow populations of the 40k bench scene, at
rows in {8, 32}. Decides whether exact-union culling is the next lever.
"""
import sys, time

import numpy as np
import jax, jax.numpy as jnp

sys.path.insert(0, '/root/repo')
import mitsuba3dopplertof_tpu as mi
from mitsuba3dopplertof_tpu.core import transform as tf
from mitsuba3dopplertof_tpu.core.transform import AnimatedTransform
from mitsuba3dopplertof_tpu.core.vec import Vec3, normalize, cross
from mitsuba3dopplertof_tpu.render.types import Ray
from mitsuba3dopplertof_tpu.render.scene import ray_intersect
from mitsuba3dopplertof_tpu.ops.ray_binning import bin_key
from mitsuba3dopplertof_tpu.ops import intersect_v4 as v4
from mitsuba3dopplertof_tpu.ops.intersect_v3 import _unit_visit_order
from mitsuba3dopplertof_tpu.ops.intersect_v2 import scene_box_exit
from mitsuba3dopplertof_tpu.ops.intersect_stream import _chunked_layout
sys.path.insert(0, '/root/repo/scripts')
from bench_suite import animated_mesh_scene
from mitsuba3dopplertof_tpu.sensors import sample_ray as sensor_sample_ray

_BIG = np.float32(3.0e38)
NU = int(sys.argv[1]) if len(sys.argv) > 1 else 144
NV = int(sys.argv[2]) if len(sys.argv) > 2 else 140

ntri, scene = animated_mesh_scene(mi, tf, AnimatedTransform, NU, NV, 16)
sa = scene.compile()
n = 1 << 20
k1, k2 = jax.random.split(jax.random.PRNGKey(0))
su = jax.random.uniform(k1, (2, n))
params = scene.sensor.device_params()
tw = jnp.full((n,), 0.00075, jnp.float32)
ray, _ = sensor_sample_ray(params, tw, su[0], su[1],
                           jnp.full((n,), 0.5), jnp.full((n,), 0.5))
ray = ray._replace(maxt=jnp.full((n,), _BIG, jnp.float32))

si = ray_intersect(sa, ray, None)
p = Vec3(si.p.x, si.p.y, si.p.z)
nrm = Vec3(si.sh_n.x, si.sh_n.y, si.sh_n.z)
u = jax.random.uniform(k2, (2, n))
r_ = jnp.sqrt(u[0])
phi = 2 * np.pi * u[1]
lx, ly = r_ * jnp.cos(phi), r_ * jnp.sin(phi)
lz = jnp.sqrt(jnp.maximum(0.0, 1.0 - u[0]))
tang = normalize(cross(nrm, Vec3(
    jnp.where(jnp.abs(nrm.x) < 0.9, 1.0, 0.0),
    jnp.where(jnp.abs(nrm.x) < 0.9, 0.0, 1.0), jnp.zeros(n))))
bit = cross(nrm, tang)
wd = Vec3(tang.x * lx + bit.x * ly + nrm.x * lz,
          tang.y * lx + bit.y * ly + nrm.y * lz,
          tang.z * lx + bit.z * ly + nrm.z * lz)
po = Vec3(p.x + nrm.x * 1e-4, p.y + nrm.y * 1e-4, p.z + nrm.z * 1e-4)
bmaxt = jnp.where(si.valid, _BIG, jnp.float32(-1.0))
bray = Ray(po, wd, ray.time, bmaxt)

aabb = sa.chunk_aabb
lo = jnp.min(aabb[:, :3], axis=0)
hi = jnp.max(aabb[:, 3:], axis=0)

segments, meta32 = _chunked_layout(sa.n_static_tris, sa.anim_ranges)
n_units = meta32.shape[0]
box = sa.chunk_aabb
print(f"scene {ntri} tris -> {n_units} units of 32", flush=True)


def sorted_rays(r):
    key = bin_key(r, lo, hi)
    perm = jnp.argsort(key, stable=True)
    t = lambda x: jnp.take(x, perm, axis=0)
    return Ray(Vec3(t(r.o.x), t(r.o.y), t(r.o.z)),
               Vec3(t(r.d.x), t(r.d.y), t(r.d.z)), t(r.time), t(r.maxt))


def block_stats(r, t_hit, rows):
    """Per-block interval-possible / exact-possible / exact-ideal counts.
    Chunked over units to avoid (n, n_units) materialization."""
    blk = rows * 128
    nb = n // blk
    bx = jnp.asarray(box)

    inv_x = 1.0 / jnp.where(r.d.x == 0.0, 1e-30, r.d.x)
    inv_y = 1.0 / jnp.where(r.d.y == 0.0, 1e-30, r.d.y)
    inv_z = 1.0 / jnp.where(r.d.z == 0.0, 1e-30, r.d.z)
    exit_t = scene_box_exit(
        bx, (r.o.x, r.o.y, r.o.z), (r.d.x, r.d.y, r.d.z))
    live = r.maxt > 0
    cap_pos = jnp.where(live, jnp.minimum(r.maxt, exit_t), -_BIG)
    cap_idl = jnp.minimum(cap_pos, t_hit)

    C = 32  # units per chunk

    def body(c, acc):
        pos_acc, idl_acc = acc
        s0 = c * C
        b = jax.lax.dynamic_slice(bx, (s0, 0), (C, 6))      # (C, 6)
        # per-lane slab for C units: (n, C)
        def slab(cap):
            t0x = (b[None, :, 0] - r.o.x[:, None]) * inv_x[:, None]
            t1x = (b[None, :, 3] - r.o.x[:, None]) * inv_x[:, None]
            t0y = (b[None, :, 1] - r.o.y[:, None]) * inv_y[:, None]
            t1y = (b[None, :, 4] - r.o.y[:, None]) * inv_y[:, None]
            t0z = (b[None, :, 2] - r.o.z[:, None]) * inv_z[:, None]
            t1z = (b[None, :, 5] - r.o.z[:, None]) * inv_z[:, None]
            t_lo = jnp.maximum(jnp.maximum(jnp.minimum(t0x, t1x),
                                           jnp.minimum(t0y, t1y)),
                               jnp.maximum(jnp.minimum(t0z, t1z), 0.0))
            t_hi = jnp.minimum(jnp.minimum(jnp.maximum(t0x, t1x),
                                           jnp.maximum(t0y, t1y)),
                               jnp.minimum(jnp.maximum(t0z, t1z),
                                           cap[:, None]))
            return t_lo <= t_hi                              # (n, C)
        ent_pos = slab(cap_pos).reshape(nb, blk, C).any(axis=1)
        ent_idl = slab(cap_idl).reshape(nb, blk, C).any(axis=1)
        return (pos_acc + ent_pos.sum(axis=1).astype(jnp.int32),
                idl_acc + ent_idl.sum(axis=1).astype(jnp.int32))

    nc = n_units // C
    pos, idl = jax.lax.fori_loop(
        0, nc, body, (jnp.zeros((nb,), jnp.int32),
                      jnp.zeros((nb,), jnp.int32)))
    rem = n_units - nc * C
    return pos, idl, rem


def interval_possible(r, rows):
    blk = rows * 128
    c_pad = -(-n_units // 128) * 128
    o = (r.o.x, r.o.y, r.o.z)
    d = (r.d.x, r.d.y, r.d.z)
    exit_t = scene_box_exit(jnp.asarray(box), o, d)
    maxtp = jnp.minimum(jnp.minimum(r.maxt, _BIG), exit_t)
    x = jnp.stack(list(o) + [jnp.ones((n,), jnp.float32)]
                  + list(d) + [maxtp], axis=0)
    order, tlo = _unit_visit_order(jnp.asarray(box), n_units, c_pad, x, blk)
    nb = n // blk
    tl = tlo.reshape(-1, c_pad)[:nb]
    return (tl < 1e36).sum(axis=1)


for label, rr, anyh in (("camera", ray, False), ("bounce", bray, False)):
    rs = jax.block_until_ready(sorted_rays(rr))
    t_hit, prim = v4.intersect_v4(sa, rs, any_hit=anyh)
    t_hit = jnp.where(jnp.isfinite(t_hit), t_hit, _BIG)
    for rows in (8, 32):
        ip = np.asarray(jax.jit(interval_possible,
                                static_argnums=1)(rs, rows))
        pos, idl, rem = jax.jit(block_stats, static_argnums=2)(
            rs, t_hit, rows)
        pos, idl = np.asarray(pos), np.asarray(idl)
        print(f"{label} r{rows}: interval-possible mean "
              f"{ip.mean():.0f} p90 {np.percentile(ip, 90):.0f} | "
              f"exact-possible mean {pos.mean():.0f} p90 "
              f"{np.percentile(pos, 90):.0f} | exact-ideal mean "
              f"{idl.mean():.0f} p90 {np.percentile(idl, 90):.0f} "
              f"(+{rem} units untested)", flush=True)
print("done", flush=True)
