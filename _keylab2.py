"""Key-layout lab (round 5): exact-possible / exact-ideal per-block union
sizes for BOUNCE rays under alternative sort-key bit layouts.

Current key (ray_binning.bin_key): octant(3) | morton21 | db6 — for bounce
rays the 21 origin-Morton bits all differ, so the 6 direction bits below
them never partition anything: a block's directions span its whole octant.
Candidates move direction bits ABOVE the fine origin bits so diffuse
blocks get a direction cone at the cost of coarser origin cells.
"""
import sys

import numpy as np
import jax, jax.numpy as jnp

sys.path.insert(0, '/root/repo')
import mitsuba3dopplertof_tpu as mi
from mitsuba3dopplertof_tpu.core import transform as tf
from mitsuba3dopplertof_tpu.core.transform import AnimatedTransform
from mitsuba3dopplertof_tpu.core.vec import Vec3, normalize, cross
from mitsuba3dopplertof_tpu.render.types import Ray
from mitsuba3dopplertof_tpu.render.scene import ray_intersect
from mitsuba3dopplertof_tpu.ops.ray_binning import bin_key, _part1by2
from mitsuba3dopplertof_tpu.ops import intersect_v4 as v4
from mitsuba3dopplertof_tpu.ops.intersect_v2 import scene_box_exit
from mitsuba3dopplertof_tpu.ops.intersect_stream import _chunked_layout
sys.path.insert(0, '/root/repo/scripts')
from bench_suite import animated_mesh_scene
from mitsuba3dopplertof_tpu.sensors import sample_ray as sensor_sample_ray

_BIG = np.float32(3.0e38)

ntri, scene = animated_mesh_scene(mi, tf, AnimatedTransform, 144, 140, 16)
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
print(f"scene {ntri} tris -> {n_units} units", flush=True)


def key_parts(r):
    octant = ((r.d.x < 0).astype(jnp.int32)
              | ((r.d.y < 0).astype(jnp.int32) << 1)
              | ((r.d.z < 0).astype(jnp.int32) << 2))
    ext = jnp.maximum(hi - lo, 1e-30)

    def q(pv, ax, bits):
        t = jnp.clip((pv - lo[ax]) / ext[ax], 0.0, 1.0)
        return (t * (2.0 ** bits - 1e-3)).astype(jnp.int32)

    ax_ = jnp.abs(r.d.x)
    ay_ = jnp.abs(r.d.y)
    s = ax_ + ay_ + jnp.abs(r.d.z)
    inv = 1.0 / jnp.maximum(s, 1e-30)
    return octant, q, ax_ * inv, ay_ * inv


def db_bits(dxf, dyf, bits_each):
    m = 2.0 ** bits_each - 1e-3
    return (((dxf * m).astype(jnp.int32) << bits_each)
            | (dyf * m).astype(jnp.int32))


def key_current(r):
    return bin_key(r, lo, hi)


def key_dirhi(r, mhi_per_axis, db_each, mlo_per_axis):
    """octant | morton_hi | direction | morton_lo."""
    octant, q, dxf, dyf = key_parts(r)
    tot = mhi_per_axis + mlo_per_axis
    qx = q(r.o.x, 0, tot)
    qy = q(r.o.y, 1, tot)
    qz = q(r.o.z, 2, tot)
    mor = (_part1by2(qx >> mlo_per_axis)
           | (_part1by2(qy >> mlo_per_axis) << 1)
           | (_part1by2(qz >> mlo_per_axis) << 2))
    mask = (1 << mlo_per_axis) - 1
    mlo = (_part1by2(qx & mask) | (_part1by2(qy & mask) << 1)
           | (_part1by2(qz & mask) << 2))
    db = db_bits(dxf, dyf, db_each)
    nlo = 3 * mlo_per_axis
    ndb = 2 * db_each
    key = (octant << (3 * mhi_per_axis + ndb + nlo)) \
        | (mor << (ndb + nlo)) | (db << nlo) | mlo
    return jnp.where(r.maxt <= 0.0, jnp.int32(1 << 30), key)


def sort_by(r, key):
    perm = jnp.argsort(key, stable=True)
    t = lambda x: jnp.take(x, perm, axis=0)
    return Ray(Vec3(t(r.o.x), t(r.o.y), t(r.o.z)),
               Vec3(t(r.d.x), t(r.d.y), t(r.d.z)), t(r.time), t(r.maxt))


def block_stats(r, t_hit, rows):
    blk = rows * 128
    nb = n // blk
    bx = jnp.asarray(box)
    inv_x = 1.0 / jnp.where(r.d.x == 0.0, 1e-30, r.d.x)
    inv_y = 1.0 / jnp.where(r.d.y == 0.0, 1e-30, r.d.y)
    inv_z = 1.0 / jnp.where(r.d.z == 0.0, 1e-30, r.d.z)
    exit_t = scene_box_exit(bx, (r.o.x, r.o.y, r.o.z),
                            (r.d.x, r.d.y, r.d.z))
    live = r.maxt > 0
    cap_pos = jnp.where(live, jnp.minimum(r.maxt, exit_t), -_BIG)
    cap_idl = jnp.minimum(cap_pos, t_hit)
    C = 16

    def body(c, acc):
        pos_acc, idl_acc = acc
        b = jax.lax.dynamic_slice(bx, (c * C, 0), (C, 6))

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
            return t_lo <= t_hi
        ent_pos = slab(cap_pos).reshape(nb, blk, C).any(axis=1)
        ent_idl = slab(cap_idl).reshape(nb, blk, C).any(axis=1)
        return (pos_acc + ent_pos.sum(axis=1).astype(jnp.int32),
                idl_acc + ent_idl.sum(axis=1).astype(jnp.int32))

    nc = n_units // C
    return jax.lax.fori_loop(0, nc, body,
                             (jnp.zeros((nb,), jnp.int32),
                              jnp.zeros((nb,), jnp.int32)))


KEYS = {
    "cur o21+d6lo": key_current,
    "hi3 d3+3 lo4": lambda r: key_dirhi(r, 3, 3, 4),
    "hi4 d2+2 lo3": lambda r: key_dirhi(r, 4, 2, 3),
    "hi2 d4+4 lo5": lambda r: key_dirhi(r, 2, 4, 5),
    "hi5 d3+3 lo2": lambda r: key_dirhi(r, 5, 3, 2),
}

t_hit0, _ = v4.intersect_v4(sa, bray)
for name, kf in KEYS.items():
    rs = jax.block_until_ready(sort_by(bray, kf(bray)))
    th, _ = v4.intersect_v4(sa, rs)
    th = jnp.where(jnp.isfinite(th), th, _BIG)
    for rows in (8, 32):
        pos, idl = jax.jit(block_stats, static_argnums=2)(rs, th, rows)
        pos, idl = np.asarray(pos), np.asarray(idl)
        print(f"bounce [{name}] r{rows}: exact-possible mean "
              f"{pos.mean():.0f} p50 {np.median(pos):.0f} p90 "
              f"{np.percentile(pos, 90):.0f} | exact-ideal mean "
              f"{idl.mean():.0f} p90 {np.percentile(idl, 90):.0f}",
              flush=True)
print("done", flush=True)
