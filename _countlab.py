"""Quantify v4 culling waste on the 40k bench scene: per-block visited
group counts (profile="count") vs the per-lane ideal (units whose
conservative per-lane entry distance beats the lane's own closest hit).

The ratio block_visited / lane_ideal is the coherence waste the block-
granularity visit lists pay; its size decides whether the next lever is
better culling (big ratio) or cheaper per-unit compute (ratio ~ 1).
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
from mitsuba3dopplertof_tpu.ops.ray_binning import bin_key
from mitsuba3dopplertof_tpu.ops import intersect_v4 as v4
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

# bounce population: cosine-hemisphere continuations off the first hits
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

# shadow population: from first hits toward the point light (any-hit)
lp = jnp.array([0.0, 4.0, -4.0], jnp.float32)
sd = Vec3(lp[0] - po.x, lp[1] - po.y, lp[2] - po.z)
dist = jnp.sqrt(sd.x * sd.x + sd.y * sd.y + sd.z * sd.z)
sdn = Vec3(sd.x / dist, sd.y / dist, sd.z / dist)
smaxt = jnp.where(si.valid, dist * (1.0 - 1e-3), jnp.float32(-1.0))
sray = Ray(po, sdn, ray.time, smaxt)

aabb = sa.chunk_aabb
lo = jnp.min(aabb[:, :3], axis=0)
hi = jnp.max(aabb[:, 3:], axis=0)


def sorted_rays(r):
    key = bin_key(r, lo, hi)
    perm = jnp.argsort(key, stable=True)
    t = lambda x: jnp.take(x, perm, axis=0)
    return Ray(Vec3(t(r.o.x), t(r.o.y), t(r.o.z)),
               Vec3(t(r.d.x), t(r.d.y), t(r.d.z)), t(r.time), t(r.maxt))


segments, meta32 = _chunked_layout(sa.n_static_tris, sa.anim_ranges)
n_units = meta32.shape[0]
box = np.asarray(sa.chunk_aabb)
print(f"scene {ntri} tris -> {n_units} units of 32", flush=True)


@jax.jit
def lane_ideal(r, t_hit):
    """Per-lane count of units whose per-lane conservative entry beats the
    lane's own termination value (closest hit t, or maxt for any-hit)."""
    bx = jnp.asarray(box)
    inv_x = 1.0 / jnp.where(r.d.x == 0.0, 1e-30, r.d.x)
    inv_y = 1.0 / jnp.where(r.d.y == 0.0, 1e-30, r.d.y)
    inv_z = 1.0 / jnp.where(r.d.z == 0.0, 1e-30, r.d.z)

    def body(s, acc):
        b = bx[s]
        t0x = (b[0] - r.o.x) * inv_x
        t1x = (b[3] - r.o.x) * inv_x
        t0y = (b[1] - r.o.y) * inv_y
        t1y = (b[4] - r.o.y) * inv_y
        t0z = (b[2] - r.o.z) * inv_z
        t1z = (b[5] - r.o.z) * inv_z
        t_lo = jnp.maximum(jnp.maximum(jnp.minimum(t0x, t1x),
                                       jnp.minimum(t0y, t1y)),
                           jnp.maximum(jnp.minimum(t0z, t1z), 0.0))
        t_hi = jnp.minimum(jnp.minimum(jnp.maximum(t0x, t1x),
                                       jnp.maximum(t0y, t1y)),
                           jnp.minimum(jnp.maximum(t0z, t1z),
                                       jnp.minimum(r.maxt, t_hit)))
        return acc + ((t_lo <= t_hi) & (r.maxt > 0)).astype(jnp.int32)

    return jax.lax.fori_loop(0, n_units, body,
                             jnp.zeros_like(r.o.x, jnp.int32))


for label, rr, anyh in (("camera", ray, False), ("bounce", bray, False),
                        ("shadow", sray, True)):
    rs = jax.block_until_ready(sorted_rays(rr))
    t_hit, prim = v4.intersect_v4(sa, rs, any_hit=anyh)
    if anyh:
        term = jnp.where(prim >= 0, jnp.float32(0.0), rs.maxt)
    else:
        term = jnp.minimum(t_hit, rs.maxt)
    ideal = np.asarray(lane_ideal(rs, term))
    live = np.asarray(rs.maxt) > 0
    for rows in (8, 16, 32):
        cnt, _ = v4.intersect_v4(sa, rs, any_hit=anyh, rows_per_block=rows,
                                 profile="count")
        per_block = np.asarray(cnt).reshape(-1)[::rows * 128]
        visited_units = per_block.astype(np.float64) * v4.GROUP
        blk_lanes = rows * 128
        nlive_blocks = (live.reshape(-1, blk_lanes).any(axis=1)).sum()
        tot = visited_units.sum()
        print(f"{label} r{rows}: blocks={per_block.size} "
              f"(live {nlive_blocks}) visited_units/block "
              f"mean {visited_units.mean():.1f} p50 "
              f"{np.median(visited_units):.0f} p90 "
              f"{np.percentile(visited_units, 90):.0f} max "
              f"{visited_units.max():.0f} | total unit-visits "
              f"{tot:.3g}", flush=True)
    print(f"{label} lane-ideal: mean {ideal[live].mean():.2f} "
          f"p90 {np.percentile(ideal[live], 90):.0f} "
          f"max {ideal[live].max()} (live lanes {live.sum()})", flush=True)
print("done", flush=True)
