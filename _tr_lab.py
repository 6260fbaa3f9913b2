"""A/B the two-round bound-tightening traversal vs single-round v4 on the
40k animated bench scene: camera / bounce / shadow populations, 1M lanes.
Also sweeps cap and rows2. Timings are jitted end-to-end including the
extra sorts (the fair comparison is vs binned single-round, so both
sides include their binning sorts)."""
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
from mitsuba3dopplertof_tpu.ops.ray_binning import binned
from mitsuba3dopplertof_tpu.ops import intersect_v4 as v4
sys.path.insert(0, '/root/repo/scripts')
from bench_suite import animated_mesh_scene
from mitsuba3dopplertof_tpu.sensors import sample_ray as sensor_sample_ray

_BIG = np.float32(3.0e38)
NU = int(sys.argv[1]) if len(sys.argv) > 1 else 144
NV = int(sys.argv[2]) if len(sys.argv) > 2 else 140
R = int(sys.argv[3]) if len(sys.argv) > 3 else 5

ntri, scene = animated_mesh_scene(mi, tf, AnimatedTransform, NU, NV, 16)
sa = scene.compile()
print(f"scene {ntri} tris", flush=True)
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

lp = jnp.array([0.0, 4.0, -4.0], jnp.float32)
sd = Vec3(lp[0] - po.x, lp[1] - po.y, lp[2] - po.z)
dist = jnp.sqrt(sd.x * sd.x + sd.y * sd.y + sd.z * sd.z)
sdn = Vec3(sd.x / dist, sd.y / dist, sd.z / dist)
smaxt = jnp.where(si.valid, dist * (1.0 - 1e-3), jnp.float32(-1.0))
sray = Ray(po, sdn, ray.time, smaxt)


def timed(name, fn, *args):
    f = jax.jit(fn)
    out = jax.block_until_ready(f(*args))
    ts = []
    for _ in range(R):
        t0 = time.perf_counter()
        jax.block_until_ready(f(*args))
        ts.append((time.perf_counter() - t0) * 1000)
    print(f"{name}: min {min(ts):.1f} med {np.median(ts):.1f} ms",
          flush=True)
    return out


def single(r, anyh):
    t, prim = binned(sa, r, None,
                     lambda rr: list(v4.intersect_v4(sa, rr,
                                                     any_hit=anyh)))
    return t, prim


for label, rr, anyh in (("camera", ray, False), ("bounce", bray, False),
                        ("shadow", sray, True)):
    t0, p0 = timed(f"{label} 1round", lambda r: single(r, anyh), rr)
    for cap in (8, 16, 32):
        for rows2 in (8, 16):
            t1, p1 = timed(f"{label} 2r cap{cap} rows2={rows2}",
                           lambda r, c=cap, w=rows2: v4.intersect_v4_2r(
                               sa, r, any_hit=anyh, cap=c, rows2=w), rr)
            a, b = np.asarray(p0), np.asarray(p1)
            mism = (a != b).mean()
            tm = (~np.isclose(np.asarray(t0), np.asarray(t1), rtol=1e-5,
                              atol=1e-6) & ~((a < 0) & (b < 0))).mean()
            if mism > 1e-3 or tm > 1e-3:
                print(f"  !! mismatch prim {mism:.5f} t {tm:.5f}",
                      flush=True)
print("done", flush=True)
