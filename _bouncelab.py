"""Round-5 bounce lab: time v4 variants on STRIP-MODE ray populations
(4096 pixels x 256 spp — what production blocks now look like) for the
40k bench scene: camera rays, first-bounce diffuse rays, NEE shadow rays.

Usage: python _bouncelab.py [variant...]   (default: a curated set)
"""
import sys, time

import numpy as np
import jax, jax.numpy as jnp
from jax import lax

sys.path.insert(0, '/root/repo')
import mitsuba3dopplertof_tpu as mi
from mitsuba3dopplertof_tpu.core import transform as tf
from mitsuba3dopplertof_tpu.core.transform import AnimatedTransform
from mitsuba3dopplertof_tpu.core.vec import Vec3, normalize, cross
from mitsuba3dopplertof_tpu.render.types import Ray
from mitsuba3dopplertof_tpu.render.scene import ray_intersect
from mitsuba3dopplertof_tpu.ops.ray_binning import bin_key
from mitsuba3dopplertof_tpu.ops import intersect_v4 as v4
sys.path.insert(0, '/root/repo/scripts')
from bench_suite import animated_mesh_scene
from mitsuba3dopplertof_tpu.sensors import sample_ray as sensor_sample_ray

_BIG = np.float32(3.0e38)
R = 8
SPP = 256
NPIX = (1 << 20) // SPP          # 4096 pixels -> 16 rows of 256

ntri, scene = animated_mesh_scene(mi, tf, AnimatedTransform, 144, 140, 16)
sa = scene.compile()
n = NPIX * SPP
print(f"scene {ntri} tris; {NPIX} px x {SPP} spp", flush=True)

# strip-style camera rays: pixel = lane // SPP over rows [120, 136) of a
# 256x256 frame (center band crossing the sphere), jittered subpixels
key = jax.random.PRNGKey(0)
k1, k2, k3 = jax.random.split(key, 3)
lane = jnp.arange(n, dtype=jnp.uint32)
pix = lane // SPP + jnp.uint32(120 * 256)
py = (pix // 256).astype(jnp.float32)
px = (pix % 256).astype(jnp.float32)
off = jax.random.uniform(k1, (2, n))
params = scene.sensor.device_params()
tw = jax.random.uniform(k3, (n,)) * 0.0015
ray, _ = sensor_sample_ray(params, tw,
                           (px + off[0]) / 256.0, (py + off[1]) / 256.0,
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

aabb = sa.chunk_aabb
lo = jnp.min(aabb[:, :3], axis=0)
hi = jnp.max(aabb[:, 3:], axis=0)


def sort_rays(r):
    k = bin_key(r, lo, hi)
    perm = jnp.argsort(k, stable=True)
    t = lambda x: jnp.take(x, perm, axis=0)
    return Ray(Vec3(t(r.o.x), t(r.o.y), t(r.o.z)),
               Vec3(t(r.d.x), t(r.d.y), t(r.d.z)), t(r.time), t(r.maxt))


def repeat(kern, rs):
    def body(i, carry):
        acc, eps = carry
        r = rs._replace(maxt=rs.maxt + eps)
        out = kern(r)
        t = out[0]
        return (acc + jnp.sum(jnp.where(jnp.isfinite(t), t, 0.0)),
                eps * 0.0 + 0.0 * acc * 1e-30)
    def run():
        acc, _ = lax.fori_loop(0, R, body,
                               (jnp.float32(0.0), jnp.float32(0.0)))
        return acc
    return jax.jit(run)


def timed(fn):
    jax.block_until_ready(fn())
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        jax.block_until_ready(fn())
        ts.append((time.perf_counter() - t0) / R * 1000)
    return min(ts)


POPS = {"camera": (ray, False), "bounce": (bray, False),
        "shadow": (sray, True)}

VARIANTS = {
    "r32": lambda r, ah: v4.intersect_v4(sa, r, any_hit=ah,
                                         rows_per_block=32),
    "r16": lambda r, ah: v4.intersect_v4(sa, r, any_hit=ah,
                                         rows_per_block=16),
    "r8": lambda r, ah: v4.intersect_v4(sa, r, any_hit=ah,
                                        rows_per_block=8),
    "r32noop": lambda r, ah: v4.intersect_v4(sa, r, any_hit=ah,
                                             rows_per_block=32,
                                             profile="noop"),
    "r8noop": lambda r, ah: v4.intersect_v4(sa, r, any_hit=ah,
                                            rows_per_block=8,
                                            profile="noop"),
    "lite-c8": lambda r, ah: v4.intersect_v4_2lite(sa, r, any_hit=ah,
                                                   rows_per_block=32,
                                                   cap=8),
    "lite-c16": lambda r, ah: v4.intersect_v4_2lite(sa, r, any_hit=ah,
                                                    rows_per_block=32,
                                                    cap=16),
    "lite-c4": lambda r, ah: v4.intersect_v4_2lite(sa, r, any_hit=ah,
                                                   rows_per_block=32,
                                                   cap=4),
}

want = sys.argv[1:] or ["r32", "r16", "r8", "r32noop", "r8noop"]
for pname, (rr, ah) in POPS.items():
    rs = jax.block_until_ready(jax.jit(sort_rays)(rr))
    for vname in want:
        try:
            mn = timed(repeat(lambda r, v=VARIANTS[vname], ah=ah: v(r, ah),
                              rs))
            print(f"{pname} {vname}: {mn:.1f} ms "
                  f"({1000.0 / mn * (n / 1e6):.1f} Mray/s)", flush=True)
        except Exception as e:
            print(f"{pname} {vname}: ERROR {type(e).__name__}: {e}",
                  flush=True)
print("done", flush=True)
