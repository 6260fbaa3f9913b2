"""A/B the first-super-chunk binning key vs the legacy origin-Morton key.

Paired-ratio methodology: the chip's effective throughput drifts by tens
of percent over minutes (shared tunnel), so A and B are timed in strict
alternation and the reported number is the MEDIAN OF PER-PAIR RATIOS —
drift cancels within each pair. Each timing is a lax.fori_loop of R
repeats inside one jit (dispatch latency amortized)."""
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
from mitsuba3dopplertof_tpu.ops.ray_binning import bin_key, super_boxes
from mitsuba3dopplertof_tpu.ops import intersect_v4 as v4
sys.path.insert(0, '/root/repo/scripts')
from bench_suite import animated_mesh_scene
from mitsuba3dopplertof_tpu.sensors import sample_ray as sensor_sample_ray

_BIG = np.float32(3.0e38)
R = int(sys.argv[1]) if len(sys.argv) > 1 else 8
NU = int(sys.argv[2]) if len(sys.argv) > 2 else 144
PAIRS = int(sys.argv[3]) if len(sys.argv) > 3 else 5

ntri, scene = animated_mesh_scene(mi, tf, AnimatedTransform, NU, 140, 16)
sa = scene.compile()
print(f"scene: {ntri} tris, reps={R}, pairs={PAIRS}", flush=True)
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
bray = Ray(po, wd, si.time, bmaxt)

aabb = sa.chunk_aabb
lo = jnp.min(aabb[:, :3], axis=0)
hi = jnp.max(aabb[:, 3:], axis=0)
sup = super_boxes(aabb)


def sort_rays(r, use_super):
    key = bin_key(r, lo, hi, super_aabb=(sup if use_super else None))
    perm = jnp.argsort(key, stable=True)
    t = lambda x: jnp.take(x, perm, axis=0)
    return Ray(Vec3(t(r.o.x), t(r.o.y), t(r.o.z)),
               Vec3(t(r.d.x), t(r.d.y), t(r.d.z)), t(r.time), t(r.maxt))


def repeat(kern, rs):
    def body(i, carry):
        acc, eps = carry
        rr = rs._replace(maxt=rs.maxt + eps)
        t, prim = kern(rr)[:2]
        return acc + jnp.sum(jnp.where(jnp.isfinite(t), t, 0.0)), \
            eps * 0.0 + 0.0 * acc * 1e-30
    return jax.jit(lambda: lax.fori_loop(
        0, R, body, (jnp.float32(0.0), jnp.float32(0.0)))[0])


def one(fn):
    t0 = time.perf_counter()
    jax.block_until_ready(fn())
    return (time.perf_counter() - t0) / R * 1000


for label, rr in (("camera", ray), ("bounce", bray)):
    for rows in (32,):
        kern = lambda r, rows=rows: v4.intersect_v4(
            sa, r, rows_per_block=rows, profile="")
        fa = repeat(kern, jax.block_until_ready(
            jax.jit(lambda r: sort_rays(r, False))(rr)))
        fb = repeat(kern, jax.block_until_ready(
            jax.jit(lambda r: sort_rays(r, True))(rr)))
        one(fa), one(fb)                      # compile both
        tas, tbs, ratios = [], [], []
        for _ in range(PAIRS):
            ta, tb = one(fa), one(fb)
            tas.append(ta)
            tbs.append(tb)
            ratios.append(tb / ta)
        print(f"{label} r{rows}: morton med {np.median(tas):.1f} ms, "
              f"super med {np.median(tbs):.1f} ms, "
              f"super/morton ratio med {np.median(ratios):.3f} "
              f"(min {min(ratios):.3f} max {max(ratios):.3f})", flush=True)
print("done", flush=True)
