"""Jitted kernel A/B lab (verify-skill rule: eager numbers lie 3-10x).
Times jax.jit-wrapped intersect_v{2,4} on production-sorted camera and
bounce rays of the 40k animated bench scene."""
import os, sys, time
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
from mitsuba3dopplertof_tpu.ops import intersect_v2 as v2
from mitsuba3dopplertof_tpu.ops import intersect_v4 as v4
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
ray, _ = sensor_sample_ray(params, tw, su[0], su[1], jnp.full((n,),0.5), jnp.full((n,),0.5))
ray = ray._replace(maxt=jnp.full((n,), _BIG, jnp.float32))
aabb = sa.chunk_aabb
lo = jnp.min(aabb[:, :3], axis=0); hi = jnp.max(aabb[:, 3:], axis=0)

def sort_rays(r):
    key = bin_key(r, lo, hi)
    perm = jnp.argsort(key, stable=True)
    t = lambda x: jnp.take(x, perm, axis=0)
    return Ray(Vec3(t(r.o.x), t(r.o.y), t(r.o.z)),
               Vec3(t(r.d.x), t(r.d.y), t(r.d.z)), t(r.time), t(r.maxt))

rs = jax.block_until_ready(jax.jit(sort_rays)(ray))

def timed(f, *a):
    out = jax.block_until_ready(f(*a))
    ts = []
    for _ in range(5):
        t0 = time.perf_counter(); jax.block_until_ready(f(*a))
        ts.append(time.perf_counter() - t0)
    return np.median(ts) * 1000, out

variants = {}
for rows in (8, 16, 32):
    variants[f"v4 r{rows}"] = jax.jit(
        lambda r, rows=rows: v4.intersect_v4(sa, r, rows_per_block=rows))
    variants[f"v4 r{rows} noop"] = jax.jit(
        lambda r, rows=rows: v4.intersect_v4(sa, r, rows_per_block=rows,
                                             profile="noop"))
variants["v2 r8"] = jax.jit(lambda r: v2.intersect_v2(sa, r, rows_per_block=8))
variants["v2 r128"] = jax.jit(lambda r: v2.intersect_v2(sa, r, rows_per_block=128))
variants["v4 r8 count"] = jax.jit(
    lambda r: v4.intersect_v4(sa, r, rows_per_block=8, profile="count"))

for name, fn in variants.items():
    ms, out = timed(fn, rs)
    extra = ""
    if "count" in name:
        extra = f" groups={float(jnp.mean(out[0])):.1f}"
    print(f"{name}: {ms:.1f} ms{extra}", flush=True)
print("done")
