"""Repeat-loop kernel lab: times each variant as `lax.fori_loop` of R
repetitions INSIDE one jitted call, so tunnel dispatch jitter amortizes
over R real kernel executions (single dispatch, single device sync).

A tiny data dependency (maxt += 0 * prev_t) chains iterations so XLA
cannot CSE the repeats away.
"""
import sys, time

import numpy as np
import jax, jax.numpy as jnp
from jax import lax

sys.path.insert(0, '/root/repo')
import mitsuba3dopplertof_tpu as mi
from mitsuba3dopplertof_tpu.core import transform as tf
from mitsuba3dopplertof_tpu.core.transform import AnimatedTransform
from mitsuba3dopplertof_tpu.core.vec import Vec3
from mitsuba3dopplertof_tpu.render.types import Ray
from mitsuba3dopplertof_tpu.ops.ray_binning import bin_key
from mitsuba3dopplertof_tpu.ops import intersect_v2 as v2
from mitsuba3dopplertof_tpu.ops import intersect_v4 as v4
sys.path.insert(0, '/root/repo/scripts')
from bench_suite import animated_mesh_scene
from mitsuba3dopplertof_tpu.sensors import sample_ray as sensor_sample_ray

_BIG = np.float32(3.0e38)
R = int(sys.argv[1]) if len(sys.argv) > 1 else 8
NTRI_SIDE = int(sys.argv[2]) if len(sys.argv) > 2 else 144

ntri, scene = animated_mesh_scene(mi, tf, AnimatedTransform, NTRI_SIDE, 140, 16)
sa = scene.compile()
print(f"scene: {ntri} tris, reps={R}", flush=True)
n = 1 << 20
k1, k2 = jax.random.split(jax.random.PRNGKey(0))
su = jax.random.uniform(k1, (2, n))
params = scene.sensor.device_params()
tw = jnp.full((n,), 0.00075, jnp.float32)
ray, _ = sensor_sample_ray(params, tw, su[0], su[1],
                           jnp.full((n,), 0.5), jnp.full((n,), 0.5))
ray = ray._replace(maxt=jnp.full((n,), _BIG, jnp.float32))
aabb = sa.chunk_aabb
lo = jnp.min(aabb[:, :3], axis=0)
hi = jnp.max(aabb[:, 3:], axis=0)


def sort_rays(r):
    key = bin_key(r, lo, hi)
    perm = jnp.argsort(key, stable=True)
    t = lambda x: jnp.take(x, perm, axis=0)
    return Ray(Vec3(t(r.o.x), t(r.o.y), t(r.o.z)),
               Vec3(t(r.d.x), t(r.d.y), t(r.d.z)), t(r.time), t(r.maxt))


rs = jax.block_until_ready(jax.jit(sort_rays)(ray))


def repeat(kern):
    def body(i, carry):
        acc, eps = carry
        r = rs._replace(maxt=rs.maxt + eps)
        t, prim = kern(r)[:2]
        return acc + jnp.sum(jnp.where(jnp.isfinite(t), t, 0.0)), eps * 0.0 \
            + 0.0 * acc * 1e-30
    def run():
        acc, _ = lax.fori_loop(0, R, body, (jnp.float32(0.0),
                                            jnp.float32(0.0)))
        return acc
    return jax.jit(run)


def timed(fn):
    jax.block_until_ready(fn())           # compile
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        jax.block_until_ready(fn())
        ts.append((time.perf_counter() - t0) / R * 1000)
    return min(ts), np.median(ts)


variants = {}
for rows in (8, 16, 32):
    variants[f"v4 r{rows}"] = lambda r, rows=rows: v4.intersect_v4(
        sa, r, rows_per_block=rows, profile="")
    variants[f"v4 r{rows} noop"] = lambda r, rows=rows: v4.intersect_v4(
        sa, r, rows_per_block=rows, profile="noop")
for rows in (8, 32, 64):
    variants[f"v2 r{rows}"] = lambda r, rows=rows: v2.intersect_v2(
        sa, r, rows_per_block=rows, profile="")
    variants[f"v2 r{rows} noop"] = lambda r, rows=rows: v2.intersect_v2(
        sa, r, rows_per_block=rows, profile="noop")
variants["v2 r8 nodma"] = lambda r: v2.intersect_v2(
    sa, r, rows_per_block=8, profile="nodma")
variants["v2 r8 noterm"] = lambda r: v2.intersect_v2(
    sa, r, rows_per_block=8, profile="noterm")

for name in list(variants):
    try:
        mn, md = timed(repeat(variants[name]))
        print(f"{name}: min {mn:.1f} ms  med {md:.1f} ms  "
              f"({1000.0 / mn * (n / 1e6):.1f} Mray/s)", flush=True)
    except Exception as e:
        print(f"{name}: ERROR {type(e).__name__}: {e}", flush=True)
print("done", flush=True)
