"""Decompose v2 kernel time on the 40k animated scene: for camera and
bounce ray populations (production binning order), time intersect_v2 under
profile = "" (full), "noop" (traversal + DMA, no Moller), "nodma"
(traversal + Moller from a stale buffer — NOT correct results, timing
only), and report mean visited chunks via profile="count".

Usage: python scripts/v2_decompose.py [--rows 8,32,128]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

import mitsuba3dopplertof_tpu as mi
from mitsuba3dopplertof_tpu.core import transform as tf
from mitsuba3dopplertof_tpu.core.transform import AnimatedTransform
from mitsuba3dopplertof_tpu.core.vec import Vec3, normalize, cross
from mitsuba3dopplertof_tpu.render.types import Ray
from mitsuba3dopplertof_tpu.render.scene import ray_intersect
from mitsuba3dopplertof_tpu.ops.ray_binning import bin_key
from mitsuba3dopplertof_tpu.ops import intersect_v2 as v2mod
from mitsuba3dopplertof_tpu.sensors import sample_ray as sensor_sample_ray

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from bench_suite import animated_mesh_scene  # noqa: E402

_BIG = np.float32(3.0e38)


def timed(fn, *a):
    out = fn(*a)
    jax.block_until_ready(out)
    ts = []
    for _ in range(5):
        t0 = time.perf_counter()
        out = fn(*a)
        jax.block_until_ready(out)
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts)), out


def main():
    rows_list = [8, 32, 128]
    argv = sys.argv[1:]
    i = 0
    while i < len(argv):
        a = argv[i]
        if a.startswith("--rows="):
            rows_list = [int(x) for x in a.split("=", 1)[1].split(",")]
        elif a == "--rows" and i + 1 < len(argv):
            i += 1
            rows_list = [int(x) for x in argv[i].split(",")]
        else:
            sys.exit(f"unrecognized argument: {a!r} "
                     "(usage: --rows 8,32,128 or --rows=8,32,128)")
        i += 1

    ntri, scene = animated_mesh_scene(mi, tf, AnimatedTransform, 144, 140, 16)
    sa = scene.compile()
    print(f"anim40k: {ntri} tris", flush=True)

    n = 1 << 20
    k = jax.random.PRNGKey(0)
    k1, k2 = jax.random.split(k)
    su = jax.random.uniform(k1, (2, n))
    params = scene.sensor.device_params()
    time_w = jnp.full((n,), 0.00075, jnp.float32)
    ray, _ = sensor_sample_ray(params, time_w, su[0], su[1],
                               jnp.full((n,), 0.5), jnp.full((n,), 0.5))
    ray = ray._replace(maxt=jnp.full((n,), _BIG, jnp.float32))
    si = ray_intersect(sa, ray)

    # bounce population, production-binned order
    p = Vec3(si.p.x, si.p.y, si.p.z)
    nrm = Vec3(si.sh_n.x, si.sh_n.y, si.sh_n.z)
    u = jax.random.uniform(k2, (2, n))
    r = jnp.sqrt(u[0])
    phi = 2 * np.pi * u[1]
    lx, ly = r * jnp.cos(phi), r * jnp.sin(phi)
    lz = jnp.sqrt(jnp.maximum(0.0, 1.0 - u[0]))
    tang = normalize(cross(nrm, Vec3(
        jnp.where(jnp.abs(nrm.x) < 0.9, 1.0, 0.0),
        jnp.where(jnp.abs(nrm.x) < 0.9, 0.0, 1.0), jnp.zeros(n))))
    bit = cross(nrm, tang)
    wd = Vec3(tang.x * lx + bit.x * ly + nrm.x * lz,
              tang.y * lx + bit.y * ly + nrm.y * lz,
              tang.z * lx + bit.z * ly + nrm.z * lz)
    po = Vec3(p.x + nrm.x * 1e-4, p.y + nrm.y * 1e-4, p.z + nrm.z * 1e-4)
    bmaxt = jnp.where(si.valid, _BIG, -1.0)  # dead lanes where camera missed
    bray = Ray(po, wd, si.time, bmaxt)

    aabb = sa.chunk_aabb
    lo = jnp.min(aabb[:, :3], axis=0)
    hi = jnp.max(aabb[:, 3:], axis=0)

    for label, rr in (("camera", ray), ("bounce", bray)):
        key = jnp.asarray(np.asarray(bin_key(rr, lo, hi)))
        perm = jnp.argsort(key, stable=True)

        def take(x, perm=perm):
            return jnp.take(x, perm, axis=0)

        rs = Ray(Vec3(take(rr.o.x), take(rr.o.y), take(rr.o.z)),
                 Vec3(take(rr.d.x), take(rr.d.y), take(rr.d.z)),
                 take(rr.time), take(rr.maxt))
        for rows in rows_list:
            res = {"label": label, "rows": rows}
            for prof in ("", "noop", "nodma", "count"):
                def run(rs=rs, rows=rows, prof=prof):
                    return v2mod.intersect_v2(sa, rs, rows_per_block=rows,
                                              profile=prof)

                dt, out = timed(run)
                name = prof or "full"
                res[name] = round(dt * 1000, 1)
                if prof == "count":
                    res["visits"] = round(float(jnp.mean(out[0])), 1)
            print(res, flush=True)


if __name__ == "__main__":
    main()
