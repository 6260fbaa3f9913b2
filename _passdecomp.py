"""Round-5 pass decomposition: time each stage of a production 40k-scene
doppler pass separately (jitted, fori-repeated) to find the non-kernel
overhead. Stages: bin-sort pair, v4 kernel, payload_from_prim, full
ray_intersect, ray_test, bsdf eval_pdf_sample, NEE emitter sample,
film splat."""
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
from mitsuba3dopplertof_tpu.render import scene as scn
from mitsuba3dopplertof_tpu.ops.ray_binning import binned, bin_key
from mitsuba3dopplertof_tpu.ops import intersect_v4 as v4
from mitsuba3dopplertof_tpu.ops.intersect_mxu import payload_from_prim
sys.path.insert(0, '/root/repo/scripts')
from bench_suite import animated_mesh_scene
from mitsuba3dopplertof_tpu.sensors import sample_ray as sensor_sample_ray

_BIG = np.float32(3.0e38)
R = 8
SPP = 256
NPIX = (1 << 20) // SPP

ntri, scene = animated_mesh_scene(mi, tf, AnimatedTransform, 144, 140, 16)
sa = scene.compile()
n = NPIX * SPP
print(f"scene {ntri} tris; n={n}", flush=True)

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

si0 = scn.ray_intersect(sa, ray, None)
t0_, prim0 = v4.intersect_v4_2r(sa, ray, None)
prim0 = jax.block_until_ready(prim0)
active0 = si0.valid


def rep(fn, *args):
    def body(i, carry):
        acc = carry
        out = fn(i, *args)
        return acc + out
    def run():
        return lax.fori_loop(0, R, body, jnp.float32(0.0))
    return jax.jit(run)


def timed(name, fn):
    try:
        jax.block_until_ready(fn())
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            jax.block_until_ready(fn())
            ts.append((time.perf_counter() - t0) / R * 1000)
        print(f"{name}: {min(ts):.1f} ms", flush=True)
    except Exception as e:
        print(f"{name}: ERROR {type(e).__name__}: {e}", flush=True)


def chk(x):
    return jnp.sum(jnp.where(jnp.isfinite(x), x, 0.0))


# 1. the binned sort pair (key + 9-op sort + 4-op restore), no kernel
def sort_pair(i):
    r = ray._replace(maxt=ray.maxt + 0.0 * i)
    outs = binned(sa, r, None, lambda rs: [rs.o.x * 0.5, rs.maxt,
                                           rs.d.x.astype(jnp.int32)])
    return chk(outs[0]) * 1e-30


timed("bin-sort pair (no kernel)", rep(sort_pair))


# 2. full production closest-hit (sorts + 2-round kernel + payload)
def full_ri(i):
    r = ray._replace(maxt=ray.maxt + 0.0 * i)
    si = scn.ray_intersect(sa, r, None)
    return chk(si.t) * 1e-30


timed("full ray_intersect (prod)", rep(full_ri))


# 3. payload_from_prim alone (1M row-gather of (ntris,26) + math)
def payload(i):
    pr = prim0 + jnp.int32(0) * i
    hit = payload_from_prim(sa, ray, t0_, pr)
    return chk(hit.t) * 1e-30


timed("payload_from_prim", rep(payload))


# 4. production any-hit
def full_rt(i):
    r = ray._replace(maxt=ray.maxt * (1.0 + 0.0 * i))
    occ = scn.ray_test(sa, r, None)
    return jnp.sum(occ.astype(jnp.float32)) * 1e-30


timed("full ray_test (prod)", rep(full_rt))


# 5. BSDF fused eval/pdf/sample at the hits
from mitsuba3dopplertof_tpu.bsdfs import eval_pdf_sample
from mitsuba3dopplertof_tpu.core.rng import pcg32_seed_wavefront, \
    pcg32_next_f32


lane_bsdf0 = scn.gather_small(sa.inst_bsdf, jnp.maximum(si0.inst, 0))


def bsdf(i):
    st = pcg32_seed_wavefront(jnp.uint32(7) + i.astype(jnp.uint32), lane, 0)
    u1, st = pcg32_next_f32(st, None)
    u2, st = pcg32_next_f32(st, None)
    u3, st = pcg32_next_f32(st, None)
    wo = Vec3(si0.wi.x, si0.wi.y, si0.wi.z)
    bs = eval_pdf_sample(sa, lane_bsdf0, si0.wi, wo, u1, u2, u3)
    return chk(bs.val_nee.x)


timed("bsdf eval_pdf_sample", rep(bsdf))

# 6. NEE emitter sample (point light) + shadow dir build
from mitsuba3dopplertof_tpu import emitters as em


def nee(i):
    st = pcg32_seed_wavefront(jnp.uint32(9) + i.astype(jnp.uint32), lane, 0)
    u1, st = pcg32_next_f32(st, None)
    u2, st = pcg32_next_f32(st, None)
    ds, spec = em.sample_direction(sa, Vec3(si0.p.x, si0.p.y, si0.p.z),
                                   ray.time, u1, u2)
    return chk(spec.x)


timed("NEE emitter sample", rep(nee))

# 7. film strip splat (gaussian rfilter, 5 channels)
from mitsuba3dopplertof_tpu.films import block_create, \
    block_splat_wavefront
from mitsuba3dopplertof_tpu.rfilters import GaussianFilter
from mitsuba3dopplertof_tpu.core.properties import Properties

rf = GaussianFilter(Properties("gaussian"))
blk0 = block_create(256, 260, 5)


def splat(i):
    vals = [ray.d.x + i, ray.d.y, ray.d.z, ray.o.x * 0 + 1.0,
            jnp.ones((n,), jnp.float32)]
    b = block_splat_wavefront(blk0, rf, px + off[0], py + off[1], vals,
                              active0, 256, 256, SPP, pad_rows=2,
                              row0=jnp.int32(120), strip_rows=16)
    return chk(b[0, 0])


timed("film strip splat (gauss)", rep(splat))
print("done", flush=True)
