"""Hero-scene stage timings, inline style (each stage jitted, 4 calls,
min). Usage: _herorep.py [stage...] from {cam,bounce,shadow,nee,tex,env,
bsdf,null}."""
import os, sys, time
import numpy as np
import jax, jax.numpy as jnp

sys.path.insert(0, '/root/repo')
import mitsuba3dopplertof_tpu as mi
from mitsuba3dopplertof_tpu.core.vec import Vec3, normalize, cross, dot
from mitsuba3dopplertof_tpu.render.types import Ray
from mitsuba3dopplertof_tpu.render.scene import (ray_intersect, ray_test,
                                                 gather_small)
from mitsuba3dopplertof_tpu import emitters as em_mod
from mitsuba3dopplertof_tpu.bsdfs import (eval_pdf_sample as bsdf_eps,
                                          P_REFL_TEX)
from mitsuba3dopplertof_tpu.textures import eval_texture
from mitsuba3dopplertof_tpu.utils.hero_scene import hero_scene_dict
from mitsuba3dopplertof_tpu.sensors import sample_ray as sensor_sample_ray

_BIG = np.float32(3.0e38)
scene = mi.load_dict(hero_scene_dict(spp=16, res=256))
sa = scene.compile()
n = 1 << 20
k1, k2 = jax.random.split(jax.random.PRNGKey(0))
su = jax.random.uniform(k1, (2, n))
params = scene.sensor.device_params()
tw = jnp.full((n,), 0.5 * 0.0015, jnp.float32)
ray, _w = sensor_sample_ray(params, tw, su[0], su[1],
                            jnp.full((n,), 0.5), jnp.full((n,), 0.5))
ray = ray._replace(maxt=jnp.full((n,), _BIG, jnp.float32))

si = jax.jit(lambda r: ray_intersect(sa, r, None))(ray)
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
po = Vec3(si.p.x + nrm.x * 1e-4, si.p.y + nrm.y * 1e-4,
          si.p.z + nrm.z * 1e-4)
active = si.valid
bray = Ray(po, wd, ray.time, jnp.where(active, _BIG, jnp.float32(-1.0)))
si2 = jax.jit(lambda r: ray_intersect(sa, r, active))(bray)
act2 = active & si2.valid
lane_bsdf = gather_small(sa.inst_bsdf, jnp.maximum(si2.inst, 0))
jax.block_until_ready(si2.t)
print("setup done", flush=True)


def run(name, fn):
    f = jax.jit(fn)
    try:
        jax.block_until_ready(f(jnp.float32(0.0)))
        ts = []
        for k in range(4):
            e = jnp.float32(k) * 1e-12
            t0 = time.perf_counter()
            jax.block_until_ready(f(e))
            ts.append((time.perf_counter() - t0) * 1000)
        print(f"{name}: {min(ts):.1f} ms", flush=True)
    except Exception as ex:
        print(f"{name}: ERROR {type(ex).__name__}: {ex}", flush=True)


STAGES = {}
STAGES["cam"] = lambda e: ray_intersect(
    sa, ray._replace(maxt=ray.maxt + e), None).t.sum()
STAGES["bounce"] = lambda e: ray_intersect(
    sa, bray._replace(maxt=bray.maxt + e), active).t.sum()


def _shadow(e):
    ds, w = em_mod.sample_direction(sa, si2.p, bray.time, u[0], u[1])
    sr = si2.spawn_ray_to(ds.p)
    occ = ray_test(sa, sr._replace(maxt=sr.maxt + e),
                   act2 & (ds.pdf != 0.0))
    return occ.astype(jnp.float32).sum()


STAGES["shadow"] = _shadow
STAGES["nee"] = lambda e: em_mod.sample_direction(
    sa, si2.p, bray.time, u[0] + e, u[1])[0].pdf.sum()


def _tex(e):
    lane_tex = gather_small(sa.bsdf_params[P_REFL_TEX],
                            lane_bsdf).astype(jnp.int32)
    tr = eval_texture(sa, lane_tex, si2.uv_u + e, si2.uv_v,
                      p=si2.p, b_u=si2.b_u, b_v=si2.b_v, prim=si2.prim)
    return (tr.x + tr.y + tr.z).sum()


STAGES["tex"] = _tex
STAGES["env"] = lambda e: (em_mod.envmap_eval(
    sa, Vec3(wd.x, wd.y, wd.z + e)).x.sum()
    + em_mod.envmap_pdf_direction(sa, wd).sum())


def _bsdf(e):
    wo_nee = si2.to_local(wd)
    lane_tex = gather_small(sa.bsdf_params[P_REFL_TEX],
                            lane_bsdf).astype(jnp.int32)
    tex_mask = lane_tex >= 0
    tr = eval_texture(sa, lane_tex, si2.uv_u, si2.uv_v,
                      p=si2.p, b_u=si2.b_u, b_v=si2.b_v, prim=si2.prim)
    bs = bsdf_eps(sa, lane_bsdf, si2.wi, wo_nee, u[0] + e, u[0], u[1],
                  tr, tex_mask)
    return bs.pdf.sum() + bs.weight.x.sum() + bs.val_nee.x.sum()


STAGES["bsdf"] = _bsdf

want = sys.argv[1:] or list(STAGES)
for w in want:
    run(w, STAGES[w])
print("ok", flush=True)
