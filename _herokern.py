"""Attribute the hero scene's per-bounce budget directly: time jitted
ray_intersect / ray_test / NEE / texture / bsdf pieces on 1M-lane hero
populations (camera rays + cosine bounce rays off the first hits), each as
a fori-repeat inside one jit (tunnel dispatch amortized).
"""
import sys, time

import numpy as np
import jax, jax.numpy as jnp
from jax import lax

sys.path.insert(0, '/root/repo')
import mitsuba3dopplertof_tpu as mi
from mitsuba3dopplertof_tpu.core.vec import Vec3, normalize, cross
from mitsuba3dopplertof_tpu.render.types import Ray
from mitsuba3dopplertof_tpu.render.scene import (
    ray_intersect, ray_test, gather_small)
from mitsuba3dopplertof_tpu import emitters as em_mod
from mitsuba3dopplertof_tpu.bsdfs import eval_pdf_sample as bsdf_eps, P_REFL_TEX
from mitsuba3dopplertof_tpu.textures import eval_texture
from mitsuba3dopplertof_tpu.utils.hero_scene import hero_scene_dict
from mitsuba3dopplertof_tpu.sensors import sample_ray as sensor_sample_ray

_BIG = np.float32(3.0e38)
R = int(sys.argv[1]) if len(sys.argv) > 1 else 4

scene = mi.load_dict(hero_scene_dict(spp=16, res=256))
sa = scene.compile()
print(f"hero: static {sa.n_static_tris} anim {sa.n_anim_tris} "
      f"spheres {sa.n_spheres} emitters {sa.n_emitters} "
      f"env {sa.env_kind}", flush=True)
n = 1 << 20
k1, k2 = jax.random.split(jax.random.PRNGKey(0))
su = jax.random.uniform(k1, (2, n))
params = scene.sensor.device_params()
tw = jnp.full((n,), 0.5 * 0.0015, jnp.float32)
ray, _ = sensor_sample_ray(params, tw, su[0], su[1],
                           jnp.full((n,), 0.5), jnp.full((n,), 0.5))
ray = ray._replace(maxt=jnp.full((n,), _BIG, jnp.float32))

si = jax.block_until_ready(jax.jit(
    lambda r: ray_intersect(sa, r, None))(ray))
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
bmaxt = jnp.where(si.valid, _BIG, jnp.float32(-1.0))
bray = Ray(po, wd, ray.time, bmaxt)
active = si.valid
# second-hit interaction for bounce-level NEE/bsdf pieces
si2 = jax.block_until_ready(jax.jit(
    lambda r: ray_intersect(sa, r, active))(bray))
act2 = active & si2.valid
lane_bsdf = gather_small(sa.inst_bsdf, jnp.maximum(si2.inst, 0))


def timed(name, fn):
    """Plain jitted timing: dispatch latency measured ~0.1 ms this session
    against pieces of 50 ms+, so no in-graph repeat needed (the fori-repeat
    wrapper trips a TPU InvalidArgument around the binned sort path)."""
    try:
        f = jax.jit(fn)
        jax.block_until_ready(f(jnp.float32(0.0)))
        ts = []
        for k in range(3 * R):
            t0 = time.perf_counter()
            jax.block_until_ready(f(jnp.float32(k) * 1e-12))
            ts.append((time.perf_counter() - t0) * 1000)
        print(f"{name}: min {min(ts):.1f} ms  med {np.median(ts):.1f} ms",
              flush=True)
    except Exception as e:
        import traceback
        print(f"{name}: ERROR {type(e).__name__}: {e}", flush=True)
        traceback.print_exc()


def isect_cam(eps):
    s = ray_intersect(sa, ray._replace(maxt=ray.maxt + eps), None)
    return jnp.sum(jnp.where(s.valid, s.t, 0.0))


def isect_bounce(eps):
    s = ray_intersect(sa, bray._replace(maxt=bray.maxt + eps), active)
    return jnp.sum(jnp.where(s.valid, s.t, 0.0))


def nee_sample(eps):
    ds, w = em_mod.sample_direction(sa, si2.p, bray.time,
                                    u[0] + eps * 0.0, u[1])
    return jnp.sum(jnp.where(act2, ds.pdf + eps, 0.0)) + jnp.sum(w.x)


def shadow(eps):
    ds, w = em_mod.sample_direction(sa, si2.p, bray.time, u[0], u[1])
    sr = si2.spawn_ray_to(ds.p)
    occ = ray_test(sa, sr._replace(maxt=sr.maxt + eps),
                   act2 & (ds.pdf != 0.0))
    return jnp.sum(occ.astype(jnp.float32))


def tex(eps):
    lane_tex = gather_small(sa.bsdf_params[P_REFL_TEX],
                            lane_bsdf).astype(jnp.int32)
    tr = eval_texture(sa, lane_tex, si2.uv_u + eps, si2.uv_v,
                      p=si2.p, b_u=si2.b_u, b_v=si2.b_v, prim=si2.prim)
    return jnp.sum(jnp.where(act2, tr.x + tr.y + tr.z, 0.0))


def bsdf(eps):
    wo_nee = si2.to_local(wd)
    lane_tex = gather_small(sa.bsdf_params[P_REFL_TEX],
                            lane_bsdf).astype(jnp.int32)
    tex_mask = lane_tex >= 0
    tr = eval_texture(sa, lane_tex, si2.uv_u, si2.uv_v,
                      p=si2.p, b_u=si2.b_u, b_v=si2.b_v, prim=si2.prim)
    bs = bsdf_eps(sa, lane_bsdf, si2.wi, wo_nee,
                  u[0] + eps, u[0], u[1], tr, tex_mask)
    return (jnp.sum(jnp.where(act2, bs.pdf, 0.0))
            + jnp.sum(bs.weight.x) + jnp.sum(bs.val_nee.x))


def env_eval(eps):
    v = em_mod.envmap_eval(sa, Vec3(wd.x, wd.y, wd.z + eps))
    pdf = em_mod.envmap_pdf_direction(sa, wd)
    return jnp.sum(v.x + v.y + v.z) + jnp.sum(pdf)


timed("isect camera", isect_cam)
timed("isect bounce", isect_bounce)
timed("nee sample (no vis)", nee_sample)
timed("shadow ray_test", shadow)
timed("texture eval", tex)
timed("bsdf eval_pdf_sample (incl tex)", bsdf)
if sa.env_kind == "envmap":
    timed("envmap eval+pdf", env_eval)
print("done", flush=True)
