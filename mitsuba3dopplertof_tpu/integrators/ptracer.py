"""Adjoint particle tracer (reference src/integrators/ptracer.cpp).

Traces light paths from the emitters and connects every vertex to the
sensor. Connections land in arbitrary pixels, so this integrator uses a
real scatter-add into the film (the one place the renderer needs one; the
camera-path integrators stay scatter-free).

v1 emitter support: point + rectangle-area emitters. Sensor: perspective
pinhole with the reference's importance W = (1/A)/cos^3(theta)/dist^2
(reference perspective.cpp sample_direction + importance():384).
"""

from __future__ import annotations

import math

import numpy as np
import jax
import jax.numpy as jnp

from ..core.properties import Properties, register_plugin
from ..core.vec import Vec3, dot, normalize, where3, vmax, cross
from ..core import warp
from ..render.scene import ray_intersect, ray_test, gather_small
from ..render.types import Ray, SHADOW_EPSILON
from ..bsdfs import eval_pdf_sample as bsdf_eval_pdf_sample
from ..emitters import (EMITTER_POINT, EMITTER_AREA_RECT, E_POS, E_INTENSITY,
                        E_AREA)
from ..films import develop
from . import SamplingIntegrator, DEFAULT_MAX_LANES


@register_plugin("integrator", "ptracer")
class PTracerIntegrator(SamplingIntegrator):
    """Particle tracer; ``samples per pixel`` means light paths per pixel
    (reference ptracer.cpp sample-count semantics)."""

    def __init__(self, props: Properties):
        super().__init__(props)
        md = props.get_int("max_depth", -1)
        self.max_depth = 2 ** 31 if md == -1 else md
        self.rr_depth = props.get_int("rr_depth", 5)
        # gates the direct emitter->sensor connection (the reference's
        # sample_visible_emitters call, ptracer.cpp:80-81)
        self.hide_emitters = props.get_bool("hide_emitters", False)

    @property
    def loop_iterations(self):
        return min(self.max_depth, 32)

    def render(self, scene, sensor=None, seed: int = 0, spp: int = 0,
               *_ptracer_args_guard, **_ptracer_kw_guard):
        import mitsuba3dopplertof_tpu as _mi
        if _mi.variant() in ("tpu_spectral",):
            raise RuntimeError(
                "integrator 'ptracer' does not support the tpu_spectral "
                "variant yet")
        return self._render_impl(scene, sensor=sensor, seed=seed, spp=spp,
                                 *_ptracer_args_guard, **_ptracer_kw_guard)

    def _render_impl(self, scene, sensor=None, seed: int = 0, spp: int = 0,
               develop_film: bool = True, max_lanes: int = DEFAULT_MAX_LANES,
               **_):
        if sensor is None:
            sensor = scene.sensor
        film = sensor.film
        sampler = sensor.sampler
        if spp:
            sampler.set_sample_count(spp)
        spp = sampler.sample_count
        W, H = film.crop_size

        n_total = W * H * spp
        n_pass = min(n_total, max_lanes)
        # keep passes equal-sized
        n_passes = -(-n_total // n_pass)
        n_pass = -(-n_total // n_passes)

        sampler.set_samples_per_wavefront(1)
        sampler.sample_count = 1
        state = sampler.seed(seed, n_pass)
        sa = scene.compile()

        sp = sensor.device_params()
        tan_x, tan_y = sp.tan_half_x, sp.tan_half_y
        A_rect = 4.0 * tan_x * tan_y
        cam = sp.m

        integrator = self

        @jax.jit
        def light_pass(sa, block, state):
            n = n_pass
            active = jnp.ones((n,), bool)

            # ---- sample an emitter ray (reference sample_emitter_ray) ----
            s_sel, state = sampler.next_1d(state, active)
            pos2, state = sampler.next_2d(state, active)
            dir2, state = sampler.next_2d(state, active)
            ne = max(sa.n_emitters, 1)
            idx = jnp.minimum((s_sel * ne).astype(jnp.int32), ne - 1)

            def epar(j):
                return gather_small(sa.emitter_params[j], idx)

            def erow(j):
                return gather_small(sa.emitter_m[j], idx)

            etype = gather_small(sa.emitter_type, idx)
            # point: uniform sphere direction, weight = I * 4pi
            d_pt = warp.uniform_sphere_c(dir2[0], dir2[1])
            o_pt = Vec3(epar(E_POS), epar(E_POS + 1), epar(E_POS + 2))
            w_pt = 4.0 * math.pi
            # area rect: uniform position, cosine direction, w = L * A * pi
            lx = 2.0 * pos2[0] - 1.0
            ly = 2.0 * pos2[1] - 1.0
            o_ar = Vec3(erow(0) * lx + erow(1) * ly + erow(3),
                        erow(4) * lx + erow(5) * ly + erow(7),
                        erow(8) * lx + erow(9) * ly + erow(11))
            nrm = normalize(Vec3(erow(4) * erow(9) - erow(8) * erow(5),
                                 erow(8) * erow(1) - erow(0) * erow(9),
                                 erow(0) * erow(5) - erow(4) * erow(1)))
            # build frame around the rect normal, cosine-sample
            from ..core.vec import coordinate_system
            t1, t2 = coordinate_system(nrm)
            loc = warp.cosine_hemisphere_c(dir2[0], dir2[1])
            d_ar = t1 * loc.x + t2 * loc.y + nrm * loc.z
            w_ar = epar(E_AREA) * math.pi

            is_pt = etype == EMITTER_POINT
            o = where3(is_pt, o_pt, o_ar)
            d = where3(is_pt, d_pt, d_ar)
            rad = Vec3(epar(E_INTENSITY), epar(E_INTENSITY + 1),
                       epar(E_INTENSITY + 2))
            throughput = rad * jnp.where(is_pt, w_pt, w_ar) * float(ne)
            emit_n = where3(is_pt, d, nrm)

            time = jnp.zeros((n,), jnp.float32)
            # offset away from the emitting surface
            o = o + emit_n * 1e-4
            ray = Ray(o, d, time, jnp.full((n,), jnp.inf, jnp.float32))

            def connect(block, p, n_s, contrib, active_c, is_surface,
                        wi_local, lane_bsdf, tex_refl, tex_mask):
                """Connect a vertex to the pinhole and splat."""
                # camera-space position of the vertex
                rx = p.x - cam[3]
                ry = p.y - cam[7]
                rz = p.z - cam[11]
                cx = cam[0] * rx + cam[4] * ry + cam[8] * rz
                cy = cam[1] * rx + cam[5] * ry + cam[9] * rz
                cz = cam[2] * rx + cam[6] * ry + cam[10] * rz
                ok = active_c & (cz > 1e-4)
                sx = 0.5 * (1.0 - cx / jnp.maximum(cz, 1e-8) / tan_x)
                sy = 0.5 * (1.0 - cy / jnp.maximum(cz, 1e-8) / tan_y)
                ok = ok & (sx >= 0) & (sx < 1) & (sy >= 0) & (sy < 1)
                dist2 = cx * cx + cy * cy + cz * cz
                dist = jnp.sqrt(jnp.maximum(dist2, 1e-20))
                ct = cz / dist
                importance = (1.0 / A_rect) / jnp.maximum(ct * ct * ct, 1e-8)
                wgt = importance / jnp.maximum(dist2, 1e-20)
                # visibility
                cam_o = Vec3(jnp.full((n,), cam[3]), jnp.full((n,), cam[7]),
                             jnp.full((n,), cam[11]))
                to_cam = (cam_o - p) * (1.0 / dist)
                sh_o = p + n_s * jnp.where(dot(n_s, to_cam) >= 0, 1e-4, -1e-4)
                shadow = Ray(sh_o, to_cam, time,
                             dist * (1.0 - SHADOW_EPSILON))
                occ = ray_test(sa, shadow, ok)
                ok = ok & ~occ
                val = contrib * wgt
                px = jnp.clip((sx * W).astype(jnp.int32), 0, W - 1)
                py = jnp.clip((sy * H).astype(jnp.int32), 0, H - 1)
                okf = jnp.where(ok, 1.0, 0.0)
                block = block.at[0, py, px].add(val.x * okf)
                block = block.at[1, py, px].add(val.y * okf)
                block = block.at[2, py, px].add(val.z * okf)
                return block

            # direct emitter->sensor connection for area emitters
            # contribution = L * cos(theta_emitter) at the surface point
            def area_direct(block):
                cam_o = Vec3(jnp.full((n,), cam[3]), jnp.full((n,), cam[7]),
                             jnp.full((n,), cam[11]))
                dvec = cam_o - o
                dd = normalize(dvec)
                cos_e = dot(nrm, dd)
                contrib = rad * jnp.maximum(cos_e, 0.0) * epar(E_AREA) * float(ne)
                return connect(block, o, nrm, contrib,
                               active & ~is_pt & (cos_e > 0), False,
                               None, None, None, None)

            if (EMITTER_AREA_RECT in sa.emitter_types_present
                    and not self.hide_emitters and self.max_depth != 0):
                block = area_direct(block)

            bsdf_flags = jnp.asarray(np.asarray(sa.bsdf_flags_host, np.int32))

            def bounce(_, carry):
                block, state, ray, throughput, active = carry
                si = ray_intersect(sa, ray, active)
                act = active & si.valid
                lane_bsdf = gather_small(sa.inst_bsdf, jnp.maximum(si.inst, 0))

                # direction to camera in local frame for the bsdf eval
                cam_o = Vec3(jnp.full((n,), cam[3]), jnp.full((n,), cam[7]),
                             jnp.full((n,), cam[11]))
                to_cam = normalize(cam_o - si.p)
                wo_cam = si.to_local(to_cam)

                s1, state = sampler.next_1d(state, act)
                s2, state = sampler.next_2d(state, act)
                if sa.n_textures > 0:
                    from ..bsdfs import P_REFL_TEX
                    from ..textures import eval_texture
                    lane_tex = gather_small(
                        sa.bsdf_params[P_REFL_TEX],
                        lane_bsdf).astype(jnp.int32)
                    tex_mask = lane_tex >= 0
                    tex_refl = eval_texture(sa, lane_tex, si.uv_u, si.uv_v, p=si.p, b_u=si.b_u, b_v=si.b_v, prim=si.prim)
                else:
                    tex_mask = tex_refl = None
                bs = bsdf_eval_pdf_sample(sa, lane_bsdf, si.wi, wo_cam,
                                          s1, s2[0], s2[1],
                                          tex_refl, tex_mask)

                # splat vertex -> camera (bs.val_nee = f * cos(wo_cam))
                block = connect(block, si.p, si.n, throughput * bs.val_nee,
                                act, True, si.wi, lane_bsdf, tex_refl,
                                tex_mask)

                # continue the light path
                wo_world = si.to_world(bs.wo)
                new_ray = si.spawn_ray(wo_world)
                throughput = where3(act, throughput * bs.weight, throughput)
                # russian roulette
                tm = vmax(throughput)
                rr, state = sampler.next_1d(state, act)
                rr_p = jnp.minimum(tm, 0.95)
                cont = rr < rr_p
                throughput = throughput * jnp.where(
                    act, 1.0 / jnp.maximum(rr_p, 1e-8), 1.0)
                active = act & cont & (tm > 0.0)
                ray = Ray(where3(active, new_ray.o, ray.o),
                          where3(active, wo_world, ray.d),
                          ray.time, new_ray.maxt)
                return block, state, ray, throughput, active

            carry = (block, state, ray, throughput, active)
            carry = jax.lax.fori_loop(0, integrator.loop_iterations, bounce,
                                      carry)
            return carry[0], carry[1]

        block = jnp.zeros((4, H, W), jnp.float32)
        for p in range(n_passes):
            block, state = light_pass(sa, block, state)
            state = sampler.advance(state)

        # normalization: light-path splats average W*H/(paths) per pixel
        scale = float(W * H) / float(n_pass * n_passes)
        img = block[:3] * scale
        out = jnp.moveaxis(img, 0, -1)
        if develop_film:
            return out
        return block


__all__ = ["PTracerIntegrator"]
