"""Additional integrators: direct, aov, moment
(reference src/integrators/{direct,aov,moment}.cpp)."""

from __future__ import annotations

import jax.numpy as jnp

from ..core.properties import Properties, register_plugin
from ..core.vec import Vec3, dot, where3
from ..render.scene import ray_intersect, ray_test, gather_small
from ..render.types import Ray
from ..bsdfs import eval_pdf_sample as bsdf_eval_pdf_sample, FLAG_SMOOTH
from .. import emitters as em_mod
from . import (SamplingIntegrator, MonteCarloIntegrator, mis_weight,
               _path_loop)
import numpy as np


@register_plugin("integrator", "direct")
class DirectIntegrator(SamplingIntegrator):
    """MIS direct illumination with an N emitter / M BSDF sample split
    (reference src/integrators/direct.cpp:99-211): each strategy's
    contribution is averaged over its own draw count and MIS-weighted by
    the sampling-effort fractions N/(N+M), M/(N+M)."""

    spectral_mode = "hero"

    def __init__(self, props: Properties):
        super().__init__(props)
        shading = props.get_int("shading_samples", 1)
        self.emitter_samples = props.get_int("emitter_samples", shading)
        self.bsdf_samples = props.get_int("bsdf_samples", shading)
        if self.emitter_samples + self.bsdf_samples == 0:
            raise RuntimeError(
                "direct: must have at least 1 BSDF or emitter sample")

    def sample(self, sa, sampler, state, ray, active, wavelengths=None):
        N = self.emitter_samples
        M = self.bsdf_samples
        total = max(N + M, 1)
        frac_lum = N / total
        frac_bsdf = M / total
        w_lum = 1.0 / max(N, 1)
        w_bsdf = 1.0 / max(M, 1)
        n = ray.o.x.shape[0]
        f32 = jnp.float32
        active = jnp.asarray(active)

        from ..render.types import DirectionSample

        si = ray_intersect(sa, ray, active)
        if sa.any_nmap:
            from . import _apply_normal_maps
            si = _apply_normal_maps(sa, si)
        result = Vec3.zeros((n,))
        has_env = sa.has_environment and not self.hide_emitters
        valid_ray = jnp.full((n,), bool(has_env)) | (active & si.valid)

        # ---- first-hit emission (direct.cpp:128-137, weight 1) ----------
        lane_emitter = jnp.where(
            si.valid, gather_small(sa.inst_emitter,
                                   jnp.maximum(si.inst, 0)), -1)
        if (sa.n_emitters > 0 or has_env) and not self.hide_emitters:
            if sa.n_emitters > 0:
                em_val = em_mod.eval_emitter_hit(sa, si.sh_n, -ray.d,
                                                 lane_emitter,
                                                 wavelengths=wavelengths,
                                                 uv_u=si.uv_u,
                                                 uv_v=si.uv_v)
            else:
                em_val = Vec3.zeros((n,))
            emit_mask = active & (lane_emitter >= 0)
            if has_env:
                miss_env = (~si.valid) & active
                if sa.env_kind == "envmap":
                    env_val = em_mod.envmap_eval(sa, ray.d,
                                                 wavelengths=wavelengths)
                else:
                    er, eg, eb = sa.env_radiance
                    env_val = Vec3.full((n,), er, eg, eb)
                em_val = where3(miss_env, env_val, em_val)
                emit_mask = emit_mask | miss_env
            result = result + em_val * jnp.where(emit_mask, 1.0, 0.0)

        lane_bsdf = gather_small(sa.inst_bsdf, jnp.maximum(si.inst, 0))
        bsdf_flags = jnp.asarray(np.asarray(sa.bsdf_flags_host, np.int32))
        smooth = (gather_small(bsdf_flags, lane_bsdf) & FLAG_SMOOTH) != 0
        act_surf = active & si.valid

        if sa.n_textures > 0:
            from ..bsdfs import P_REFL_TEX
            from ..textures import eval_texture
            lane_tex = gather_small(
                sa.bsdf_params[P_REFL_TEX], lane_bsdf).astype(jnp.int32)
            tex_mask = lane_tex >= 0
            tex_refl = eval_texture(sa, lane_tex, si.uv_u, si.uv_v,
                                    p=si.p, b_u=si.b_u, b_v=si.b_v,
                                    prim=si.prim, wavelengths=wavelengths)
        else:
            tex_mask = tex_refl = None

        half = jnp.full((n,), 0.5, f32)

        # ---- N emitter samples (direct.cpp:148-176) ---------------------
        for _ in range(N if sa.n_emitters > 0 else 0):
            s2, state = sampler.next_2d(state, active)
            ds, em_weight = em_mod.sample_direction(
                sa, si.p, ray.time, s2[0], s2[1], wavelengths=wavelengths)
            act_em = act_surf & smooth & (ds.pdf != 0.0)
            occluded = ray_test(sa, si.spawn_ray_to(ds.p), act_em)
            ok = act_em & ~occluded
            r = bsdf_eval_pdf_sample(sa, lane_bsdf, si.wi,
                                     si.to_local(ds.d), half, half, half,
                                     tex_refl, tex_mask,
                                     wavelengths=wavelengths)
            mis = jnp.where(
                ds.delta, 1.0,
                mis_weight(ds.pdf * frac_lum,
                           r.pdf_nee * frac_bsdf)) * w_lum
            scale = jnp.where(ok, mis, 0.0)
            result = result + r.val_nee * em_weight * scale

        # ---- M BSDF samples (direct.cpp:180-207) ------------------------
        any_emission = (sa.n_emitters > 0) or has_env
        for _ in range(M if any_emission else 0):
            s1, state = sampler.next_1d(state, active)
            s2, state = sampler.next_2d(state, active)
            r = bsdf_eval_pdf_sample(sa, lane_bsdf, si.wi, si.wi,
                                     s1, s2[0], s2[1], tex_refl, tex_mask,
                                     wavelengths=wavelengths)
            act_b = act_surf & (r.pdf > 0.0)
            ray2 = si.spawn_ray(si.to_world(r.wo))
            si2 = ray_intersect(sa, ray2, act_b)
            lane_em2 = jnp.where(
                si2.valid, gather_small(sa.inst_emitter,
                                        jnp.maximum(si2.inst, 0)), -1)
            if sa.n_emitters > 0:
                em_val2 = em_mod.eval_emitter_hit(sa, si2.sh_n, -ray2.d,
                                                  lane_em2,
                                                  wavelengths=wavelengths,
                                                  uv_u=si2.uv_u,
                                                  uv_v=si2.uv_v)
            else:
                em_val2 = Vec3.zeros((n,))
            hit_em = act_b & (lane_em2 >= 0)
            d_seg = si2.p - si.p
            dist = jnp.sqrt(jnp.maximum(dot(d_seg, d_seg), 1e-20))
            ds_hit = DirectionSample(
                p=si2.p, n=si2.sh_n, d=d_seg * (1.0 / dist), dist=dist,
                pdf=jnp.zeros((n,), f32), delta=jnp.zeros((n,), bool),
                emitter=lane_em2)
            em_pdf = jnp.where(r.sampled_delta, 0.0,
                               em_mod.pdf_direction(sa, ds_hit,
                                                    prim=si2.prim,
                                                    time=ray2.time))
            if has_env:
                miss2 = (~si2.valid) & act_b
                if sa.env_kind == "envmap":
                    env_val = em_mod.envmap_eval(sa, ray2.d,
                                                 wavelengths=wavelengths)
                    env_pdf = em_mod.envmap_pdf_direction(sa, ray2.d)
                else:
                    er, eg, eb = sa.env_radiance
                    env_val = Vec3.full((n,), er, eg, eb)
                    env_pdf = jnp.full((n,), 1.0 / (4.0 * np.pi), f32)
                env_pdf = env_pdf * (1.0 / max(sa.n_emitters, 1))
                em_val2 = where3(miss2, env_val, em_val2)
                em_pdf = jnp.where(miss2 & ~r.sampled_delta, env_pdf,
                                   em_pdf)
                hit_em = hit_em | miss2
            mis = mis_weight(r.pdf * frac_bsdf, em_pdf * frac_lum) * w_bsdf
            scale = jnp.where(hit_em, mis, 0.0)
            result = result + r.weight * em_val2 * scale

        spec = where3(valid_ray, result, Vec3.zeros((n,)))
        return spec, valid_ray, state


@register_plugin("integrator", "aov")
class AOVIntegrator(SamplingIntegrator):
    """Arbitrary output variables (reference src/integrators/aov.cpp).

    ``aovs`` = "name:type,..." with types in {depth, position, uv,
    geo_normal, sh_normal, prim_index, shape_index}. A nested integrator
    (if given) provides the RGB channels.
    """

    _SIZES = {"depth": 1, "position": 3, "uv": 2, "geo_normal": 3,
              "sh_normal": 3, "prim_index": 1, "shape_index": 1,
              "albedo": 3}

    def __init__(self, props: Properties):
        super().__init__(props)
        spec = props.get_string("aovs", "")
        self.outputs = []
        for part in [p for p in spec.split(",") if p.strip()]:
            name, _, ty = part.partition(":")
            ty = ty.strip() or name.strip()
            if ty in ("duv_dx", "duv_dy"):
                raise RuntimeError(
                    "aov: screen-space UV partials need ray differentials, "
                    "which this wavefront design does not carry")
            if ty not in self._SIZES:
                raise RuntimeError(f"aov: unknown type '{ty}'")
            self.outputs.append((name.strip(), ty))
        self.child = None
        for key, v in props.objects():
            if isinstance(v, SamplingIntegrator):
                self.child = v

    def aov_names(self):
        names = []
        for name, ty in self.outputs:
            k = self._SIZES[ty]
            if k == 1:
                names.append(name)
            else:
                suffix = {2: ["u", "v"], 3: ["x", "y", "z"]}[k]
                names.extend(f"{name}.{s}" for s in suffix)
        return names

    @property
    def spectral_mode(self):
        return (self.child.spectral_mode if self.child is not None
                else "neutral")

    def sample(self, sa, sampler, state, ray, active, wavelengths=None):
        si = ray_intersect(sa, ray, active)
        aovs = []
        for name, ty in self.outputs:
            if ty == "depth":
                aovs.append(jnp.where(si.valid, si.t, 0.0))
            elif ty == "position":
                aovs.extend([si.p.x, si.p.y, si.p.z])
            elif ty == "uv":
                aovs.extend([si.uv_u, si.uv_v])
            elif ty == "geo_normal":
                aovs.extend([si.n.x, si.n.y, si.n.z])
            elif ty == "sh_normal":
                aovs.extend([si.sh_n.x, si.sh_n.y, si.sh_n.z])
            elif ty == "prim_index":
                aovs.append(si.prim.astype(jnp.float32))
            elif ty == "shape_index":
                aovs.append(si.inst.astype(jnp.float32))
            elif ty == "albedo":
                # diffuse/specular reflectance at the first hit incl.
                # textures (aov.cpp albedo: eval_diffuse_reflectance)
                from ..bsdfs import P_REFL, P_REFL_TEX
                lane_bsdf = gather_small(sa.inst_bsdf,
                                         jnp.maximum(si.inst, 0))
                alb = Vec3(
                    gather_small(sa.bsdf_params[P_REFL], lane_bsdf),
                    gather_small(sa.bsdf_params[P_REFL + 1], lane_bsdf),
                    gather_small(sa.bsdf_params[P_REFL + 2], lane_bsdf))
                if sa.n_textures > 0:
                    from ..textures import eval_texture
                    lane_tex = gather_small(
                        sa.bsdf_params[P_REFL_TEX],
                        lane_bsdf).astype(jnp.int32)
                    tx = eval_texture(sa, jnp.maximum(lane_tex, 0),
                                      si.uv_u, si.uv_v, p=si.p,
                                      b_u=si.b_u, b_v=si.b_v, prim=si.prim,
                                      wavelengths=wavelengths)
                    alb = where3(lane_tex >= 0, tx, alb)
                vm = jnp.where(si.valid, 1.0, 0.0)
                aovs.extend([alb.x * vm, alb.y * vm, alb.z * vm])
        if self.child is not None:
            kw = ({"wavelengths": wavelengths} if wavelengths is not None
                  else {})
            spec, valid, state = self.child.sample(sa, sampler, state, ray,
                                                   active, **kw)[:3]
        else:
            spec = Vec3(jnp.zeros_like(si.t), jnp.zeros_like(si.t),
                        jnp.zeros_like(si.t))
            valid = si.valid
        return spec, valid, state, aovs


@register_plugin("integrator", "moment")
class MomentIntegrator(SamplingIntegrator):
    """Second-moment AOVs of a nested integrator
    (reference src/integrators/moment.cpp:21-59) — the reference's image
    tests derive per-pixel variance references from these channels."""

    def __init__(self, props: Properties):
        super().__init__(props)
        self.child = None
        for key, v in props.objects():
            if isinstance(v, SamplingIntegrator):
                self.child = v
        if self.child is None:
            raise RuntimeError("moment: requires a nested integrator")
        self.is_doppler = self.child.is_doppler
        for attr in ("time_sampling_method", "antithetic_shift",
                     "use_stratified_sampling_for_each_interval",
                     "path_correlation_depth"):
            setattr(self, attr, getattr(self.child, attr))

    def aov_names(self):
        return ["m2.R", "m2.G", "m2.B"]

    @property
    def spectral_mode(self):
        return self.child.spectral_mode

    def sample(self, sa, sampler, state, ray, active, wavelengths=None):
        kw = ({"wavelengths": wavelengths} if wavelengths is not None
              else {})
        spec, valid, state = self.child.sample(sa, sampler, state, ray,
                                               active, **kw)[:3]
        aovs = [spec.x * spec.x, spec.y * spec.y, spec.z * spec.z]
        return spec, valid, state, aovs
