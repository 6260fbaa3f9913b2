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
    """MIS direct illumination (reference src/integrators/direct.cpp) with
    one emitter and one BSDF sample (the reference's default 1/1 split)."""

    spectral_mode = "hero"

    def __init__(self, props: Properties):
        super().__init__(props)
        props.get_int("emitter_samples", 1)
        props.get_int("bsdf_samples", 1)
        self._mc = None

    def sample(self, sa, sampler, state, ray, active, wavelengths=None):
        # reuse the shared loop truncated to 2 segments (camera + 1 bounce)
        class _Cfg:
            max_depth = 2
            rr_depth = 100
            loop_iterations = 2
            hide_emitters = self.hide_emitters
            path_correlation_depth = 0
        return _path_loop(_Cfg(), sa, sampler, state, ray, active,
                          modulation_weight=None, use_correlate=False,
                          wavelengths=wavelengths)


@register_plugin("integrator", "aov")
class AOVIntegrator(SamplingIntegrator):
    """Arbitrary output variables (reference src/integrators/aov.cpp).

    ``aovs`` = "name:type,..." with types in {depth, position, uv,
    geo_normal, sh_normal, prim_index, shape_index}. A nested integrator
    (if given) provides the RGB channels.
    """

    _SIZES = {"depth": 1, "position": 3, "uv": 2, "geo_normal": 3,
              "sh_normal": 3, "prim_index": 1, "shape_index": 1}

    def __init__(self, props: Properties):
        super().__init__(props)
        spec = props.get_string("aovs", "")
        self.outputs = []
        for part in [p for p in spec.split(",") if p.strip()]:
            name, _, ty = part.partition(":")
            ty = ty.strip() or name.strip()
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
