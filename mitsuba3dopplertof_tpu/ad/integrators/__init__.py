"""AD integrators (reference src/python/python/ad/integrators/*.py).

The reference builds Path Replay Backpropagation on Dr.Jit's tape: the
forward pass records nothing, and the backward pass *replays* each path
with the same RNG to reconstruct per-bounce state in O(1) memory
(prb.py, prb_basic.py). The TPU-native analog: the whole render pass is a
pure jitted function of the scene tables, so reverse-mode AD through the
lax.fori_loop bounce loop gives the SAME detached-sampling gradient
estimator; `jax.checkpoint` (rematerialization) over the pass body is the
XLA-native counterpart of path replay — activations inside a bounce are
recomputed from the loop carry instead of stored, trading FLOPs for HBM
exactly like PRB does.

Gradients cover the continuous shading parameters (reflectance, emission,
textures: render.ad.DIFF_FIELDS). Silhouette/visibility boundary terms
(the *_reparam integrators' reason to exist) are not yet estimated — the
reparam classes compute the interior (detached-sampling) derivative and
warn, matching the reference's prb.py caveat list.
"""

from __future__ import annotations

import warnings
from typing import Optional

import jax
import jax.numpy as jnp

from ...core.properties import Properties, register_plugin
from ...render.ad import (render_grad, value_and_render_grad, DIFF_FIELDS,
                          _render_image_fn, DEFAULT_GRAD_LANES)


class ADIntegrator:
    """Common AD-integrator surface (reference common.py ADIntegrator):
    render / render_forward / render_backward over a nested sampling
    integrator."""

    nested_type = "path"
    boundary_terms = False

    def __init__(self, props: Properties):
        self.id = props.id
        from ... import load_dict
        cfg = {"type": self.nested_type}
        for k in ("max_depth", "rr_depth"):
            if props.has_property(k):
                cfg[k] = props.get_int(k)
        self.nested = load_dict(cfg)
        for k in list(props.keys()):
            props.mark_queried(k)

    # -- plain rendering (primal) -----------------------------------------
    def render(self, scene, sensor=None, seed: int = 0, spp: int = 0,
               **kw):
        return self.nested.render(scene, sensor=sensor, seed=seed, spp=spp,
                                  **kw)

    def aov_names(self):
        return []

    # -- reverse mode ------------------------------------------------------
    def render_backward(self, scene, params=None, grad_in=None, sensor=None,
                        seed: int = 0, spp: int = 4,
                        max_lanes: int = DEFAULT_GRAD_LANES, remat=True):
        """d<grad_in, image>/d(scene tables) — the PRB backward pass
        (reference common.py render_backward). ``grad_in``: adjoint image.
        Returns {field: grad}; if ``params`` is a SceneParameters, the
        grads are also attached as ``params.grad``."""
        f, sa = _render_image_fn(self.nested, scene, sensor, spp, seed,
                                 max_lanes)
        if remat:
            # rematerialize the pass body: the XLA-native path replay
            f = jax.checkpoint(f)
        g_img = jnp.asarray(grad_in)

        def objective(p):
            return jnp.sum(f(p) * g_img)

        diff = {k: getattr(sa, k) for k in DIFF_FIELDS}
        grads = jax.grad(objective)(diff)
        if params is not None:
            params.grad = grads
        return grads

    def render_forward(self, scene, params=None, sensor=None, seed: int = 0,
                       spp: int = 4, tangents=None,
                       max_lanes: int = DEFAULT_GRAD_LANES):
        """JVP of the image w.r.t. the scene tables (reference
        render_forward). ``tangents``: {field: tangent array}; defaults to
        ones (the reference's convention of seeding dr.forward with 1)."""
        f, sa = _render_image_fn(self.nested, scene, sensor, spp, seed,
                                 max_lanes)
        diff = {k: getattr(sa, k) for k in DIFF_FIELDS}
        if tangents is None:
            tangents = {k: jnp.ones_like(v) for k, v in diff.items()}
        else:
            base = {k: jnp.zeros_like(v) for k, v in diff.items()}
            base.update({k: jnp.asarray(v) for k, v in tangents.items()})
            tangents = base
        img, dimg = jax.jvp(f, (diff,), (tangents,))
        return dimg


@register_plugin("integrator", "prb_basic")
class BasicPRBIntegrator(ADIntegrator):
    """Basic PRB: BSDF sampling only, no NEE (reference prb_basic.py).
    Implemented over the plain path tracer with MIS disabled is not
    required for gradient correctness — the estimator differs only in
    variance, so this wraps `path` directly."""
    nested_type = "path"


@register_plugin("integrator", "prb")
class PRBIntegrator(ADIntegrator):
    """PRB with NEE + MIS (reference prb.py)."""
    nested_type = "path"


@register_plugin("integrator", "prbvolpath")
class PRBVolpathIntegrator(ADIntegrator):
    """PRB through participating media (reference prbvolpath.py)."""
    nested_type = "volpath"


class _ReparamMixin:
    def __init__(self, props: Properties):
        super().__init__(props)
        for k in ("reparam_rays", "reparam_kappa", "reparam_exp",
                  "reparam_antithetic", "reparam_max_depth"):
            if props.has_property(k):
                props.mark_queried(k)
        warnings.warn(
            f"{type(self).__name__}: silhouette boundary terms are not yet "
            "estimated on this backend; gradients cover the interior "
            "(detached-sampling) derivative only")


@register_plugin("integrator", "prb_reparam")
class PRBReparamIntegrator(_ReparamMixin, ADIntegrator):
    """reference prb_reparam.py — interior derivative only in v1."""
    nested_type = "path"


@register_plugin("integrator", "direct_reparam")
class DirectReparamIntegrator(_ReparamMixin, ADIntegrator):
    """reference direct_reparam.py — interior derivative only in v1."""
    nested_type = "direct"


@register_plugin("integrator", "emission_reparam")
class EmissionReparamIntegrator(_ReparamMixin, ADIntegrator):
    """reference emission_reparam.py — interior derivative only in v1."""
    nested_type = "direct"


__all__ = ["ADIntegrator", "PRBIntegrator", "BasicPRBIntegrator",
           "PRBVolpathIntegrator", "PRBReparamIntegrator",
           "DirectReparamIntegrator", "EmissionReparamIntegrator",
           "render_grad", "value_and_render_grad"]
