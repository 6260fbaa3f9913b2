"""Differentiable rendering.

The reference ships a Python AD-integrator family (path-replay backprop,
reference src/python/python/ad/integrators/*.py) on top of Dr.Jit's tape.
The TPU-native equivalent needs none of that machinery: the whole render
pass is a pure jitted function of the scene tables, so ``jax.grad``
differentiates it directly. Monte Carlo sample *decisions* (directions, RR)
depend only on the RNG bits, so gradients w.r.t. continuous shading
parameters (reflectance, emission, textures) are the detached-sampling
estimator — the same discipline the reference's integrators enforce
manually (dopplertofpath.cpp:234-246). Geometry derivatives
(discontinuities) need reparameterization and are out of scope for v1,
matching prb.py (non-reparam) in the reference.

API:
    grads = render_grad(scene, image_ref, spp=16)   # d loss / d params
    image, grads = value_and_render_grad(scene, loss_fn, spp=16)
"""

from __future__ import annotations

from typing import Callable, Dict, Optional

import numpy as np
import jax
import jax.numpy as jnp

# differentiable SceneArrays leaves exposed to the optimizer
DIFF_FIELDS = ("bsdf_params", "emitter_params", "tex_params",
               "tex_atlas_r", "tex_atlas_g", "tex_atlas_b")

# geometry tables: static/animated triangle vertex+edge columns and the
# instance keyframe matrices. Differentiating these through the oracle
# intersector gives the attached-intersection interior derivative; the
# reparam integrator family (ad/integrators) adds the warped-area boundary
# terms (reference prb_reparam.py / reparam.py)
GEOM_DIFF_FIELDS = tuple(
    p + c for p in ("s_", "a_")
    for c in ("v0x", "v0y", "v0z", "e1x", "e1y", "e1z",
              "e2x", "e2y", "e2z")) + ("inst_m0c", "inst_m1c",
                                       "sph_m0c", "sph_m1c")

DEFAULT_GRAD_LANES = 1 << 18     # backprop holds per-bounce activations


def _render_image_fn(integrator, scene, sensor, spp, seed, max_lanes):
    """Build f(diff_params) -> developed image, traced without donation."""
    from ..films import block_create, develop
    from ..integrators import _build_pass_fn

    if sensor is None:
        sensor = scene.sensor
    film = sensor.film
    sampler = sensor.sampler
    if spp:
        sampler.set_sample_count(spp)
    spp = sampler.sample_count

    W, H = film.crop_size
    spp_per_pass = spp
    while W * H * spp_per_pass > max_lanes and spp_per_pass > 1:
        d = spp_per_pass - 1
        while spp % d != 0:
            d -= 1
        spp_per_pass = d
    n_passes = spp // spp_per_pass

    sampler.set_samples_per_wavefront(spp_per_pass)
    state0 = sampler.seed(seed, W * H * spp_per_pass)
    sa = scene.compile()
    n_channels = film.channel_count + len(integrator.aov_names())

    # use the raw (undonated) pass body so it can be re-traced under grad
    pass_fn = integrator._get_pass_fn(sensor, sampler, film, W, H,
                                      spp_per_pass).raw

    def f(diff_params: Dict[str, jnp.ndarray]):
        # AD renders trace through the differentiable oracle intersector:
        # the Pallas kernels define no VJP, and geometry gradients
        # (GEOM_DIFF_FIELDS) only flow through the XLA path
        from . import scene as _scene_mod
        from .. import integrators as _integ_mod
        old_pallas = _scene_mod.USE_PALLAS
        old_static = _integ_mod._STATIC_BOUNCE_LOOP
        _scene_mod.USE_PALLAS = False
        # while_loop (the primal early-exit bounce loop) has no VJP
        _integ_mod._STATIC_BOUNCE_LOOP = True
        try:
            sa_local = jax.tree_util.tree_unflatten(
                jax.tree_util.tree_structure(sa),
                jax.tree_util.tree_leaves(sa))
            for k, v in diff_params.items():
                setattr(sa_local, k, v)
            block = block_create(W, H, n_channels)
            state = state0
            for _ in range(n_passes):
                block, state = pass_fn(sa_local, block, state)
                state = sampler.advance(state)
            return develop(block, film.has_alpha)
        finally:
            _scene_mod.USE_PALLAS = old_pallas
            _integ_mod._STATIC_BOUNCE_LOOP = old_static

    return f, sa


def render_grad(scene, image_ref=None, loss_fn: Optional[Callable] = None,
                spp: int = 16, seed: int = 0, sensor=None, integrator=None,
                max_lanes: int = DEFAULT_GRAD_LANES):
    """Gradient of a scalar loss of the rendered image w.r.t. the
    differentiable scene tables. Default loss: 0.5 * ||img - image_ref||^2.
    Returns (loss_value, {field: grad_array})."""
    integ = integrator if integrator is not None else scene.integrator
    f, sa = _render_image_fn(integ, scene, sensor, spp, seed, max_lanes)

    if loss_fn is None:
        if image_ref is None:
            raise ValueError("render_grad: pass image_ref or loss_fn")
        ref = jnp.asarray(image_ref)

        def loss_fn(img):
            d = img - ref
            return 0.5 * jnp.sum(d * d)

    params = {k: getattr(sa, k) for k in DIFF_FIELDS}

    def objective(p):
        return loss_fn(f(p))

    val, grads = jax.value_and_grad(objective)(params)
    return val, grads


def value_and_render_grad(scene, loss_fn: Callable, spp: int = 16,
                          seed: int = 0, sensor=None, integrator=None,
                          max_lanes: int = DEFAULT_GRAD_LANES):
    integ = integrator if integrator is not None else scene.integrator
    f, sa = _render_image_fn(integ, scene, sensor, spp, seed, max_lanes)
    params = {k: getattr(sa, k) for k in DIFF_FIELDS}

    def objective(p):
        img = f(p)
        return loss_fn(img), img

    (val, img), grads = jax.value_and_grad(objective, has_aux=True)(params)
    return img, val, grads


# Doppler integrator scalars that the traced pass body reads directly
# (integrators/__init__.py eval_modulation_weight + the ray-time wrap), so
# jax.grad differentiates straight through them. Note these are the
# *derived* parameters — the hetero_offset/hetero_frequency sugar is
# resolved at construction (dopplertofpath.cpp:30-38), so differentiate
# sensor_phase_offset / hetero_frequency themselves.
DOPPLER_DIFF_ATTRS = ("sensor_phase_offset", "w_g", "g_0", "g_1",
                      "hetero_frequency", "time")


def render_doppler_grad(scene, wrt=("sensor_phase_offset",),
                        image_ref=None, loss_fn: Optional[Callable] = None,
                        spp: int = 16, seed: int = 0, sensor=None,
                        max_lanes: int = DEFAULT_GRAD_LANES):
    """Gradient of a scalar loss of the Doppler-ToF image w.r.t. the
    integrator's modulation parameters (DOPPLER_DIFF_ATTRS) — the Doppler
    adjoint the reference does not have (its AD family is not
    Doppler-aware, SURVEY.md §3.5). The correlated sampler's draws are
    pure functions of integer RNG state, so they are naturally detached;
    only the modulation weight and the ray-time wrap carry derivatives.

    Returns (loss_value, {attr: d loss / d attr})."""
    integ = scene.integrator
    if not getattr(integ, "is_doppler", False):
        raise ValueError("render_doppler_grad needs a doppler integrator")
    for k in wrt:
        if k not in DOPPLER_DIFF_ATTRS:
            raise ValueError(f"non-differentiable doppler attr {k!r}; "
                             f"choose from {DOPPLER_DIFF_ATTRS}")
    f, _ = _render_image_fn(integ, scene, sensor, spp, seed, max_lanes)

    if loss_fn is None:
        if image_ref is None:
            raise ValueError("render_doppler_grad: pass image_ref or "
                             "loss_fn")
        ref = jnp.asarray(image_ref)

        def loss_fn(img):
            d = img - ref
            return 0.5 * jnp.sum(d * d)

    params = {k: jnp.float32(getattr(integ, k)) for k in wrt}

    def objective(p):
        old = {k: getattr(integ, k) for k in p}
        for k, v in p.items():
            setattr(integ, k, v)
        try:
            # the pass body is re-traced here, reading the tracer attrs
            return loss_fn(f({}))
        finally:
            for k, v in old.items():
                setattr(integ, k, v)

    return jax.value_and_grad(objective)(params)


__all__ = ["render_grad", "value_and_render_grad", "render_doppler_grad",
           "DIFF_FIELDS", "GEOM_DIFF_FIELDS", "DOPPLER_DIFF_ATTRS"]
