"""Differentiable rendering (reference src/render/tests/test_ad.py +
ad/integrators family): jax.grad through the render pass, verified against
finite differences."""

import numpy as np
import jax.numpy as jnp
import pytest

import mitsuba3dopplertof_tpu as mi
from mitsuba3dopplertof_tpu.bsdfs import P_REFL
from mitsuba3dopplertof_tpu.emitters import E_INTENSITY
from mitsuba3dopplertof_tpu.render.ad import _render_image_fn, DIFF_FIELDS

XML = '''
<scene version="3.0.0">
  <integrator type="path"><integer name="max_depth" value="2"/></integrator>
  <sensor type="perspective"><float name="fov" value="45"/>
    <film type="hdrfilm"><integer name="width" value="8"/>
      <integer name="height" value="8"/><rfilter type="box"/></film>
    <sampler type="independent"><integer name="sample_count" value="8"/></sampler>
  </sensor>
  <shape type="rectangle">
    <transform name="to_world"><translate z="2"/></transform>
    <bsdf type="twosided"><bsdf type="diffuse">
      <rgb name="reflectance" value="0.5,0.5,0.5"/></bsdf></bsdf>
  </shape>
  <emitter type="point">
    <transform name="to_world"><translate z="1"/></transform>
    <rgb name="intensity" value="5"/>
  </emitter>
</scene>'''


@pytest.fixture(scope="module")
def setup():
    scene = mi.load_string(XML)
    img0 = np.asarray(mi.render(scene, spp=8, seed=0))
    return scene, img0


def _fd_check(scene, target, field, index, ad_grad, eps=1e-3):
    f, sa = _render_image_fn(scene.integrator, scene, None, 8, 0, 1 << 18)
    base = {k: getattr(sa, k) for k in DIFF_FIELDS}

    def loss(p):
        d = f(p) - jnp.asarray(target)
        return 0.5 * jnp.sum(d * d)

    hi = {**base, field: base[field].at[index].add(eps)}
    lo = {**base, field: base[field].at[index].add(-eps)}
    fd = (float(loss(hi)) - float(loss(lo))) / (2 * eps)
    assert abs(fd - ad_grad) <= 1e-2 * max(abs(fd), abs(ad_grad), 1e-3), \
        (fd, ad_grad)


def test_reflectance_gradient_matches_fd(setup):
    scene, img0 = setup
    target = img0 * 1.2
    loss, grads = mi.render_grad(scene, image_ref=target, spp=8, seed=0)
    g = np.asarray(grads["bsdf_params"])
    # brighter target -> increase reflectance -> negative gradient
    assert (g[P_REFL:P_REFL + 3, 0] < 0).all()
    _fd_check(scene, target, "bsdf_params", (P_REFL, 0),
              float(g[P_REFL, 0]))


def test_emitter_intensity_gradient_matches_fd(setup):
    scene, img0 = setup
    target = img0 * 0.8
    loss, grads = mi.render_grad(scene, image_ref=target, spp=8, seed=0)
    g = np.asarray(grads["emitter_params"])
    # dimmer target -> decrease intensity -> positive gradient
    assert (g[E_INTENSITY:E_INTENSITY + 3, 0] > 0).all()
    _fd_check(scene, target, "emitter_params", (E_INTENSITY, 0),
              float(g[E_INTENSITY, 0]))


def test_gradient_descent_recovers_reflectance(setup):
    """Tiny inverse-rendering loop: recover a perturbed reflectance."""
    scene, img0 = setup
    f, sa = _render_image_fn(scene.integrator, scene, None, 8, 0, 1 << 18)
    base = {k: getattr(sa, k) for k in DIFF_FIELDS}
    target = jnp.asarray(img0)

    import jax
    def loss(p):
        d = f(p) - target
        return 0.5 * jnp.sum(d * d)
    grad_fn = jax.jit(jax.value_and_grad(loss))

    p = {**base, "bsdf_params": base["bsdf_params"].at[P_REFL, 0].set(0.9)}
    lr = 2e-3
    for _ in range(20):
        v, g = grad_fn(p)
        p = {**p, "bsdf_params":
             p["bsdf_params"] - lr * g["bsdf_params"]}
    rec = float(p["bsdf_params"][P_REFL, 0])
    assert abs(rec - 0.5) < 0.05, rec


# ---------------------------------------------------------------------------
# Doppler adjoint (render_doppler_grad) — beyond-reference capability: the
# reference's AD family is not Doppler-aware (SURVEY.md §3.5)
# ---------------------------------------------------------------------------

DOPPLER_XML = '''
<scene version="3.0.0">
  <integrator type="dopplertofpath">
    <integer name="max_depth" value="3"/>
    <float name="w_g" value="30"/>
    <float name="hetero_frequency" value="1.0"/>
    <float name="sensor_phase_offset" value="0.7"/>
    <string name="time_sampling_method" value="antithetic"/>
    <integer name="path_correlation_depth" value="2"/>
  </integrator>
  <sensor type="perspective"><float name="fov" value="45"/>
    <float name="shutter_open" value="0.0"/>
    <float name="shutter_close" value="0.0015"/>
    <film type="hdrfilm"><integer name="width" value="8"/>
      <integer name="height" value="8"/><rfilter type="box"/></film>
    <sampler type="correlated"><integer name="sample_count" value="8"/>
      <integer name="time_correlate_number" value="2"/>
      <integer name="path_correlate_number" value="2"/></sampler>
  </sensor>
  <shape type="rectangle">
    <transform name="to_world"><translate z="2"/></transform>
    <bsdf type="twosided"><bsdf type="diffuse">
      <rgb name="reflectance" value="0.5,0.5,0.5"/></bsdf></bsdf>
  </shape>
  <emitter type="point">
    <transform name="to_world"><translate z="1"/></transform>
    <rgb name="intensity" value="5"/>
  </emitter>
</scene>'''


@pytest.mark.parametrize("attr,eps", [("sensor_phase_offset", 1e-3),
                                      ("w_g", 1e-2),
                                      ("g_1", 1e-3)])
def test_doppler_modulation_gradient_matches_fd(attr, eps):
    """d loss / d (modulation parameter) against central finite
    differences with common random numbers (same seed -> the FD of the
    deterministic estimator equals the derivative of the smooth
    modulation weight)."""
    from mitsuba3dopplertof_tpu.render.ad import render_doppler_grad
    scene = mi.load_string(DOPPLER_XML)
    target = np.asarray(mi.render(scene, spp=8, seed=3))
    integ = scene.integrator

    val, g = render_doppler_grad(scene, wrt=(attr,), image_ref=target,
                                 spp=8, seed=0)
    ad = float(g[attr])

    base = getattr(integ, attr)

    def loss_at(v):
        setattr(integ, attr, v)
        try:
            img = np.asarray(mi.render(scene, spp=8, seed=0))
        finally:
            setattr(integ, attr, base)
        d = img - target
        return 0.5 * float(np.sum(d * d))

    fd = (loss_at(base + eps) - loss_at(base - eps)) / (2 * eps)
    assert abs(fd - ad) <= 2e-2 * max(abs(fd), abs(ad), 1e-3), (attr, fd, ad)


def test_doppler_grad_rejects_unknown_attr():
    from mitsuba3dopplertof_tpu.render.ad import render_doppler_grad
    scene = mi.load_string(DOPPLER_XML)
    with pytest.raises(ValueError):
        render_doppler_grad(scene, wrt=("low_frequency_component_only",),
                            image_ref=np.zeros((8, 8, 3), np.float32))
