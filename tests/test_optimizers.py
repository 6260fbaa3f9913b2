"""mi.ad optimizers (reference src/python/python/ad/optimizers.py):
Adam / SGD semantics on analytic objectives, the reference's state
behaviors (mask_updates, UniformAdam, per-key lr, reset on shape change),
and an end-to-end inverse-rendering recovery loop."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

import mitsuba3dopplertof_tpu as mi
from mitsuba3dopplertof_tpu.ad import Adam, SGD


def _quad_grad(x, target):
    return {"x": x - target}


def test_adam_converges_quadratic():
    opt = Adam(lr=0.2, params={"x": jnp.zeros(3)})
    tgt = jnp.asarray([1.0, -2.0, 0.5])
    for _ in range(200):
        opt.step(_quad_grad(opt["x"], tgt))
    assert np.abs(np.asarray(opt["x"]) - np.asarray(tgt)).max() < 1e-3


def test_sgd_momentum_converges():
    opt = SGD(lr=0.05, momentum=0.9, params={"x": jnp.zeros(2)})
    tgt = jnp.asarray([0.3, -0.7])
    for _ in range(300):
        opt.step(_quad_grad(opt["x"], tgt))
    assert np.abs(np.asarray(opt["x"]) - np.asarray(tgt)).max() < 1e-3


def test_mask_updates_freezes_unobserved():
    """mask_updates: zero-gradient entries keep value, momentum AND step
    count effects (the reference's SparseAdam behavior)."""
    opt = Adam(lr=0.1, mask_updates=True, params={"x": jnp.zeros(2)})
    g = jnp.asarray([1.0, 0.0])
    for _ in range(5):
        opt.step({"x": g})
    x = np.asarray(opt["x"])
    assert x[1] == 0.0 and x[0] < 0.0
    m, v = (np.asarray(a) for a in opt.state["x"])
    assert m[1] == 0.0 and v[1] == 0.0 and m[0] != 0.0


def test_uniform_adam_equalizes_step():
    """UniformAdam: one shared second-moment -> equal-magnitude steps for
    equal first moments regardless of per-element gradient scale."""
    opt = Adam(lr=0.1, uniform=True, params={"x": jnp.zeros(2)})
    opt.step({"x": jnp.asarray([1.0, 100.0])})
    x = np.asarray(opt["x"])
    # per-element Adam would step both by ~lr; uniform scales by the max
    # second moment: the small-grad element moves 100x less
    assert abs(x[0] / x[1]) == pytest.approx(0.01, rel=1e-3)


def test_per_key_lr_and_reset():
    opt = SGD(lr=1.0, params={"a": jnp.zeros(1), "b": jnp.zeros(1)})
    opt.set_learning_rate({"b": 0.1})
    opt.step({"a": jnp.ones(1), "b": jnp.ones(1)})
    assert np.asarray(opt["a"])[0] == pytest.approx(-1.0)
    assert np.asarray(opt["b"])[0] == pytest.approx(-0.1)
    # assigning a different shape resets state
    opt2 = Adam(lr=0.1, params={"x": jnp.zeros(2)})
    opt2.step({"x": jnp.ones(2)})
    assert opt2.t["x"] == 1
    opt2["x"] = jnp.zeros(4)
    assert opt2.t["x"] == 0 and opt2.state["x"][0].shape == (4,)


def test_shape_mismatch_raises():
    opt = Adam(lr=0.1, params={"x": jnp.zeros(2)})
    with pytest.raises(RuntimeError, match="shape"):
        opt.step({"x": jnp.ones(3)})


def test_mapping_protocol():
    opt = Adam(lr=0.1, params={"x": jnp.zeros(2), "y": jnp.ones(1)})
    assert "x" in opt and len(opt) == 2
    assert sorted(opt.keys()) == ["x", "y"]
    assert dict(opt.items())["y"].shape == (1,)
    del opt["y"]
    assert "y" not in opt and len(opt) == 1


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
      <rgb name="reflectance" value="{refl}"/></bsdf></bsdf>
  </shape>
  <emitter type="point">
    <transform name="to_world"><translate z="1"/></transform>
    <rgb name="intensity" value="5"/>
  </emitter>
</scene>'''


def test_inverse_rendering_recovers_albedo():
    """End-to-end: Adam over the differentiable scene tables recovers the
    target albedo from a reference image (the reference's optimization
    tutorial loop, field-level gradients from render/ad.py)."""
    from mitsuba3dopplertof_tpu.render.ad import (_render_image_fn,
                                                  DIFF_FIELDS)
    target_scene = mi.load_string(XML.format(refl="0.8,0.4,0.2"))
    target = jnp.asarray(mi.render(target_scene, spp=8, seed=0))

    scene = mi.load_string(XML.format(refl="0.5,0.5,0.5"))
    f, sa = _render_image_fn(scene.integrator, scene, None, 8, 0, 1 << 18)
    base = {k: getattr(sa, k) for k in DIFF_FIELDS}

    def loss(p):
        d = f(p) - target
        return 0.5 * jnp.sum(d * d)

    vg = jax.jit(jax.value_and_grad(loss))
    opt = Adam(lr=0.02, params=base)
    losses = []
    for _ in range(60):
        val, grads = vg({k: opt[k] for k in DIFF_FIELDS})
        losses.append(float(val))
        opt.step(grads)
    assert losses[-1] < 0.05 * losses[0], (losses[0], losses[-1])
    final = jnp.asarray(f({k: opt[k] for k in DIFF_FIELDS}))
    err = np.abs(np.asarray(final) - np.asarray(target)).mean()
    assert err < 0.01, err
