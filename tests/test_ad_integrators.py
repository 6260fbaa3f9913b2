"""AD-integrator family (reference src/python/python/ad/integrators/):
prb / prb_basic / prbvolpath render_forward + render_backward."""

import warnings

import numpy as np
import pytest

import mitsuba3dopplertof_tpu as mi


@pytest.fixture(scope="module")
def scene():
    return mi.load_file("/root/reference/configs_example/scene.xml",
                        resx=8, resy=8)


def test_prb_backward_matches_render_grad(scene):
    """PRB's backward pass is the detached-sampling gradient — identical
    to render_grad's jax.grad over the same pass."""
    from mitsuba3dopplertof_tpu.render.ad import render_grad
    prb = mi.load_dict({"type": "prb", "max_depth": 4})
    img = np.asarray(prb.render(scene, seed=0, spp=8))
    g = prb.render_backward(scene, grad_in=np.ones_like(img), spp=8, seed=0)
    _, g2 = render_grad(scene, loss_fn=lambda im: im.sum(), spp=8, seed=0,
                        integrator=prb.nested)
    for k in ("bsdf_params", "emitter_params"):
        a, b = np.asarray(g[k]), np.asarray(g2[k])
        assert np.abs(a - b).max() <= 1e-6 * max(np.abs(b).max(), 1.0), k
    assert np.abs(np.asarray(g["bsdf_params"])).sum() > 0


def test_prb_forward_jvp(scene):
    """render_forward: JVP w.r.t. a reflectance tangent is positive where
    light moves (brighter albedo -> brighter image)."""
    prb = mi.load_dict({"type": "prb", "max_depth": 4})
    sa = scene.compile()
    tan = np.zeros_like(np.asarray(sa.bsdf_params))
    tan[:3, :] = 1.0          # bump all reflectances
    d = np.asarray(prb.render_forward(
        scene, spp=4, seed=0, tangents={"bsdf_params": tan}))
    assert d.mean() > 0.0


def test_prb_primal_matches_path(scene):
    prb = mi.load_dict({"type": "prb", "max_depth": 4})
    path = mi.load_dict({"type": "path", "max_depth": 4})
    a = np.asarray(prb.render(scene, seed=0, spp=8))
    b = np.asarray(path.render(scene, seed=0, spp=8))
    assert np.abs(a - b).max() < 1e-6


def test_reparam_integrators_construct_with_knobs():
    """The reparam family now estimates boundary terms (tests/test_reparam.py
    validates them against FD); here just the parameter surface
    (reference prb_reparam.py:34-60)."""
    p = mi.load_dict({"type": "prb_reparam", "max_depth": 2,
                      "reparam_rays": 4, "reparam_kappa": 1e5,
                      "reparam_exp": 3.0, "reparam_antithetic": True})
    assert p.reparam_rays == 4 and p.reparam_antithetic
    assert p.max_depth_cfg == 2
    d = mi.load_dict({"type": "direct_reparam"})
    assert d.reparam_max_depth == 2


def test_prbvolpath_constructs():
    p = mi.load_dict({"type": "prbvolpath", "max_depth": 4})
    assert p.nested.__class__.__name__ == "VolPathIntegrator"
