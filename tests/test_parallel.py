"""Multi-device data-parallel rendering (parallel/render.py): the sharded
render must match the single-device render up to the seeding layout, and be
deterministic (SURVEY.md §2.6: psum film merge, groups never straddle
shards)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

import mitsuba3dopplertof_tpu as mi
from mitsuba3dopplertof_tpu.parallel import render_sharded, make_mesh


@pytest.fixture(scope="module")
def scene():
    return mi.load_file("/root/reference/configs_example/scene.xml",
                        resx=16, resy=16)


def test_sharded_matches_single_device(scene):
    """With identical global lane numbering the 8-way sharded render is
    numerically the single-device render (same RNG streams, same splat)."""
    devices = jax.devices()
    if len(devices) < 8:
        pytest.skip("needs 8 virtual devices")
    integ = scene.integrator
    single = np.asarray(integ.render(scene, spp=8, seed=0,
                                     max_lanes=16 * 16 * 8))
    mesh = make_mesh(devices[:8])
    sharded = np.asarray(render_sharded(integ, scene, mesh=mesh, spp=8,
                                        seed=0))
    assert sharded.shape == single.shape
    assert np.allclose(sharded, single, atol=1e-5), \
        float(np.abs(sharded - single).max())


def test_sharded_deterministic(scene):
    devices = jax.devices()
    if len(devices) < 4:
        pytest.skip("needs 4 virtual devices")
    mesh = make_mesh(devices[:4])
    a = np.asarray(render_sharded(scene.integrator, scene, mesh=mesh,
                                  spp=4, seed=3))
    b = np.asarray(render_sharded(scene.integrator, scene, mesh=mesh,
                                  spp=4, seed=3))
    assert np.array_equal(a, b)
