"""Parity of the two-round bound-tightening traversal
(ops/intersect_v4.intersect_v4_2r: capped round 1 + per-lane done test +
re-binned seeded round 2) against the dense oracle and the single-round
v4 kernel. Reference role: ordered BVH traversal with early-out
(scene_embree.inl:203-299, scene_optix.inl:552-570)."""
import numpy as np
import jax
import pytest

from mitsuba3dopplertof_tpu.render.scene import _hit_reference
from mitsuba3dopplertof_tpu.ops.intersect_v4 import (
    intersect_v4, intersect_v4_2r)

from test_mxu_kernel import mixed_scene, _rays  # noqa: F401 (fixture reuse)


@pytest.mark.parametrize("cap", [2, 16])
def test_2r_closest_matches_oracle(mixed_scene, cap):
    sa = mixed_scene
    ray = _rays(768)
    t, prim = [np.asarray(x) for x in
               intersect_v4_2r(sa, ray, cap=cap, rows_per_block=8, rows2=8)]
    hr = jax.tree_util.tree_map(np.asarray, _hit_reference(sa, ray))
    both_miss = (prim < 0) & (hr.prim < 0)
    assert ((prim < 0) == (hr.prim < 0)).all()
    assert (np.isclose(t, hr.t, rtol=3e-4, atol=1e-4) | both_miss).all()
    assert (prim == hr.prim).mean() > 0.999   # shared-edge ties allowed


def test_2r_matches_single_round(mixed_scene):
    sa = mixed_scene
    ray = _rays(768, seed=13)
    t0, p0 = [np.asarray(x) for x in intersect_v4(sa, ray)]
    t1, p1 = [np.asarray(x) for x in
              intersect_v4_2r(sa, ray, cap=2, rows_per_block=8, rows2=8)]
    both_miss = (p0 < 0) & (p1 < 0)
    assert ((p0 < 0) == (p1 < 0)).all()
    assert (np.isclose(t0, t1, rtol=1e-5, atol=1e-6) | both_miss).all()


@pytest.mark.parametrize("cap", [2])
def test_2r_any_hit(mixed_scene, cap):
    sa = mixed_scene
    ray = _rays(768, seed=11)
    _, prim = intersect_v4_2r(sa, ray, any_hit=True, cap=cap,
                              rows_per_block=8, rows2=8)
    hr = jax.tree_util.tree_map(np.asarray, _hit_reference(sa, ray))
    assert (np.asarray(prim >= 0) == (hr.prim >= 0)).all()


def test_2r_active_mask_deadens(mixed_scene):
    sa = mixed_scene
    ray = _rays(768, seed=3)
    active = np.arange(768) % 3 != 0
    t, prim = [np.asarray(x) for x in
               intersect_v4_2r(sa, ray, active=jax.numpy.asarray(active),
                               cap=2, rows_per_block=8, rows2=8)]
    assert (np.asarray(prim)[~active] < 0).all()
    hr = jax.tree_util.tree_map(np.asarray, _hit_reference(sa, ray))
    m = active & (hr.prim >= 0)
    assert ((prim >= 0) == (hr.prim >= 0))[active].all()
    assert np.isclose(t[m], hr.t[m], rtol=3e-4, atol=1e-4).all()
