"""Parity of the v4 kernel (ops/intersect_v4.py: grouped 32-tri Woop visit
units with XLA-precomputed gates) against the dense oracle and the v1 route
(reference semantics: ordered BVH traversal, scene_optix.inl:552-570)."""
import numpy as np
import jax
import pytest

from mitsuba3dopplertof_tpu.render.scene import _hit_reference
from mitsuba3dopplertof_tpu.ops.intersect_v4 import (
    intersect_v4, payload_from_prim)

from test_mxu_kernel import mixed_scene, _rays  # noqa: F401 (fixture reuse)


def test_v4_closest_hit_and_payload(mixed_scene):
    sa = mixed_scene
    ray = _rays(2048)
    t, prim = intersect_v4(sa, ray)
    hp = jax.tree_util.tree_map(np.asarray,
                                payload_from_prim(sa, ray, t, prim))
    hr = jax.tree_util.tree_map(np.asarray, _hit_reference(sa, ray))

    both_miss = (hp.prim < 0) & (hr.prim < 0)
    assert ((hp.prim < 0) == (hr.prim < 0)).all()
    # Woop's precomputed inverse reassociates the arithmetic: slightly
    # looser t tolerance than the Möller kernels
    assert (np.isclose(hp.t, hr.t, rtol=3e-4, atol=1e-4) | both_miss).all()
    m = (hp.prim == hr.prim) & ~both_miss
    assert (hp.prim == hr.prim).mean() > 0.999
    assert (hp.inst[m] == hr.inst[m]).all()


def test_v4_any_hit(mixed_scene):
    sa = mixed_scene
    ray = _rays(2048, seed=11)
    _, prim = intersect_v4(sa, ray, any_hit=True)
    hr = jax.tree_util.tree_map(np.asarray, _hit_reference(sa, ray))
    assert (np.asarray(prim >= 0) == (hr.prim >= 0)).all()


def test_v4_maxt_respected(mixed_scene):
    """Finite maxt (shadow-ray population): no hit may exceed maxt, and
    hits agree with the oracle under the same cap."""
    sa = mixed_scene
    ray = _rays(1024, seed=7)
    import jax.numpy as jnp
    ray = ray._replace(maxt=jnp.full_like(ray.maxt, 2.0))
    t, prim = [np.asarray(x) for x in intersect_v4(sa, ray)]
    hr = jax.tree_util.tree_map(np.asarray, _hit_reference(sa, ray))
    assert ((prim < 0) == (hr.prim < 0)).all()
    assert (t[prim >= 0] <= 2.0 + 1e-4).all()


@pytest.mark.parametrize("rows", [8, 32])
def test_v4_row_blocks(mixed_scene, rows):
    sa = mixed_scene
    ray = _rays(1024, seed=5)
    t0, p0 = [np.asarray(x) for x in intersect_v4(sa, ray)]
    t1, p1 = [np.asarray(x) for x in
              intersect_v4(sa, ray, rows_per_block=rows)]
    both_miss = (p0 < 0) & (p1 < 0)
    assert ((p0 < 0) == (p1 < 0)).all()
    assert (np.isclose(t0, t1, rtol=1e-5, atol=1e-6) | both_miss).all()


def test_v4_full_render_matches_v1(mixed_scene, monkeypatch):
    import mitsuba3dopplertof_tpu.ops.intersect_kernel as ik
    monkeypatch.setattr(ik, "STREAM_THRESHOLD", 8)
    ray = _rays(512, seed=3)
    sa = mixed_scene
    monkeypatch.setenv("MI_STREAM_KERNEL", "v1")
    h1 = jax.tree_util.tree_map(np.asarray, ik.intersect_pallas(sa, ray))
    monkeypatch.setenv("MI_STREAM_KERNEL", "v4")
    h2 = jax.tree_util.tree_map(np.asarray, ik.intersect_pallas(sa, ray))
    both_miss = (h1.prim < 0) & (h2.prim < 0)
    assert (np.isclose(h1.t, h2.t, rtol=3e-4, atol=1e-4) | both_miss).all()
    assert ((h1.prim < 0) == (h2.prim < 0)).all()
