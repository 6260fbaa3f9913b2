"""Parity of the v2 ordered-traversal kernel (ops/intersect_v2.py) against
the dense oracle on a mixed static+animated scene: closest-hit t/prim,
reconstructed payload, any-hit, the scene-box exit bound, and the
end-to-end dispatch route (reference semantics: ordered BVH traversal,
scene_optix.inl:552-570 + instance.cpp:155-250 payload)."""
import numpy as np
import jax
import pytest

from mitsuba3dopplertof_tpu.render.scene import _hit_reference
from mitsuba3dopplertof_tpu.ops.intersect_v2 import (
    intersect_v2, payload_from_prim, scene_box_exit)

from test_mxu_kernel import mixed_scene, _rays  # noqa: F401 (fixture reuse)


def test_v2_closest_hit_and_payload(mixed_scene):
    sa = mixed_scene
    ray = _rays(2048)
    t, prim = intersect_v2(sa, ray)
    hp = jax.tree_util.tree_map(np.asarray,
                                payload_from_prim(sa, ray, t, prim))
    hr = jax.tree_util.tree_map(np.asarray, _hit_reference(sa, ray))

    both_miss = (hp.prim < 0) & (hr.prim < 0)
    assert ((hp.prim < 0) == (hr.prim < 0)).all()
    assert (np.isclose(hp.t, hr.t, rtol=2e-4, atol=1e-5) | both_miss).all()
    m = (hp.prim == hr.prim) & ~both_miss
    assert (hp.prim == hr.prim).mean() > 0.999   # shared-edge ties allowed
    assert (hp.inst[m] == hr.inst[m]).all()
    for f in ("u", "v", "uv_u", "uv_v"):
        np.testing.assert_allclose(getattr(hp, f)[m], getattr(hr, f)[m],
                                   rtol=1e-3, atol=1e-4)


def test_v2_any_hit(mixed_scene):
    sa = mixed_scene
    ray = _rays(2048, seed=11)
    _, prim = intersect_v2(sa, ray, any_hit=True)
    hr = jax.tree_util.tree_map(np.asarray, _hit_reference(sa, ray))
    assert (np.asarray(prim >= 0) == (hr.prim >= 0)).all()


@pytest.mark.parametrize("rows", [8, 32])
def test_v2_row_blocks(mixed_scene, rows):
    """Block size must not change results (termination bound, padding and
    visit ordering are all block-shaped)."""
    sa = mixed_scene
    ray = _rays(1024, seed=5)
    t0, p0 = [np.asarray(x) for x in intersect_v2(sa, ray)]
    t1, p1 = [np.asarray(x) for x in
              intersect_v2(sa, ray, rows_per_block=rows)]
    both_miss = (p0 < 0) & (p1 < 0)
    assert ((p0 < 0) == (p1 < 0)).all()
    assert (np.isclose(t0, t1, rtol=1e-5, atol=1e-6) | both_miss).all()


def test_scene_box_exit_bound(mixed_scene):
    """No oracle hit may lie beyond the per-lane exit bound the kernel
    uses as its traversal cap (geometry lives inside the chunk AABBs)."""
    sa = mixed_scene
    ray = _rays(2048, seed=23)
    o = (np.asarray(ray.o.x), np.asarray(ray.o.y), np.asarray(ray.o.z))
    d = (np.asarray(ray.d.x), np.asarray(ray.d.y), np.asarray(ray.d.z))
    ex = np.asarray(scene_box_exit(sa.chunk_aabb, o, d))
    hr = jax.tree_util.tree_map(np.asarray, _hit_reference(sa, ray))
    hit = hr.prim >= 0
    assert (hr.t[hit] <= ex[hit]).all()
    # rays flagged dead (miss the scene box) must have no oracle hit
    assert (~hit[ex < 0.0]).all()


def test_v2_full_render_matches_v1(mixed_scene, monkeypatch):
    """End-to-end dispatch: the default v2 route matches the v1 stream
    kernel (both large-scene paths force STREAM_THRESHOLD down)."""
    import mitsuba3dopplertof_tpu.ops.intersect_kernel as ik
    monkeypatch.setattr(ik, "STREAM_THRESHOLD", 8)
    ray = _rays(512, seed=3)
    sa = mixed_scene
    monkeypatch.setenv("MI_STREAM_KERNEL", "v1")
    h1 = jax.tree_util.tree_map(np.asarray, ik.intersect_pallas(sa, ray))
    monkeypatch.setenv("MI_STREAM_KERNEL", "v2")
    h2 = jax.tree_util.tree_map(np.asarray, ik.intersect_pallas(sa, ray))
    both_miss = (h1.prim < 0) & (h2.prim < 0)
    assert (np.isclose(h1.t, h2.t, rtol=2e-4, atol=1e-5) | both_miss).all()
    assert ((h1.prim < 0) == (h2.prim < 0)).all()
