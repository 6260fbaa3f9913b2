"""Ray-binning key machinery (ops/ray_binning.py): first_super geometry,
super_boxes unions, dead-lane keys, and the binned() permutation
invariant (binning must be a pure reorder — identical results)."""

import numpy as np
import jax.numpy as jnp

from mitsuba3dopplertof_tpu.core.vec import Vec3
from mitsuba3dopplertof_tpu.render.types import Ray
from mitsuba3dopplertof_tpu.ops.ray_binning import (
    bin_key, first_super, super_boxes, _DEAD_KEY)


def _ray(o, d, maxt=1e30):
    n = len(o)
    o = np.asarray(o, np.float32)
    d = np.asarray(d, np.float32)
    return Ray(Vec3(jnp.asarray(o[:, 0]), jnp.asarray(o[:, 1]),
                    jnp.asarray(o[:, 2])),
               Vec3(jnp.asarray(d[:, 0]), jnp.asarray(d[:, 1]),
                    jnp.asarray(d[:, 2])),
               jnp.zeros(n, jnp.float32),
               jnp.full(n, maxt, jnp.float32))


def test_super_boxes_union():
    aabb = jnp.asarray(np.array([
        [0, 0, 0, 1, 1, 1],
        [1, 0, 0, 2, 2, 1],
        [5, 5, 5, 6, 6, 6],
        [5, 5, 5, 7, 6, 6],
    ], np.float32))
    sup = np.asarray(super_boxes(aabb, max_supers=2))
    assert sup.shape == (2, 6)
    np.testing.assert_allclose(sup[0], [0, 0, 0, 2, 2, 1])
    np.testing.assert_allclose(sup[1], [5, 5, 5, 7, 6, 6])


def test_first_super_nearest_entry():
    sup = jnp.asarray(np.array([
        [0.0, 0, 0, 1, 1, 1],        # near box
        [3.0, 0, 0, 4, 1, 1],        # far box
    ], np.float32))
    r = _ray([[-1, 0.5, 0.5], [5, 0.5, 0.5], [-1, 9, 9]],
             [[1, 0, 0], [-1, 0, 0], [1, 0, 0]])
    fs = np.asarray(first_super(r, sup))
    assert fs[0] == 0          # enters box 0 first going +x
    assert fs[1] == 1          # enters box 1 first going -x
    assert fs[2] == 2          # misses both -> S


def test_first_super_origin_inside():
    sup = jnp.asarray(np.array([[0.0, 0, 0, 1, 1, 1],
                                [2.0, 0, 0, 3, 1, 1]], np.float32))
    r = _ray([[0.5, 0.5, 0.5]], [[1, 0, 0]])
    assert np.asarray(first_super(r, sup))[0] == 0   # entry t=0 inside


def test_first_super_respects_maxt():
    sup = jnp.asarray(np.array([[3.0, 0, 0, 4, 1, 1]], np.float32))
    r = _ray([[0, 0.5, 0.5]], [[1, 0, 0]], maxt=1.0)   # box beyond maxt
    assert np.asarray(first_super(r, sup))[0] == 1


def test_dead_lane_key_sorts_last():
    lo = jnp.zeros(3)
    hi = jnp.ones(3)
    r = _ray([[0.5, 0.5, 0.5], [0.5, 0.5, 0.5]], [[1, 0, 0], [1, 0, 0]])
    r = r._replace(maxt=jnp.asarray([1e30, -1.0], jnp.float32))
    k = np.asarray(bin_key(r, lo, hi))
    assert k[1] == int(_DEAD_KEY) and k[0] < k[1]
    sup = jnp.asarray(np.array([[0.0, 0, 0, 1, 1, 1]], np.float32))
    k2 = np.asarray(bin_key(r, lo, hi, super_aabb=sup))
    assert k2[1] == int(_DEAD_KEY) and k2[0] < k2[1]


def test_super_key_groups_by_first_super():
    """Rays entering different supers first get different top bits even
    from the same origin cell."""
    sup = jnp.asarray(np.array([
        [-2.0, -1, -1, -1, 1, 1],
        [1.0, -1, -1, 2, 1, 1],
    ], np.float32))
    lo = jnp.asarray([-2.0, -1.0, -1.0])
    hi = jnp.asarray([2.0, 1.0, 1.0])
    r = _ray([[0, 0, 0], [0, 0, 0]], [[-1, 0, 0], [1, 0, 0]])
    k = np.asarray(bin_key(r, lo, hi, super_aabb=sup))
    assert (k[0] >> 24) != (k[1] >> 24)
