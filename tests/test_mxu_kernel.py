"""Parity of the two-phase MXU intersection kernel (ops/intersect_mxu.py)
against the dense oracle: closest-hit t/prim, reconstructed payload, and
any-hit, on a mixed static+animated scene (reference semantics:
scene_optix.inl:552-570 traversal + instance.cpp:155-250 payload)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

import mitsuba3dopplertof_tpu as mi
from mitsuba3dopplertof_tpu.core import transform as tf
from mitsuba3dopplertof_tpu.core.transform import AnimatedTransform
from mitsuba3dopplertof_tpu.core.vec import Vec3
from mitsuba3dopplertof_tpu.render.types import Ray
from mitsuba3dopplertof_tpu.render.scene import _hit_reference
from mitsuba3dopplertof_tpu.ops.intersect_mxu import (
    intersect_mxu, payload_from_prim)


def _sphere_obj(path, nu, nv):
    lines = []
    for j in range(nv + 1):
        for i in range(nu):
            th, ph = np.pi * j / nv, 2 * np.pi * i / nu
            x, y, z = (np.sin(th) * np.cos(ph), np.cos(th),
                       np.sin(th) * np.sin(ph))
            lines.append(f"v {x:.6f} {y:.6f} {z:.6f}")
            lines.append(f"vn {x:.6f} {y:.6f} {z:.6f}")
            lines.append(f"vt {i/nu:.6f} {j/nv:.6f}")

    def vid(i, j):
        return j * nu + (i % nu) + 1
    for j in range(nv):
        for i in range(nu):
            a, b, c, d = vid(i, j), vid(i + 1, j), vid(i + 1, j + 1), \
                vid(i, j + 1)
            lines.append(f"f {a}/{a}/{a} {b}/{b}/{b} {c}/{c}/{c}")
            lines.append(f"f {a}/{a}/{a} {c}/{c}/{c} {d}/{d}/{d}")
    path.write_text("\n".join(lines))


@pytest.fixture(scope="module")
def mixed_scene(tmp_path_factory):
    obj = tmp_path_factory.mktemp("mxu") / "sph.obj"
    _sphere_obj(obj, 24, 15)
    d = {
        "type": "scene",
        "integrator": {"type": "path", "max_depth": 2},
        "sensor": {"type": "perspective", "fov": 45,
                   "to_world": tf.look_at([0, 0, -6], [0, 0, 0], [0, 1, 0]),
                   "film": {"type": "hdrfilm", "width": 8, "height": 8},
                   "sampler": {"type": "independent", "sample_count": 1}},
        "light": {"type": "point", "position": [0, 4, -4],
                  "intensity": {"type": "rgb", "value": 10.0}},
        "floor": {"type": "rectangle",
                  "to_world": tf.translate([0, -2, 0])
                  @ tf.rotate([1, 0, 0], -90) @ tf.scale([4, 4, 1])},
        "bigmesh": {"type": "obj", "filename": str(obj),
                    "to_world": tf.translate([2.0, 0.5, 1.0])
                    @ tf.scale([0.8] * 3)},
        "mover": {"type": "cube",
                  "to_world": AnimatedTransform([
                      (0.0, tf.translate([-1.5, 0, 1]) @ tf.scale([0.5] * 3)
                       @ tf.rotate([0, 1, 0], 10)),
                      (1.0, tf.translate([-1.5, 1.0, 1]) @ tf.scale([0.5] * 3)
                       @ tf.rotate([0, 1, 0], 55))])},
    }
    return mi.load_dict(d).compile()


def _rays(n, seed=7):
    rng = np.random.default_rng(seed)
    o = rng.uniform(-3.0, 3.0, (n, 3))
    o[:, 2] -= 5.0
    target = rng.uniform(-2.0, 2.0, (n, 3))
    dd = target - o
    dd /= np.linalg.norm(dd, axis=1, keepdims=True)
    maxt = np.full(n, np.inf, np.float32)
    maxt[:n // 4] = rng.uniform(3.0, 9.0, n // 4)
    time = rng.uniform(0.0, 1.0, n)
    f32 = lambda a: jnp.asarray(a, jnp.float32)
    return Ray(Vec3(f32(o[:, 0]), f32(o[:, 1]), f32(o[:, 2])),
               Vec3(f32(dd[:, 0]), f32(dd[:, 1]), f32(dd[:, 2])),
               f32(time), f32(maxt))


def test_mxu_closest_hit_and_payload(mixed_scene):
    sa = mixed_scene
    ray = _rays(2048)
    t, prim = intersect_mxu(sa, ray)
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
    for pre in ("gn", "ns"):
        ap = np.stack([getattr(hp, pre + c)[m] for c in "xyz"], -1)
        ar = np.stack([getattr(hr, pre + c)[m] for c in "xyz"], -1)
        ap /= np.maximum(np.linalg.norm(ap, axis=-1, keepdims=True), 1e-20)
        ar /= np.maximum(np.linalg.norm(ar, axis=-1, keepdims=True), 1e-20)
        assert ((ap * ar).sum(-1) > 1.0 - 1e-5).all()


def test_mxu_any_hit(mixed_scene):
    sa = mixed_scene
    ray = _rays(2048, seed=11)
    _, prim = intersect_mxu(sa, ray, any_hit=True)
    hr = jax.tree_util.tree_map(np.asarray, _hit_reference(sa, ray))
    assert (np.asarray(prim >= 0) == (hr.prim >= 0)).all()


def test_mxu_full_render_matches_v1(mixed_scene, monkeypatch):
    """End-to-end: a render routed through the MXU kernel matches the v1
    stream kernel (both large-scene paths force STREAM_THRESHOLD down)."""
    import mitsuba3dopplertof_tpu.ops.intersect_kernel as ik
    monkeypatch.setattr(ik, "STREAM_THRESHOLD", 8)
    from tests.test_mxu_kernel import _rays  # noqa: F401 (self-import ok)
    ray = _rays(512, seed=3)
    sa = mixed_scene
    monkeypatch.setenv("MI_STREAM_KERNEL", "v1")
    h1 = jax.tree_util.tree_map(np.asarray, ik.intersect_pallas(sa, ray))
    monkeypatch.setenv("MI_STREAM_KERNEL", "mxu")
    h2 = jax.tree_util.tree_map(np.asarray, ik.intersect_pallas(sa, ray))
    both_miss = (h1.prim < 0) & (h2.prim < 0)
    assert (np.isclose(h1.t, h2.t, rtol=2e-4, atol=1e-5) | both_miss).all()
    assert ((h1.prim < 0) == (h2.prim < 0)).all()
