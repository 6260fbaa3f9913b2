"""Pallas TPU hot-path parity suite (VERDICT round-1 item 2).

The production chip path (`ops.intersect_kernel.intersect_pallas`,
`ops.intersect_stream.intersect_static_stream`, `ray_test_pallas`) is the
Pallas analog of the reference's OptiX hitgroups (scene_optix.inl:552-570);
on CPU the renderer routes around it, so these tests exercise the kernels
*directly* in Pallas interpret mode against the scanned XLA oracle
(`render.scene._hit_reference` — the "scalar variant" of SURVEY.md §4).
A Pallas regression (slot re-basing, stream merge, sphere handling,
animated-instance transforms) now fails CI instead of shipping silently.

Intent mirrors reference src/render/tests/test_renders.py:130-233 (every
backend combination regression-tested against a slower oracle).
"""

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
from mitsuba3dopplertof_tpu.ops import intersect_kernel as ik


def _grid_mesh_obj(tmp_path, name, nu, nv, radius=1.0):
    """UV-sphere OBJ with 2*nu*nv triangles (with normals + uvs)."""
    lines = []
    for j in range(nv + 1):
        for i in range(nu):
            th, ph = np.pi * j / nv, 2 * np.pi * i / nu
            x = radius * np.sin(th) * np.cos(ph)
            y = radius * np.cos(th)
            z = radius * np.sin(th) * np.sin(ph)
            lines.append(f"v {x:.6f} {y:.6f} {z:.6f}")
            lines.append(f"vn {x:.6f} {y:.6f} {z:.6f}")
            lines.append(f"vt {i/nu:.6f} {j/nv:.6f}")

    def vid(i, j):
        return j * nu + (i % nu) + 1

    for j in range(nv):
        for i in range(nu):
            a, b, c, d = vid(i, j), vid(i + 1, j), vid(i + 1, j + 1), vid(i, j + 1)
            lines.append(f"f {a}/{a}/{a} {b}/{b}/{b} {c}/{c}/{c}")
            lines.append(f"f {a}/{a}/{a} {c}/{c}/{c} {d}/{d}/{d}")
    p = tmp_path / f"{name}.obj"
    p.write_text("\n".join(lines))
    return str(p)


def _anim(m_from, m_to, t0=0.0, t1=1.0):
    return AnimatedTransform([(t0, m_from), (t1, m_to)])


def _scene(tmp_path, n_static="small", animated=True, spheres=True):
    d = {
        "type": "scene",
        "integrator": {"type": "path", "max_depth": 2},
        "sensor": {"type": "perspective", "fov": 45,
                   "to_world": tf.look_at([0, 0, -6], [0, 0, 0], [0, 1, 0]),
                   "film": {"type": "hdrfilm", "width": 8, "height": 8},
                   "sampler": {"type": "independent", "sample_count": 1}},
        "light": {"type": "point", "position": [0, 4, -4],
                  "intensity": {"type": "rgb", "value": 10.0}},
        # two static rectangles at different depths
        "floor": {"type": "rectangle",
                  "to_world": tf.translate([0, -2, 0]) @ tf.rotate([1, 0, 0], -90)
                  @ tf.scale([4, 4, 1])},
        "back": {"type": "rectangle", "to_world": tf.translate([0, 0, 4])
                 @ tf.scale([4, 4, 1])},
    }
    if n_static == "big":
        # 720 triangles > STREAM_THRESHOLD=192: streamed static kernel
        d["bigmesh"] = {"type": "obj",
                        "filename": _grid_mesh_obj(tmp_path, "uvs", 24, 15),
                        "to_world": tf.translate([2.0, 0.5, 1.0])
                        @ tf.scale([0.8, 0.8, 0.8])}
    if animated:
        d["mover"] = {"type": "cube",
                      "to_world": _anim(
                          tf.translate([-1.5, 0, 1]) @ tf.scale([0.5] * 3)
                          @ tf.rotate([0, 1, 0], 10),
                          tf.translate([-1.5, 1.0, 1]) @ tf.scale([0.5] * 3)
                          @ tf.rotate([0, 1, 0], 55))}
        d["mover2"] = {"type": "cube",
                       "to_world": _anim(
                           tf.translate([1.2, -0.5, 0]) @ tf.scale([0.4] * 3),
                           tf.translate([1.2, -0.5, 2]) @ tf.scale([0.4] * 3),
                           t0=0.2, t1=0.8)}
    if spheres:
        d["ball"] = {"type": "sphere", "center": [0.0, 1.5, 1.0],
                     "radius": 0.6}
        d["movingball"] = {"type": "sphere",
                           "to_world": _anim(
                               tf.translate([0.5, -1.0, 0.5])
                               @ tf.scale([0.45] * 3),
                               tf.translate([-0.5, -1.0, 0.5])
                               @ tf.scale([0.45] * 3))}
    return mi.load_dict(d)


def _rays(n, seed, finite_frac=0.25):
    """Random rays from a shell around the scene, random times in [0,1]."""
    rng = np.random.default_rng(seed)
    o = rng.uniform(-3.0, 3.0, (n, 3))
    o[:, 2] -= 5.0
    target = rng.uniform(-2.0, 2.0, (n, 3))
    dd = target - o
    dd /= np.linalg.norm(dd, axis=1, keepdims=True)
    maxt = np.full(n, np.inf, np.float32)
    k = int(n * finite_frac)
    maxt[:k] = rng.uniform(3.0, 9.0, k)
    time = rng.uniform(0.0, 1.0, n)
    f32 = lambda a: jnp.asarray(a, jnp.float32)
    return Ray(Vec3(f32(o[:, 0]), f32(o[:, 1]), f32(o[:, 2])),
               Vec3(f32(dd[:, 0]), f32(dd[:, 1]), f32(dd[:, 2])),
               f32(time), f32(maxt))


def _assert_hits_match(hp, hr, label, rtol=2e-4):
    hp = jax.tree_util.tree_map(np.asarray, hp)
    hr = jax.tree_util.tree_map(np.asarray, hr)
    both_miss = (hp.prim < 0) & (hr.prim < 0)
    # near-ties between two primitives may legitimately resolve differently
    # (different summation order); tolerate them only when t agrees
    t_close = np.isclose(hp.t, hr.t, rtol=rtol, atol=1e-5) | both_miss
    assert t_close.mean() == 1.0, (
        f"{label}: t mismatch on {(~t_close).sum()} lanes; "
        f"worst {np.nanmax(np.abs(np.where(np.isfinite(hp.t), hp.t, 0) - np.where(np.isfinite(hr.t), hr.t, 0)))}")
    same_prim = (hp.prim == hr.prim)
    # where the same primitive wins, every payload field must agree
    m = same_prim & ~both_miss
    assert (hp.inst[m] == hr.inst[m]).all(), label
    for f in ("u", "v", "uv_u", "uv_v"):
        a, b = getattr(hp, f)[m], getattr(hr, f)[m]
        assert np.allclose(a, b, rtol=1e-3, atol=1e-4), (label, f)
    # normals: compare directions (unnormalized magnitudes may differ by
    # the det factor between inv-transpose conventions)
    for pre in ("gn", "ns"):
        ap = np.stack([getattr(hp, pre + c)[m] for c in "xyz"], -1)
        ar = np.stack([getattr(hr, pre + c)[m] for c in "xyz"], -1)
        ap /= np.maximum(np.linalg.norm(ap, axis=-1, keepdims=True), 1e-20)
        ar /= np.maximum(np.linalg.norm(ar, axis=-1, keepdims=True), 1e-20)
        cos = (ap * ar).sum(-1)
        assert (cos > 1.0 - 1e-4).all(), (label, pre, cos.min())
    # prim mismatches allowed only at genuine near-ties
    bad = ~same_prim & ~both_miss
    if bad.any():
        assert np.isclose(hp.t[bad], hr.t[bad], rtol=1e-3).all(), (
            label, "prim mismatch at non-tie", bad.sum())


@pytest.mark.parametrize("animated,spheres", [
    (False, False), (True, False), (False, True), (True, True)])
def test_unrolled_kernel_matches_oracle(tmp_path, animated, spheres):
    """intersect_pallas (unrolled regime) == _hit_reference, all payloads."""
    sa = _scene(tmp_path, "small", animated, spheres).compile()
    assert sa.n_static_tris <= ik.STREAM_THRESHOLD and sa.bvh is None
    ray = _rays(1024, seed=7)
    hp = ik.intersect_pallas(sa, ray)
    hr = _hit_reference(sa, ray)
    _assert_hits_match(hp, hr, f"unrolled anim={animated} sph={spheres}")
    occ_p = np.asarray(ik.ray_test_pallas(sa, ray))
    occ_r = np.asarray(hr.prim) >= 0
    assert (occ_p == occ_r).all()


def test_streamed_kernel_matches_oracle(tmp_path):
    """Streamed-static + dynamic merge regime (slot re-basing, sphere slots)."""
    sa = _scene(tmp_path, "big", animated=True, spheres=True).compile()
    assert sa.n_static_tris > ik.STREAM_THRESHOLD and sa.bvh is None
    ray = _rays(1024, seed=11)
    hp = ik.intersect_pallas(sa, ray)
    hr = _hit_reference(sa, ray)
    _assert_hits_match(hp, hr, "streamed")
    occ_p = np.asarray(ik.ray_test_pallas(sa, ray))
    occ_r = np.asarray(hr.prim) >= 0
    assert (occ_p == occ_r).all()


def test_forced_stream_threshold_matches(tmp_path, monkeypatch):
    """Same small scene through BOTH threshold regimes gives the same hits."""
    sa = _scene(tmp_path, "small", animated=True, spheres=True).compile()
    ray = _rays(512, seed=3)
    h_unrolled = jax.tree_util.tree_map(np.asarray,
                                        ik.intersect_pallas(sa, ray))
    monkeypatch.setattr(ik, "STREAM_THRESHOLD", 4)
    h_streamed = jax.tree_util.tree_map(np.asarray,
                                        ik.intersect_pallas(sa, ray))
    _assert_hits_match(h_streamed, h_unrolled, "regime cross-check")
    assert (h_streamed.prim == h_unrolled.prim).all()


def test_maxt_and_time_clamp_semantics(tmp_path):
    """Rays beyond maxt miss; ray time clamps to the keyframe window
    (reference transform.h:461-466 clamp)."""
    sa = _scene(tmp_path, "small", animated=True, spheres=False).compile()
    n = 256
    rng = np.random.default_rng(5)
    f32 = lambda a: jnp.asarray(a, jnp.float32)
    o = np.tile(np.array([[-1.5, 0.0, -6.0]]), (n, 1))
    d = np.tile(np.array([[0.0, 0.0, 1.0]]), (n, 1))
    times = rng.uniform(-1.0, 2.0, n)       # outside [0,1] must clamp
    ray = Ray(Vec3(f32(o[:, 0]), f32(o[:, 1]), f32(o[:, 2])),
              Vec3(f32(d[:, 0]), f32(d[:, 1]), f32(d[:, 2])),
              f32(times), f32(np.full(n, np.inf)))
    hp = ik.intersect_pallas(sa, ray)
    hr = _hit_reference(sa, ray)
    _assert_hits_match(hp, hr, "time clamp")
    # maxt shorter than the first hit -> miss on both paths
    short = ray._replace(maxt=f32(np.full(n, 1e-3)))
    assert (np.asarray(ik.intersect_pallas(sa, short).prim) == -1).all()
    assert not np.asarray(ik.ray_test_pallas(sa, short)).any()


def test_ray_binning_restore_identity():
    """ops.ray_binning.binned is a pure permutation: run() outputs computed
    on the sorted wavefront come back in original lane order."""
    from types import SimpleNamespace
    from mitsuba3dopplertof_tpu.ops.ray_binning import binned
    n = 4096
    rng = np.random.default_rng(0)
    f32 = lambda a: jnp.asarray(a, jnp.float32)
    o = rng.uniform(-2, 2, (n, 3))
    d = rng.normal(size=(n, 3))
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    ray = Ray(Vec3(*(f32(o[:, i]) for i in range(3))),
              Vec3(*(f32(d[:, i]) for i in range(3))),
              f32(rng.uniform(0, 1, n)), f32(np.full(n, np.inf)))
    active = jnp.asarray(rng.random(n) < 0.7)
    # truthy anim_ranges: time rides in the sort (static scenes drop it
    # because the kernel never reads it)
    sa = SimpleNamespace(chunk_aabb=jnp.asarray(
        np.array([[-2, -2, -2, 2, 2, 2]], np.float32)), anim_ranges=(0,))
    outs = binned(sa, ray, active,
                  lambda r: [r.o.x, r.d.y * 2.0,
                             (r.time > 0.5).astype(jnp.int32)])
    np.testing.assert_array_equal(np.asarray(outs[0]), np.asarray(ray.o.x))
    np.testing.assert_allclose(np.asarray(outs[1]),
                               np.asarray(ray.d.y) * 2.0, rtol=1e-6)
    np.testing.assert_array_equal(
        np.asarray(outs[2]), (np.asarray(ray.time) > 0.5).astype(np.int32))


def test_binned_dispatch_matches_oracle(tmp_path):
    """With a wavefront larger than one lane block, intersect_pallas routes
    through ray binning (sort -> streamed kernel -> restore); results must
    equal the oracle, and lanes deadened by `active` must report misses."""
    from mitsuba3dopplertof_tpu.ops import ray_binning as rb
    from mitsuba3dopplertof_tpu.ops.intersect_stream import ANIM_ROWS
    # two big meshes push past the 1024-triangle binning gate
    d = {
        "type": "scene",
        "m1": {"type": "obj", "filename": _grid_mesh_obj(tmp_path, "uvs2", 24, 15),
               "to_world": tf.translate([2.0, 0.5, 1.0]) @ tf.scale([0.8] * 3)},
        "m2": {"type": "obj", "filename": _grid_mesh_obj(tmp_path, "uvs3", 24, 15),
               "to_world": tf.translate([-2.0, -0.5, 1.5]) @ tf.scale([0.7] * 3)},
        "mover": {"type": "cube",
                  "to_world": _anim(
                      tf.translate([-1.5, 0, 1]) @ tf.scale([0.5] * 3),
                      tf.translate([-1.5, 1.0, 1]) @ tf.scale([0.5] * 3))},
        "ball": {"type": "sphere", "center": [0.0, 1.5, 1.0], "radius": 0.6},
        "light": {"type": "point", "position": [0, 4, -4],
                  "intensity": {"type": "rgb", "value": 10.0}},
        "sensor": {"type": "perspective", "fov": 45,
                   "to_world": tf.look_at([0, 0, -6], [0, 0, 0], [0, 1, 0]),
                   "film": {"type": "hdrfilm", "width": 8, "height": 8},
                   "sampler": {"type": "independent", "sample_count": 1}},
        "integrator": {"type": "path", "max_depth": 2},
    }
    sa = mi.load_dict(d).compile()
    block = ANIM_ROWS * ik.LANES
    n = 2 * block + 511          # > one block and not block-aligned
    assert rb.should_bin(sa, n, ANIM_ROWS, ik.LANES)
    ray = _rays(n, seed=13)
    rng = np.random.default_rng(17)
    active = jnp.asarray(rng.random(n) < 0.8)
    hp = jax.tree_util.tree_map(np.asarray,
                                ik.intersect_pallas(sa, ray, active))
    hr = jax.tree_util.tree_map(np.asarray, _hit_reference(sa, ray))
    act = np.asarray(active)
    # triangle hits on dead lanes are suppressed (sphere merge is unsorted
    # and unmasked, same as the unbinned path — build_si masks by active)
    sph_base = sa.n_static_tris + sa.n_anim_tris
    dead_tri = (~act) & (hp.prim >= 0) & (hp.prim < sph_base)
    assert not dead_tri.any()
    sel = lambda h: jax.tree_util.tree_map(lambda a: a[act], h)
    _assert_hits_match(sel(hp), sel(hr), "binned dispatch")
    occ_p = np.asarray(ik.ray_test_pallas(sa, ray, active))
    occ_r = np.asarray(hr.prim) >= 0
    assert (occ_p[act] == occ_r[act]).all()


def test_donation_dropped_when_binning(tmp_path, monkeypatch):
    """The axon PJRT client aborts on donated fori carries in programs that
    also carry variadic sorts; the render loop must drop donation exactly
    when ray binning is engaged (integrators/__init__.py)."""
    from mitsuba3dopplertof_tpu.ops import ray_binning as rb
    from mitsuba3dopplertof_tpu.ops.intersect_kernel import _stream_rows
    small = _scene(tmp_path, "small", animated=True, spheres=False).compile()
    assert not rb.should_bin(small, 1 << 20, _stream_rows(small), ik.LANES)
    d = {
        "type": "scene",
        "m1": {"type": "obj",
               "filename": _grid_mesh_obj(tmp_path, "uvd1", 24, 15)},
        "m2": {"type": "obj",
               "filename": _grid_mesh_obj(tmp_path, "uvd2", 24, 15)},
        "light": {"type": "point", "position": [0, 4, -4],
                  "intensity": {"type": "rgb", "value": 10.0}},
        "sensor": {"type": "perspective", "fov": 45,
                   "to_world": tf.look_at([0, 0, -6], [0, 0, 0], [0, 1, 0]),
                   "film": {"type": "hdrfilm", "width": 8, "height": 8},
                   "sampler": {"type": "independent", "sample_count": 1}},
        "integrator": {"type": "path", "max_depth": 2},
    }
    sa_big = mi.load_dict(d).compile()
    assert rb.should_bin(sa_big, 1 << 20, _stream_rows(sa_big), ik.LANES)
    # and the wavefront must exceed one lane block for binning to engage
    assert not rb.should_bin(sa_big, 1024, _stream_rows(sa_big), ik.LANES)
