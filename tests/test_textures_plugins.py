"""`volume` texture and per-vertex `mesh_attribute` (VERDICT round-1
item 6; reference src/textures/volume.cpp, mesh_attribute.cpp)."""

import numpy as np
import pytest

import mitsuba3dopplertof_tpu as mi
from mitsuba3dopplertof_tpu.core import transform as tf


def _base(extra):
    d = {
        "type": "scene",
        "integrator": {"type": "path", "max_depth": 2},
        "sensor": {"type": "perspective", "fov": 45,
                   "to_world": tf.look_at([0, 0, -3], [0, 0, 0], [0, 1, 0]),
                   "film": {"type": "hdrfilm", "width": 32, "height": 32,
                            "rfilter": {"type": "box"}},
                   "sampler": {"type": "independent", "sample_count": 32}},
        "light": {"type": "point", "position": [0, 0, -3],
                  "intensity": {"type": "rgb", "value": 20.0}},
    }
    d.update(extra)
    return mi.load_dict(d)


def _write_vol(path, grid):
    """Minimal Mitsuba .vol (format 3, float32)."""
    import struct
    nz, ny, nx, ch = grid.shape
    with open(path, "wb") as f:
        f.write(b"VOL")
        f.write(bytes([3]))
        f.write(struct.pack("<iiiii", 1, nx, ny, nz, ch))
        f.write(struct.pack("<ffffff", 0, 0, 0, 1, 1, 1))
        f.write(np.asarray(grid, "<f4").tobytes())


def test_volume_texture_varies_with_position(tmp_path):
    """A gridvolume-backed reflectance texture must produce spatially
    varying shading across the receiving plane (volume.cpp eval at the
    world hit position)."""
    grid = np.zeros((1, 1, 4, 1), np.float32)
    grid[0, 0, :, 0] = [0.05, 0.05, 0.9, 0.9]    # dark left, bright right
    vol = tmp_path / "g.vol"
    _write_vol(str(vol), grid)
    sc = _base({
        "wall": {"type": "rectangle",
                 "to_world": tf.rotate([0, 1, 0], 180) @ tf.scale([1.5, 1.5, 1]),
                 "bsdf": {"type": "diffuse",
                          "reflectance": {
                              "type": "volume",
                              "volume": {"type": "gridvolume",
                                         "filename": str(vol),
                                         "to_world": tf.translate([-1.5, -1.5, -0.5])
                                         @ tf.scale([3, 3, 1.0])}}}},
    })
    img = np.asarray(mi.render(sc, seed=0))[..., :3]
    assert np.isfinite(img).all()
    left = img[:, : img.shape[1] // 4].mean()
    right = img[:, -img.shape[1] // 4:].mean()
    lo, hi = sorted((left, right))
    assert hi > 4.0 * max(lo, 1e-6), (left, right)


def test_volume_texture_constvolume_matches_constant(tmp_path):
    sc_v = _base({
        "wall": {"type": "rectangle",
                 "to_world": tf.rotate([0, 1, 0], 180),
                 "bsdf": {"type": "diffuse",
                          "reflectance": {
                              "type": "volume",
                              "volume": {"type": "constvolume",
                                         "value": 0.6}}}},
    })
    sc_c = _base({
        "wall": {"type": "rectangle",
                 "to_world": tf.rotate([0, 1, 0], 180),
                 "bsdf": {"type": "diffuse",
                          "reflectance": {"type": "rgb", "value": 0.6}}},
    })
    a = np.asarray(mi.render(sc_v, seed=0))[..., :3]
    b = np.asarray(mi.render(sc_c, seed=0))[..., :3]
    assert np.allclose(a, b, atol=1e-5), np.abs(a - b).max()


def _ply_with_colors(path):
    """A quad (two triangles), left vertices red, right vertices green."""
    txt = """ply
format ascii 1.0
element vertex 4
property float x
property float y
property float z
property uchar red
property uchar green
property uchar blue
element face 2
property list uchar int vertex_indices
end_header
-1 -1 0 255 0 0
1 -1 0 0 255 0
1 1 0 0 255 0
-1 1 0 255 0 0
3 0 1 2
3 0 2 3
"""
    path.write_text(txt)


def test_mesh_attribute_vertex_colors(tmp_path):
    """PLY vertex colors interpolate barycentrically across the surface
    (mesh_attribute.cpp): the left half renders red, the right green."""
    ply = tmp_path / "quad.ply"
    _ply_with_colors(ply)
    sc = _base({
        "wall": {"type": "ply", "filename": str(ply),
                 "to_world": tf.rotate([0, 1, 0], 180),
                 "bsdf": {"type": "diffuse",
                          "reflectance": {"type": "mesh_attribute",
                                          "name": "vertex_color"}}},
    })
    img = np.asarray(mi.render(sc, seed=0))[..., :3]
    assert np.isfinite(img).all()
    q = img.shape[1] // 4
    left = img[:, :q].reshape(-1, 3).mean(axis=0)
    right = img[:, -q:].reshape(-1, 3).mean(axis=0)
    # screen x may be mirrored: one side red-dominant, the other green
    sides = sorted([left, right], key=lambda c: c[0])
    green_side, red_side = sides[0], sides[1]
    assert red_side[0] > 3.0 * max(red_side[1], 1e-6), red_side
    assert green_side[1] > 3.0 * max(green_side[0], 1e-6), green_side


def test_mesh_attribute_scale(tmp_path):
    ply = tmp_path / "quad.ply"
    _ply_with_colors(ply)

    def render_with_scale(s):
        sc = _base({
            "wall": {"type": "ply", "filename": str(ply),
                 "to_world": tf.rotate([0, 1, 0], 180),
                     "bsdf": {"type": "diffuse",
                              "reflectance": {"type": "mesh_attribute",
                                              "name": "vertex_color",
                                              "scale": s}}},
        })
        return np.asarray(mi.render(sc, seed=0))[..., :3].mean()
    m1 = render_with_scale(1.0)
    m05 = render_with_scale(0.5)
    assert abs(m05 - 0.5 * m1) < 0.05 * m1, (m1, m05)
