"""Heterogeneous (gridvolume) media: delta-tracking free flight + ratio-
tracking shadow transmittance (reference src/media/heterogeneous.cpp,
volpath.cpp medium sampling)."""

import os
import struct

import numpy as np
import pytest

import mitsuba3dopplertof_tpu as mi
from mitsuba3dopplertof_tpu.core import transform as tf


def _write_vol(path, grid):
    nz, ny, nx = grid.shape
    with open(path, "wb") as f:
        f.write(b"VOL")
        f.write(bytes([3]))
        f.write(struct.pack("<iiiii", 1, nx, ny, nz, 1))
        f.write(struct.pack("<6f", 0, 0, 0, 1, 1, 1))
        f.write(np.ascontiguousarray(grid, np.float32).tobytes())


@pytest.fixture(scope="module")
def vols(tmp_path_factory):
    d = tmp_path_factory.mktemp("vols")
    const = str(d / "const.vol")
    grad = str(d / "grad.vol")
    _write_vol(const, np.ones((8, 8, 8), np.float32))
    zz = np.linspace(0.2, 1.8, 16)[:, None, None] * np.ones((16, 16, 16))
    _write_vol(grad, zz.astype(np.float32))
    return const, grad


def _transmission_scene(volfile, scale, albedo=0.0, spp=512, env=None):
    d = {
        "type": "scene",
        "box": {"type": "cube", "bsdf": {"type": "null"},
                "interior": {
                    "type": "heterogeneous",
                    "sigma_t": {"type": "gridvolume", "filename": volfile,
                                "to_world": (tf.translate([-1, -1, -1])
                                             @ tf.scale([2, 2, 2]))},
                    "albedo": albedo, "scale": scale}},
        "sensor": {"type": "radiancemeter",
                   "to_world": tf.look_at([0, 0, -4], [0, 0, 0], [0, 1, 0]),
                   "film": {"type": "hdrfilm", "width": 1, "height": 1},
                   "sampler": {"type": "independent", "sample_count": spp}},
        "integrator": {"type": "volpath", "max_depth": 64},
    }
    if env:
        d["env"] = {"type": "constant",
                    "radiance": {"type": "rgb", "value": env}}
    else:
        d["light"] = {"type": "rectangle",
                      "to_world": (tf.translate([0, 0, 4.0])
                                   @ tf.rotate([1, 0, 0], 180)),
                      "emitter": {"type": "area",
                                  "radiance": {"type": "rgb", "value": 1.0}}}
    return mi.load_dict(d)


def test_constant_grid_matches_beer_lambert(vols):
    """A constant-density grid must reproduce the homogeneous closed form
    exp(-scale * L) through the 2-unit cube (delta tracking unbiasedness)."""
    const, _ = vols
    for scale in (0.5, 1.5):
        sc = _transmission_scene(const, scale, spp=4096)
        tr = float(np.asarray(sc.integrator.render(sc, seed=0,
                                                   spp=4096)).ravel()[0])
        expect = np.exp(-2.0 * scale)
        sigma = np.sqrt(expect * (1 - expect) / 4096) * 4  # 4-sigma
        assert abs(tr - expect) < max(sigma, 0.01), (scale, tr, expect)


def test_gradient_grid_transmission(vols):
    """Linear density gradient: optical depth = scale * integral of the
    gradient along the chord (checks the trilinear grid lookup + the
    world->grid transform)."""
    _, grad = vols
    sc = _transmission_scene(grad, 1.0, spp=4096)
    tr = float(np.asarray(sc.integrator.render(sc, seed=0,
                                               spp=4096)).ravel()[0])
    expect = np.exp(-2.0)     # mean density 1.0 over the [-1,1] chord
    assert abs(tr - expect) < 0.02, (tr, expect)


def test_heterogeneous_furnace(vols):
    """Scattering furnace: albedo-1 heterogeneous medium inside a constant
    unit environment returns exactly 1 (energy conservation through delta
    tracking + phase sampling + ratio-tracked NEE)."""
    const, _ = vols
    sc = _transmission_scene(const, 1.0, albedo=1.0, env=1.0, spp=2048)
    val = float(np.asarray(sc.integrator.render(sc, seed=0,
                                                spp=2048)).ravel()[0])
    assert abs(val - 1.0) < 0.02, val


def test_nearest_filter_quantizes_density(vols):
    """filter_type="nearest" (gridvolume.cpp): a step grid half 0 / half
    max is seen exactly under nearest filtering — the camera ray through
    the zero half is unattenuated, the other half sees the full optical
    depth. Trilinear would blur the boundary; a ray fully inside the zero
    half is identical either way."""
    import struct as _struct
    d = os.path.dirname(vols[0])
    step = os.path.join(d, "step.vol")
    g = np.zeros((8, 8, 8), np.float32)
    g[:, :, 4:] = 2.0                  # +x half dense (x fastest axis)
    _write_vol(step, g)

    def trans(filt, x):
        sc = mi.load_dict({
            "type": "scene",
            "box": {"type": "cube", "bsdf": {"type": "null"},
                    "interior": {
                        "type": "heterogeneous",
                        "sigma_t": {"type": "gridvolume", "filename": step,
                                    "filter_type": filt,
                                    "to_world": (tf.translate([-1, -1, -1])
                                                 @ tf.scale([2, 2, 2]))},
                        "albedo": 0.0, "scale": 1.0}},
            "sensor": {"type": "radiancemeter",
                       "to_world": tf.look_at([x, 0, -4], [x, 0, 0],
                                              [0, 1, 0]),
                       "film": {"type": "hdrfilm", "width": 1, "height": 1},
                       "sampler": {"type": "independent",
                                   "sample_count": 2048}},
            "integrator": {"type": "volpath", "max_depth": 64},
            "light": {"type": "rectangle",
                      "to_world": (tf.translate([0, 0, 4.0])
                                   @ tf.rotate([1, 0, 0], 180)
                                   @ tf.scale([4, 4, 1])),
                      "emitter": {"type": "area",
                                  "radiance": {"type": "rgb", "value": 1.0}}}})
        return float(np.asarray(sc.integrator.render(
            sc, seed=0, spp=2048)).ravel()[0])

    # deep inside the zero half: fully transparent under nearest
    t0 = trans("nearest", -0.75)
    assert abs(t0 - 1.0) < 0.02, t0
    # deep inside the dense half: exp(-2*2) over the 2-unit chord
    t1 = trans("nearest", 0.75)
    assert abs(t1 - np.exp(-4.0)) < 0.05, t1
    # trilinear at the same x blurs with the neighbor texel: different
    # at the step boundary (world x=0 -> grid x=4.0 texels): trilinear
    # blends to half density, nearest snaps to the dense texel
    t1_tri = trans("trilinear", 0.0)
    t1_near = trans("nearest", 0.0)
    assert t1_tri > t1_near + 0.02, (t1_tri, t1_near)


def test_gridvolume_bad_filter_raises(vols):
    with pytest.raises(RuntimeError, match="filter_type"):
        mi.load_dict({"type": "gridvolume", "filename": vols[0],
                      "filter_type": "cubic"})
