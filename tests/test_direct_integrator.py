"""direct integrator N/M sample splits (reference direct.cpp:99-211):
every (emitter_samples, bsdf_samples) split is an unbiased estimator of
the same integral, so image means agree; strategy-only modes work too."""

import numpy as np
import pytest

import mitsuba3dopplertof_tpu as mi
from mitsuba3dopplertof_tpu.core import transform as tf


def _render(spp=128, **integ):
    d = {"type": "scene",
         "integrator": dict(type="direct", **integ),
         "sensor": {"type": "perspective", "fov": 45,
                    "to_world": tf.look_at([0, 1, -3], [0, 0, 0], [0, 1, 0]),
                    "film": {"type": "hdrfilm", "width": 12, "height": 12,
                             "rfilter": {"type": "box"}},
                    "sampler": {"type": "independent", "sample_count": spp}},
         "floor": {"type": "rectangle",
                   "to_world": tf.rotate([1, 0, 0], -90) @ tf.scale([3, 3, 1]),
                   "bsdf": {"type": "roughplastic", "alpha": 0.2}},
         "light": {"type": "rectangle",
                   "to_world": tf.translate([0, 2, 0])
                   @ tf.rotate([1, 0, 0], 90) @ tf.scale([0.5, 0.5, 1]),
                   "emitter": {"type": "area",
                               "radiance": {"type": "rgb", "value": 8.0}}}}
    sc = mi.load_dict(d)
    return np.asarray(mi.render(sc, spp=spp, seed=0))


@pytest.mark.parametrize("kw", [
    dict(emitter_samples=4, bsdf_samples=1),
    dict(emitter_samples=1, bsdf_samples=4),
    dict(emitter_samples=2, bsdf_samples=2),
    dict(shading_samples=3),
    dict(emitter_samples=0, bsdf_samples=2),   # pure BSDF strategy
    dict(emitter_samples=2, bsdf_samples=0),   # pure NEE strategy
])
def test_direct_splits_agree(kw):
    base = _render()
    img = _render(**kw)
    rel = abs(float(img.mean()) - float(base.mean())) / float(base.mean())
    assert rel < 0.1, (kw, img.mean(), base.mean())


def test_direct_zero_samples_rejected():
    with pytest.raises(RuntimeError):
        _render(emitter_samples=0, bsdf_samples=0)
