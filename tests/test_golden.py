"""Golden-image regression (the reference's test_renders.py role,
SURVEY.md §4): a committed low-spp render of the canonical scene guards the
whole pipeline (parsing, sampling, motion blur, modulation weighting, film)
against semantic drift. CPU renders are deterministic given (seed, spp)."""

import os

import numpy as np

import mitsuba3dopplertof_tpu as mi

GOLDEN = os.path.join(os.path.dirname(__file__), "data",
                      "golden_canonical_16x16_32spp.npy")


def test_canonical_scene_golden():
    ref = np.load(GOLDEN)
    scene = mi.load_file("/root/reference/configs_example/scene.xml",
                         resx=16, resy=16)
    img = np.asarray(mi.render(scene, spp=32, seed=0))
    assert img.shape == ref.shape
    # identical sampling decisions; tolerance covers compiler fastmath drift
    assert np.allclose(img, ref, atol=2e-6, rtol=1e-4), \
        float(np.abs(img - ref).max())
