"""Hero validation scene (utils/hero_scene.py) + the common_configs port
(reference doppler_tutorials/src/utils/common_configs.py)."""

import os
import hashlib
import tempfile

import numpy as np
import pytest

import mitsuba3dopplertof_tpu as mi
from mitsuba3dopplertof_tpu.utils.common_configs import (
    get_animation_scene_configs, get_scene_configs, load_scene)
from mitsuba3dopplertof_tpu.utils.hero_scene import (
    hero_assets, hero_scene_dict)


def test_scene_config_tables_match_reference():
    """Tables must match common_configs.py:1-66 verbatim."""
    sc = get_scene_configs()
    assert sc["cornell-box"] == {"max_depth": 4, "reference_spp": 4096 * 32,
                                 "spp": 1024}
    assert sc["veach-ajar"]["max_depth"] == 8
    assert sc["kitchen"]["max_depth"] == 8
    assert set(sc) == {"cornell-box", "living-room-2", "veach-ajar",
                       "soccer-ball", "bedroom", "kitchen", "hero"}
    an = get_animation_scene_configs()
    assert an["falling_box"]["total_spp"] == 1024 * 4
    assert an["staircase2"]["animation_length"] == 100
    assert all(v["w_g"] == 150 for v in an.values())


def test_unbundled_scene_errors_clearly(monkeypatch):
    monkeypatch.delenv("MI_SCENE_DIR", raising=False)
    with pytest.raises(FileNotFoundError, match="MI_SCENE_DIR"):
        load_scene("kitchen")
    with pytest.raises(ValueError, match="unknown experiment scene"):
        load_scene("no-such-scene")


def test_hero_assets_deterministic():
    """Procedural assets must be bit-identical across generations."""
    def digest(d):
        paths = hero_assets(cache_dir=d)
        h = hashlib.sha256()
        for k in sorted(paths):
            with open(paths[k], "rb") as f:
                h.update(f.read())
        return h.hexdigest()

    with tempfile.TemporaryDirectory() as d1, \
            tempfile.TemporaryDirectory() as d2:
        assert digest(d1) == digest(d2)


def test_hero_scene_dict_contents():
    d = hero_scene_dict(spp=8, res=32)
    assert d["integrator"]["type"] == "dopplertofpath"
    assert d["sensor"]["sampler"]["type"] == "correlated"
    # two animated instances, one heterogeneous medium, env + area light
    from mitsuba3dopplertof_tpu.core.transform import AnimatedTransform
    assert isinstance(d["knot"]["to_world"], AnimatedTransform)
    assert isinstance(d["ball"]["to_world"], AnimatedTransform)
    assert d["smoke"]["interior"]["type"] == "heterogeneous"
    assert d["env"]["type"] == "envmap"
    assert d["lamp"]["emitter"]["type"] == "area"


@pytest.mark.slow
def test_hero_scene_renders():
    """End-to-end: the full-feature scene must load, compile and produce a
    finite, structured Doppler image at toy resolution."""
    sc = load_scene("hero", res=16, spp=2, max_depth=3)
    img = np.asarray(mi.render(sc, seed=0, spp=2))
    assert img.shape == (16, 16, 3)
    assert np.isfinite(img).all()
    assert (np.abs(img) > 0).mean() > 0.5   # most pixels carry signal


@pytest.mark.slow
def test_hero_smoke_is_live_under_volpath():
    """dopplertofpath is surface-only (parity with the reference,
    dopplertofpath.cpp:82 ignores the medium) — the smoke column must be
    radiometrically ACTIVE under volpath: removing it changes the image."""
    base = hero_scene_dict(spp=4, res=16,
                           integrator={"type": "volpath", "max_depth": 4})
    nosmoke = hero_scene_dict(spp=4, res=16,
                              integrator={"type": "volpath", "max_depth": 4})
    del nosmoke["smoke"]
    a = np.asarray(mi.render(mi.load_dict(base), seed=0, spp=4))
    b = np.asarray(mi.render(mi.load_dict(nosmoke), seed=0, spp=4))
    assert np.isfinite(a).all() and np.isfinite(b).all()
    # same seed, same sampler: any difference is the medium's transport
    rel = np.abs(a - b).mean() / max(b.mean(), 1e-9)
    assert rel > 1e-3, rel
