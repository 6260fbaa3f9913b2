"""End-to-end experiment harness (the reference doppler_tutorials driver
stack): run_scene_doppler_tof -> Exp0/Exp1/Exp3 grids -> metrics, at toy
scale. This executes the exact API surface reference driver scripts use
(program_runner.py:82-153, main_experiment.py:73-139)."""

import os

import numpy as np
import pytest

import mitsuba3dopplertof_tpu as mi
from mitsuba3dopplertof_tpu.utils.runner import (run_scene_doppler_tof,
                                                 run_scene_velocity,
                                                 run_scene_radiance)
from mitsuba3dopplertof_tpu.utils import experiments as ex


@pytest.fixture(scope="module")
def scene():
    return mi.load_file("/root/reference/configs_example/scene.xml",
                        resx=8, resy=8)


def test_run_scene_doppler_tof_writes_exr(scene, tmp_path):
    img = run_scene_doppler_tof(
        scene=scene, scene_name="canonical", base_dir=str(tmp_path),
        expname="t", hetero_frequency=1.0, hetero_offset=0.0,
        time_sampling_method="antithetic", path_correlation_depth=4,
        total_spp=16)
    img = np.asarray(img)
    assert img.shape[:2] == (8, 8) and np.isfinite(img).all()
    npys = [os.path.join(r, f) for r, _, fs in os.walk(tmp_path)
            for f in fs if f.endswith(".npy")]
    assert npys, "expected a .npy artifact (program_runner.py save format)"
    # exit_if_file_exists: second run returns without re-rendering
    img2 = run_scene_doppler_tof(
        scene=scene, scene_name="canonical", base_dir=str(tmp_path),
        expname="t", hetero_frequency=1.0, hetero_offset=0.0,
        time_sampling_method="antithetic", path_correlation_depth=4,
        total_spp=16, exit_if_file_exists=True)
    assert img2 is None or np.isfinite(np.asarray(img2)).all()


def test_experiment_grids_and_metrics(scene, tmp_path):
    grid = [(1.0, 0.0), (0.0, 0.25)]
    gt = ex.run_ground_truth(scene, str(tmp_path), grid=grid, total_spp=32,
                             exit_if_file_exists=False)
    methods = ex.run_method_grid(scene, str(tmp_path), grid=grid,
                                 total_spp=16, methods=("antithetic",),
                                 correlation_depths=(4,),
                                 exit_if_file_exists=False)
    assert set(gt) == set(grid)
    assert all(np.isfinite(np.asarray(v)).all() for v in gt.values())
    key = ("antithetic", 4, 1.0, 0.0)
    assert key in methods
    m = ex.metrics_vs_gt(
        {k[2:]: v for k, v in methods.items()}, gt)
    assert m and all(np.isfinite(list(v.values())).all()
                     if isinstance(v, dict) else True for v in m.values())


def test_shift_sweep(scene, tmp_path):
    out = ex.run_shift_sweep(scene, str(tmp_path), shifts=[0.0, 0.5],
                             total_spp=16, exit_if_file_exists=False)
    assert set(out) == {0.0, 0.5}


def test_velocity_and_radiance_runners(scene, tmp_path):
    v = run_scene_velocity(scene, "canonical", base_dir=str(tmp_path),
                           total_spp=8, exit_if_file_exists=False)
    r = run_scene_radiance(scene, "canonical", base_dir=str(tmp_path),
                           total_spp=8, exit_if_file_exists=False)
    assert np.isfinite(np.asarray(v)).all()
    assert np.asarray(r).sum() > 0
