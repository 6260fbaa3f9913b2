"""Experiment drivers: API-compatible port of
reference doppler_tutorials/src/program_runner.py (multi-pass rendering with
per-pass seeds, .npy output, exit-if-exists resume — the reference's
de-facto job-level recovery, program_runner.py:110-112).
"""

from __future__ import annotations

import os
from typing import Optional

import numpy as np

from .image import to_tof_image


def render_image_multi_pass(scene, integrator, single_pass_spp: int,
                            total_pass: int, show_progress: bool = False):
    """Average `total_pass` independent renders with seed=i
    (reference program_runner.py:11-31). Seeds are the reproducibility and
    restart mechanism; each pass is deterministic given (scene, seed)."""
    img_sum = None
    for i in range(total_pass):
        img_i = np.asarray(integrator.render(scene, seed=i,
                                             spp=single_pass_spp))
        img_sum = img_i if img_sum is None else img_sum + img_i
        if show_progress:
            print(f"pass {i + 1}/{total_pass}")
    return img_sum / total_pass


def run_scene_doppler_tof(
    scene_name: str = "cornell-box",
    wave_function_type: str = "sinusoidal",
    low_frequency_component_only: bool = True,
    hetero_frequency: float = 1.0,
    hetero_offset: float = 0.0,
    time_sampling_method: str = "antithetic",
    antithetic_shift: Optional[float] = None,
    path_correlation_depth: int = 16,
    exposure_time: float = 0.0015,
    w_g: float = 30,
    max_depth: int = 4,
    use_stratified_sampling_for_each_interval: bool = True,
    exit_if_file_exists: bool = True,
    base_dir: Optional[str] = None,
    expname: Optional[str] = None,
    scene=None,
    scene_xml: Optional[str] = None,
    total_spp: int = 1024,
    output_path: Optional[str] = None,
    **kwargs,
):
    """reference program_runner.py:82-153 — renders one Doppler ToF image
    for a (frequency, offset, sampling-method) configuration."""
    import mitsuba3dopplertof_tpu as mi

    if output_path is None:
        output_path = os.path.join(scene_name, wave_function_type)
    output_path = os.path.join(
        base_dir, output_path,
        "freq_%.3f_offset_%.3f" % (hetero_frequency, hetero_offset))
    output_file = os.path.join(output_path, "%s.npy" % expname)

    if os.path.exists(output_file) and exit_if_file_exists:
        return np.load(output_file)
    os.makedirs(output_path, exist_ok=True)

    if antithetic_shift is None:
        antithetic_shift = 0.5 if time_sampling_method == "antithetic" else 0.0

    if scene is None:
        scene = mi.load_file(scene_xml)

    integrator = mi.load_dict({
        "type": "dopplertofpath",
        "is_doppler_integrator": True,
        "max_depth": max_depth,
        "w_g": w_g,
        "time": exposure_time,
        "hetero_frequency": hetero_frequency,
        "hetero_offset": hetero_offset,
        "antithetic_shift": antithetic_shift,
        "time_sampling_method": time_sampling_method,
        "path_correlation_depth": path_correlation_depth,
        "low_frequency_component_only": low_frequency_component_only,
        "wave_function_type": wave_function_type,
        "use_stratified_sampling_for_each_interval":
            use_stratified_sampling_for_each_interval,
    })

    single_pass_spp = min(1024, total_spp)
    img = render_image_multi_pass(scene, integrator, single_pass_spp,
                                  total_spp // single_pass_spp,
                                  kwargs.get("show_progress", False))
    np.save(output_file, img)
    return img


def run_scene_velocity(scene, scene_name: str, **kwargs):
    """reference program_runner.py:33-55 — ground-truth radial velocity."""
    import mitsuba3dopplertof_tpu as mi

    total_spp = kwargs.get("total_spp", 1024)
    output_path = os.path.join(kwargs.get("base_dir"), scene_name,
                               "velocity_gt")
    os.makedirs(output_path, exist_ok=True)
    out = os.path.join(output_path,
                       "%s.npy" % kwargs.get("output_file_name"))
    if os.path.exists(out) and kwargs.get("exit_if_file_exists", False):
        return np.load(out)

    integrator = mi.load_dict({"type": "velocity"})
    single = min(1024, total_spp)
    img = render_image_multi_pass(scene, integrator, single,
                                  total_spp // single)
    np.save(out, img)
    return img


def run_scene_radiance(scene, scene_name: str, **kwargs):
    """reference program_runner.py:57-81 — plain path-traced radiance."""
    import mitsuba3dopplertof_tpu as mi

    total_spp = kwargs.get("total_spp", 1024)
    output_path = os.path.join(kwargs.get("base_dir"), scene_name, "radiance")
    os.makedirs(output_path, exist_ok=True)
    out = os.path.join(output_path,
                       "%s.npy" % kwargs.get("output_file_name"))
    if os.path.exists(out) and kwargs.get("exit_if_file_exists", False):
        return np.load(out)

    integrator = mi.load_dict({
        "type": "path", "max_depth": kwargs.get("max_depth", 4)})
    single = min(1024, total_spp)
    img = render_image_multi_pass(scene, integrator, single,
                                  total_spp // single)
    np.save(out, img)
    return img


__all__ = ["render_image_multi_pass", "run_scene_doppler_tof",
           "run_scene_velocity", "run_scene_radiance"]
