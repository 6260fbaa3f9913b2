"""Animation experiment driver (reference doppler_tutorials/src/
main_animation.py): per-frame velocity-GT / radiance / homodyne+heterodyne
renders and velocity-map reconstruction."""

from __future__ import annotations

import os
from typing import Dict, List, Optional, Sequence

import numpy as np

from .runner import (run_scene_doppler_tof, run_scene_velocity,
                     run_scene_radiance)
from .image import to_tof_image, calc_velocity_from_homo_heteros


def run_animation_frame(scene, scene_name: str, frame_number: int,
                        base_dir: str,
                        hetero_offsets: Sequence[float] = (0.0, 0.25),
                        methods=(("antithetic", 16),),
                        w_g: float = 30.0, exposure_time: float = 0.0015,
                        max_depth: int = 4, total_spp: int = 4096,
                        render_gt: bool = True,
                        render_radiance: bool = True,
                        exit_if_file_exists: bool = True) -> Dict:
    """One frame of the reference's animation pipeline
    (main_animation.py:61-157): velocity GT, radiance, homodyne images per
    phase offset, heterodyne per method, and multi-phase velocity maps."""
    out: Dict = {"frame": frame_number}
    name = f"frame_{frame_number}"

    if render_gt:
        out["velocity_gt"] = run_scene_velocity(
            scene, scene_name, base_dir=base_dir, output_file_name=name,
            total_spp=min(total_spp, 1024),
            exit_if_file_exists=exit_if_file_exists)
    if render_radiance:
        out["radiance"] = run_scene_radiance(
            scene, scene_name, base_dir=base_dir, output_file_name=name,
            max_depth=max_depth, total_spp=min(total_spp, 1024),
            exit_if_file_exists=exit_if_file_exists)

    common = dict(scene=scene, scene_name=scene_name, base_dir=base_dir,
                  w_g=w_g, exposure_time=exposure_time, max_depth=max_depth,
                  total_spp=total_spp, expname=name,
                  exit_if_file_exists=exit_if_file_exists)

    homodynes = []
    for ho in hetero_offsets:
        img = run_scene_doppler_tof(
            time_sampling_method="antithetic", path_correlation_depth=16,
            hetero_frequency=0.0, hetero_offset=ho,
            output_path=os.path.join(scene_name, f"homodyne_{ho:.3f}"),
            **common)
        homodynes.append(to_tof_image(img, exposure_time))
    out["homodynes"] = homodynes

    out["velocity_maps"] = {}
    for method, pcd in methods:
        heterodynes = []
        for ho in hetero_offsets:
            img = run_scene_doppler_tof(
                time_sampling_method=method, path_correlation_depth=pcd,
                hetero_frequency=1.0, hetero_offset=ho,
                output_path=os.path.join(
                    scene_name, f"{method}_pcd{pcd}_het_{ho:.3f}"),
                **common)
            heterodynes.append(to_tof_image(img, exposure_time))
        vmap = calc_velocity_from_homo_heteros(
            homodynes, heterodynes, exposure_time=exposure_time, w_g=w_g)
        out["velocity_maps"][(method, pcd)] = vmap
        np.save(os.path.join(base_dir, scene_name,
                             f"velocity_{method}_pcd{pcd}_{name}.npy"), vmap)
    return out


def run_animation(scene_xml_pattern: str, n_frames: int, base_dir: str,
                  scene_name: str, **kw) -> List[Dict]:
    """Frame loop over ``scene_xml_pattern % frame`` files
    (reference main_animation.py animation_%d.xml convention)."""
    import mitsuba3dopplertof_tpu as mi
    results = []
    for f in range(n_frames):
        scene = mi.load_file(scene_xml_pattern % f)
        results.append(run_animation_frame(scene, scene_name, f, base_dir,
                                           **kw))
    return results


__all__ = ["run_animation_frame", "run_animation"]
