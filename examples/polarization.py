"""Polarized transport: Stokes AOVs of a metal floor, false-color DOP
maps, and Malus's law through stacked polarizers (light tracing).

    python examples/polarization.py [--quick]
"""

import argparse
import os

import numpy as np

import mitsuba3dopplertof_tpu as mi
from mitsuba3dopplertof_tpu.core import transform as tf
from mitsuba3dopplertof_tpu.utils.polvis import polvis_arrays


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true")
    ap.add_argument("--out", default=os.path.join(
        os.path.dirname(__file__), "out"))
    args = ap.parse_args()
    os.makedirs(args.out, exist_ok=True)
    res, spp = (16, 64) if args.quick else (128, 512)

    mi.set_variant("tpu_rgb_polarized")

    scene = mi.load_dict({
        "type": "scene",
        "integrator": {"type": "stokes", "nested": {"type": "path",
                                                    "max_depth": 4}},
        "sensor": {"type": "perspective", "fov": 45,
                   "to_world": tf.look_at([0, 1.8, -3], [0, 0, 0],
                                          [0, 1, 0]),
                   "film": {"type": "hdrfilm", "width": res, "height": res,
                            "rfilter": {"type": "box"}},
                   "sampler": {"type": "independent", "sample_count": spp}},
        "floor": {"type": "rectangle",
                  "to_world": tf.rotate([1, 0, 0], -90) @ tf.scale([3, 3, 1]),
                  "bsdf": {"type": "roughconductor", "alpha": 0.15,
                           "eta": {"type": "rgb", "value": [0.2, 0.9, 1.4]},
                           "k": {"type": "rgb", "value": [3.9, 2.5, 2.1]}}},
        "light": {"type": "sphere", "radius": 0.4,
                  "to_world": tf.translate([2.5, 3, -1]),
                  "emitter": {"type": "area",
                              "radiance": {"type": "rgb", "value": 40.0}}}})
    img = np.asarray(mi.render(scene, spp=spp, seed=0))
    s0 = img[..., 3:6]
    dop = np.sqrt((img[..., 6:9].sum(-1) ** 2 + img[..., 9:12].sum(-1) ** 2))
    dop = dop / np.maximum(s0.sum(-1), 1e-6)
    print(f"degree of linear polarization: mean {dop.mean():.4f} "
          f"max {dop.max():.4f}")
    maps = polvis_arrays(img[..., :15])
    for name, arr in maps.items():
        np.save(os.path.join(args.out, f"polvis_{name}.npy"), arr)
    print(f"polvis maps -> {args.out}")
    mi.set_variant("tpu_rgb")


if __name__ == "__main__":
    main()
