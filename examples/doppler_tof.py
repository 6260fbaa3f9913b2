"""Doppler ToF rendering end to end (the reference paper's pipeline):
render a heterodyne and a homodyne measurement of the canonical moving
scene and reconstruct per-pixel radial velocity.

    python examples/doppler_tof.py [--quick]
"""

import argparse
import os

import numpy as np

import mitsuba3dopplertof_tpu as mi
from mitsuba3dopplertof_tpu.utils.image import (
    calc_velocity_from_homo_hetero, to_ldr_image)
from mitsuba3dopplertof_tpu.io.bitmap import write_exr_rgb, write_png

SCENE = "/root/reference/configs_example/scene.xml"


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true")
    ap.add_argument("--out", default=os.path.join(
        os.path.dirname(__file__), "out"))
    args = ap.parse_args()
    os.makedirs(args.out, exist_ok=True)
    res, spp = (32, 64) if args.quick else (256, 1024)

    scene = mi.load_file(SCENE, resx=res, resy=res)

    def measure(hetero_frequency, hetero_offset):
        integ = mi.load_dict({
            "type": "dopplertofpath", "max_depth": 4, "w_g": 30.0,
            "time": 0.0015,
            "hetero_frequency": hetero_frequency,
            "hetero_offset": hetero_offset,
            "time_sampling_method": "antithetic",
            "path_correlation_depth": 4})
        return np.asarray(integ.render(scene, seed=0, spp=spp))[..., :3]

    het = measure(1.0, 0.0)       # heterodyne: velocity-sensitive
    hom = measure(0.0, 0.25)      # homodyne quadrature: normalizer
    vel = calc_velocity_from_homo_hetero(hom, het).mean(-1)
    # the Doppler inversion blows up where the homodyne signal vanishes;
    # report/visualize over confident pixels (reference image_utils.py
    # weights by |homodyne| the same way)
    conf = np.abs(hom).mean(-1) > 0.02 * np.abs(hom).mean(-1).max()
    vel = np.where(conf, vel, 0.0)

    write_exr_rgb(os.path.join(args.out, "heterodyne.exr"), het)
    write_exr_rgb(os.path.join(args.out, "homodyne.exr"), hom)
    np.save(os.path.join(args.out, "velocity.npy"), vel)
    write_png(os.path.join(args.out, "velocity.png"),
              to_ldr_image(np.repeat(
                  (vel - vel.min())[..., None]
                  / max(vel.max() - vel.min(), 1e-9), 3, -1)),
              gamma=False)
    print(f"velocity range (confident px) "
          f"[{vel.min():+.3f}, {vel.max():+.3f}] m/s "
          f"-> {args.out}")


if __name__ == "__main__":
    main()
