"""Why antithetic time sampling matters: per-method variance of the
Doppler estimator on the canonical scene (paper Fig. 9 in miniature).

    python examples/time_sampling_variance.py [--quick]
"""

import argparse

import numpy as np

import mitsuba3dopplertof_tpu as mi

SCENE = "/root/reference/configs_example/scene.xml"


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true")
    args = ap.parse_args()
    res, spp, reps = (16, 32, 4) if args.quick else (64, 128, 8)

    scene = mi.load_file(SCENE, resx=res, resy=res)
    print(f"{'method':<20} {'pixel-variance':>14}")
    for method in ("uniform", "stratified", "antithetic",
                   "antithetic_mirror"):
        imgs = []
        for seed in range(reps):
            integ = mi.load_dict({
                "type": "dopplertofpath", "max_depth": 4, "w_g": 30.0,
                "time": 0.0015, "hetero_frequency": 1.0,
                "hetero_offset": 0.0,
                "time_sampling_method": method,
                "path_correlation_depth": 4})
            imgs.append(np.asarray(integ.render(scene, seed=seed,
                                                spp=spp))[..., :3])
        var = np.stack(imgs).var(axis=0).mean()
        print(f"{method:<20} {var:>14.3e}")


if __name__ == "__main__":
    main()
