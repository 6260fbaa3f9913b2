"""Command-line renderer — the equivalent of the reference's `mitsuba`
binary (reference src/mitsuba/mitsuba.cpp:150-424).

    python -m mitsuba3dopplertof_tpu.cli scene.xml -o out.exr -D spp=256

Flags mirror the reference where meaningful on TPU: -D key=value scene
parameter overrides, -o output, -s seed, --spp. The reference's JIT flags
(-O/-W/-V) have no TPU analog (XLA owns scheduling); -m variant accepts
only the native 'tpu_rgb'.
"""

from __future__ import annotations

import argparse
import os
import sys
import time


def main(argv=None):
    ap = argparse.ArgumentParser(
        prog="mitsuba3dopplertof-tpu",
        description="TPU-native Doppler ToF renderer")
    ap.add_argument("scene", help="scene XML file")
    ap.add_argument("-o", "--output", default=None,
                    help="output EXR (default: scene name .exr)")
    ap.add_argument("-D", "--define", action="append", default=[],
                    metavar="key=value", help="scene parameter override")
    ap.add_argument("-m", "--mode", default="tpu_rgb",
                    help="variant (only tpu_rgb)")
    ap.add_argument("-s", "--seed", type=int, default=0)
    ap.add_argument("--spp", type=int, default=0,
                    help="override samples per pixel")
    ap.add_argument("--sensor", type=int, default=0)
    ap.add_argument("--png", action="store_true",
                    help="also write a tonemapped PNG")
    args = ap.parse_args(argv)

    import numpy as np
    import mitsuba3dopplertof_tpu as mi
    from mitsuba3dopplertof_tpu.io.bitmap import write_exr_rgb, write_png

    params = {}
    for d in args.define:
        k, _, v = d.partition("=")
        params[k] = v

    t0 = time.time()
    scene = mi.load_file(args.scene, **params)
    print(f"[load] {time.time() - t0:.2f}s", file=sys.stderr)

    t0 = time.time()
    img = np.asarray(mi.render(scene, spp=args.spp, seed=args.seed,
                               sensor=scene.sensors[args.sensor]))
    dt = time.time() - t0
    w, h = scene.sensors[args.sensor].film.size
    spp = args.spp or scene.sensors[args.sensor].sampler.sample_count
    print(f"[render] {dt:.2f}s  {w * h * spp / dt / 1e6:.1f} Msamples/s",
          file=sys.stderr)

    out = args.output or os.path.splitext(args.scene)[0] + ".exr"
    write_exr_rgb(out, img[..., :3])
    print(f"[write] {out}", file=sys.stderr)
    if args.png:
        from mitsuba3dopplertof_tpu.utils.image import to_ldr_image
        write_png(os.path.splitext(out)[0] + ".png",
                  to_ldr_image(img[..., :3]), gamma=False)


if __name__ == "__main__":
    main()
