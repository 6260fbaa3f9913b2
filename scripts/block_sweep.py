"""Block-size sweep for the v2/v3 large-scene kernels on the real chip.

Smaller lane blocks tighten the block-wide slab test and the early-
termination bound (both are min/max over every lane in the block) at the
cost of more serial grid iterations and more visit-table DMA. This sweeps
MI_V2_ROWS / MI_V3_ROWS over the scenes where the large-scene kernels are
the bottleneck, one subprocess per config so cached jitted pass functions
never leak across configs.

Usage: python scripts/block_sweep.py [--kernels v2,v3] [--rows 16,32,64,128]
Prints one JSON line per (kernel, rows, scene).
"""

import json
import os
import subprocess
import sys

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)

_WORKER = """
import json, os, sys, time
sys.path.insert(0, {repo!r})
import numpy as np
import mitsuba3dopplertof_tpu as mi
from mitsuba3dopplertof_tpu.core import transform as tf
from mitsuba3dopplertof_tpu.core.transform import AnimatedTransform
sys.path.insert(0, {here!r})
from bench_suite import animated_mesh_scene, static_mesh_scene, measure

kernel = os.environ.get("MI_STREAM_KERNEL", "?")
rows = os.environ.get("MI_V2_ROWS") or os.environ.get("MI_V3_ROWS")
spp = {spp}
scenes = []
ntri, sc = animated_mesh_scene(mi, tf, AnimatedTransform, 144, 140, spp)
scenes.append(("anim40k", ntri, sc))
ntri, sc = static_mesh_scene(mi, tf, 160, 158, spp)
scenes.append(("static50k", ntri, sc))
for label, ntri, sc in scenes:
    msps, dt, sp = measure(mi, sc, spp)
    print(json.dumps({{"kernel": kernel, "rows": int(rows), "scene": label,
                      "tris": ntri, "Msamples_per_s": round(msps, 3),
                      "seconds": round(dt, 2),
                      "spread_frac": round(sp, 3)}}), flush=True)
"""


def main():
    kernels = ["v2", "v3"]
    rows_list = [32, 64, 128]
    for a in sys.argv[1:]:
        if a.startswith("--kernels"):
            kernels = a.split("=", 1)[1].split(",")
        if a.startswith("--rows"):
            rows_list = [int(x) for x in a.split("=", 1)[1].split(",")]
    worker = _WORKER.format(repo=REPO, here=HERE, spp=64)
    for k in kernels:
        for rows in rows_list:
            env = dict(os.environ, MI_STREAM_KERNEL=k)
            env["MI_V3_ROWS" if k == "v3" else "MI_V2_ROWS"] = str(rows)
            r = subprocess.run([sys.executable, "-c", worker], env=env,
                               cwd=REPO, capture_output=True, text=True,
                               timeout=3600)
            sys.stdout.write(r.stdout)
            if r.returncode != 0:
                print(json.dumps({"kernel": k, "rows": rows,
                                  "error": r.stderr[-800:]}), flush=True)


if __name__ == "__main__":
    main()
