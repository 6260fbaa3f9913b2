"""A/B the large-scene intersection kernels (MI_STREAM_KERNEL=v1/v2/v3)
on the scenes where they matter: animated 10k/40k triangles and static
50k. Each kernel runs in its own subprocess so cached jitted pass
functions from one choice can never serve another.

Usage: python scripts/kernel_ab.py [--quick] [--kernels v1,v2,v3]
Prints one JSON line per (kernel, scene); run on the real chip.
"""

import json
import os
import subprocess
import sys

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)

_WORKER = """
import json, os, sys, time
if os.environ.get("MI_AB_CPU"):       # plumbing smoke test off-chip: the
    import jax                        # container pins the axon platform at
    jax.config.update("jax_platforms", "cpu")   # interpreter start
sys.path.insert(0, {repo!r})
import numpy as np
import mitsuba3dopplertof_tpu as mi
from mitsuba3dopplertof_tpu.core import transform as tf
from mitsuba3dopplertof_tpu.core.transform import AnimatedTransform
sys.path.insert(0, {here!r})
from bench_suite import animated_mesh_scene, static_mesh_scene, measure

kernel = os.environ.get("MI_STREAM_KERNEL", "?")
spp = {spp}
scenes = []
for nu, nv, label in [(72, 70, "anim10k"), (144, 140, "anim40k")]:
    ntri, sc = animated_mesh_scene(mi, tf, AnimatedTransform, nu, nv, spp)
    scenes.append((label, ntri, sc))
ntri, sc = static_mesh_scene(mi, tf, 160, 158, spp)
scenes.append(("static50k", ntri, sc))
for label, ntri, sc in scenes:
    msps, dt, sp = measure(mi, sc, spp)
    print(json.dumps({{"kernel": kernel, "scene": label, "tris": ntri,
                      "Msamples_per_s": round(msps, 3),
                      "seconds": round(dt, 2),
                      "spread_frac": round(sp, 3)}}), flush=True)
"""


def main():
    quick = "--quick" in sys.argv
    kernels = ["v1", "v2", "v3"]
    for a in sys.argv[1:]:
        if a.startswith("--kernels"):
            kernels = a.split("=", 1)[1].split(",")
    spp = 64 if quick else 256
    worker = _WORKER.format(repo=REPO, here=HERE, spp=spp)
    for k in kernels:
        env = dict(os.environ, MI_STREAM_KERNEL=k)
        r = subprocess.run([sys.executable, "-c", worker], env=env,
                           cwd=REPO, capture_output=True, text=True,
                           timeout=3600)
        sys.stdout.write(r.stdout)
        if r.returncode != 0:
            print(json.dumps({"kernel": k, "error": r.stderr[-800:]}),
                  flush=True)


if __name__ == "__main__":
    main()
