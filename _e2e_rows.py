"""End-to-end large-scene bench rows (round 5): 40k/100k animated doppler,
50k static path, each median-of-3 after warm. Usage: _e2e_rows.py [row...]
with rows from {40k,100k,50k}."""
import sys, time

import numpy as np

sys.path.insert(0, '/root/repo')
import mitsuba3dopplertof_tpu as mi
from mitsuba3dopplertof_tpu.core import transform as tf
from mitsuba3dopplertof_tpu.core.transform import AnimatedTransform
sys.path.insert(0, '/root/repo/scripts')
from bench_suite import animated_mesh_scene, static_mesh_scene

SPP = 256
RES = 256


def run(name, ntri, sc):
    t0 = time.time()
    img = np.asarray(mi.render(sc, spp=SPP, seed=0))
    print(f"{name}: warm {time.time() - t0:.0f}s mean {img.mean():.6f}",
          flush=True)
    assert np.isfinite(img).all()
    ts = []
    for i in range(3):
        t0 = time.time()
        np.asarray(mi.render(sc, spp=SPP, seed=1 + i))
        ts.append(time.time() - t0)
    dt = float(np.median(ts))
    print(f"{name} ({ntri} tris): {dt:.2f}s "
          f"({RES * RES * SPP / dt / 1e6:.2f} Ms/s) "
          f"spread {(max(ts) - min(ts)) / dt * 100:.0f}%", flush=True)


want = sys.argv[1:] or ["40k", "100k", "50k"]
for w in want:
    if w == "40k":
        ntri, sc = animated_mesh_scene(mi, tf, AnimatedTransform,
                                       144, 140, SPP)
        run("40k animated doppler", ntri, sc)
    elif w == "100k":
        ntri, sc = animated_mesh_scene(mi, tf, AnimatedTransform,
                                       360, 140, SPP)
        run("100k animated doppler", ntri, sc)
    elif w == "50k":
        ntri, sc = static_mesh_scene(mi, tf, 160, 158, SPP)
        run("50k static path", ntri, sc)
print("done", flush=True)
