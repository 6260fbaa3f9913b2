"""Paired end-to-end A/B of MI_V4_ROWS on the 40k animated bench scene."""
import sys, time

import numpy as np
import jax

sys.path.insert(0, '/root/repo')
sys.path.insert(0, '/root/repo/scripts')
import mitsuba3dopplertof_tpu as mi
from mitsuba3dopplertof_tpu.core import transform as tf
from mitsuba3dopplertof_tpu.core.transform import AnimatedTransform
from bench_suite import animated_mesh_scene

SPP = 128
PAIRS = 3

scenes = {}
for rows in (8, 32):
    import os
    os.environ["MI_V4_ROWS"] = str(rows)
    ntri, sc = animated_mesh_scene(mi, tf, AnimatedTransform, 144, 140, SPP)
    img = np.asarray(mi.render(sc, seed=0, spp=SPP))   # compile + warm
    print(f"r{rows} warm ok, mean {img.mean():.5f}", flush=True)
    scenes[rows] = sc

def run(rows, seed):
    import os
    os.environ["MI_V4_ROWS"] = str(rows)
    t0 = time.perf_counter()
    img = np.asarray(mi.render(scenes[rows], seed=seed, spp=SPP))
    return time.perf_counter() - t0

ratios = []
for i in range(PAIRS):
    t8 = run(8, i + 1)
    t32 = run(32, i + 1)
    n_samp = 256 * 256 * SPP / 1e6
    print(f"pair {i}: r8 {t8:.1f}s ({n_samp / t8:.2f} Ms/s)  "
          f"r32 {t32:.1f}s ({n_samp / t32:.2f} Ms/s)  ratio {t32 / t8:.3f}",
          flush=True)
    ratios.append(t32 / t8)
print(f"median r32/r8 ratio: {np.median(ratios):.3f}", flush=True)
print("done", flush=True)
