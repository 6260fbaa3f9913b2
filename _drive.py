"""Verify driver: end-to-end mi.render on the real chip, v4 vs v2, plus
binned-vs-unbinned bitwise check (verify skill recipe)."""
import os, sys, time
import numpy as np
import jax

sys.path.insert(0, '/root/repo')
import mitsuba3dopplertof_tpu as mi
from mitsuba3dopplertof_tpu.core import transform as tf
from mitsuba3dopplertof_tpu.core.transform import AnimatedTransform
sys.path.insert(0, '/root/repo/scripts')
from bench_suite import animated_mesh_scene, static_mesh_scene, measure

import jax.numpy as jnp
print("health:", jax.jit(lambda x: x*2)(jnp.ones(4))[0], flush=True)

spp = 64
for kern in (os.environ.get("DRIVE_KERNELS", "v4,v2").split(",")):
    os.environ["MI_STREAM_KERNEL"] = kern
    ntri, sc = animated_mesh_scene(mi, tf, AnimatedTransform, 144, 140, spp)
    msps, dt, sp = measure(mi, sc, spp)
    print(f"{kern} anim40k: {msps:.2f} Ms/s  {dt:.2f}s spread {sp:.2f}", flush=True)
    ntri, sc = static_mesh_scene(mi, tf, 160, 158, spp)
    msps, dt, sp = measure(mi, sc, spp)
    print(f"{kern} static50k: {msps:.2f} Ms/s  {dt:.2f}s spread {sp:.2f}", flush=True)

# bitwise binned check (v4): render twice, fresh scene, binning on/off
os.environ["MI_STREAM_KERNEL"] = "v4"
ntri, sc = animated_mesh_scene(mi, tf, AnimatedTransform, 144, 140, 8)
a = np.asarray(mi.render(sc, seed=0, spp=8))
os.environ["MI_NO_RAY_BINNING"] = "1"
ntri, sc = animated_mesh_scene(mi, tf, AnimatedTransform, 144, 140, 8)
b = np.asarray(mi.render(sc, seed=0, spp=8))
del os.environ["MI_NO_RAY_BINNING"]
print("binned bitwise match:", np.array_equal(a, b),
      "finite:", np.isfinite(a).all(), "nonzero:", float(a.max()) > 0, flush=True)
print("done")
