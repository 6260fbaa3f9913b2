"""Long single-shot renders: tunnel jitter ~±0.5s is small against 20-60s
renders. One warmup (compile) + 2 timed repeats per config."""
import os, sys, time
import numpy as np
sys.path.insert(0, '/root/repo')
import jax, jax.numpy as jnp
import mitsuba3dopplertof_tpu as mi
from mitsuba3dopplertof_tpu.core import transform as tf
from mitsuba3dopplertof_tpu.core.transform import AnimatedTransform
sys.path.insert(0, '/root/repo/scripts')
from bench_suite import animated_mesh_scene

print("health:", jax.jit(lambda x: x*2)(jnp.ones(4))[0], flush=True)
spp = 256
for kern in ("v4", "v2"):
    os.environ["MI_STREAM_KERNEL"] = kern
    ntri, sc = animated_mesh_scene(mi, tf, AnimatedTransform, 144, 140, spp)
    img = np.asarray(mi.render(sc, spp=spp, seed=0))  # compile+run
    assert np.isfinite(img).all() and img.max() > 0
    for rep in range(2):
        t0 = time.perf_counter()
        img = np.asarray(mi.render(sc, spp=spp, seed=rep + 1))
        dt = time.perf_counter() - t0
        ms = 256 * 256 * spp / dt / 1e6
        print(f"{kern} anim40k spp{spp} rep{rep}: {dt:.1f}s = {ms:.2f} Ms/s",
              flush=True)
print("done")
