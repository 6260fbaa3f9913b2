import os, sys, time
import numpy as np
os.environ["MI_V4_ROUNDS"] = os.environ.get("TRY_ROUNDS", "lite")
sys.path.insert(0, '/root/repo')
import mitsuba3dopplertof_tpu as mi
from mitsuba3dopplertof_tpu.utils.hero_scene import load_hero_scene
SPP = 256
sc = load_hero_scene(res=256, spp=SPP)
t0 = time.time()
img = np.asarray(mi.render(sc, spp=SPP, seed=0))
print(f"warm {time.time()-t0:.0f}s mean {img.mean():.6f}", flush=True)
ts = []
for i in range(2):
    t0 = time.time()
    np.asarray(mi.render(sc, spp=SPP, seed=1 + i))
    ts.append(time.time() - t0)
dt = min(ts)
print(f"hero rounds={os.environ['MI_V4_ROUNDS']}: {dt:.2f}s "
      f"({256*256*SPP/dt/1e6:.2f} Ms/s)", flush=True)
