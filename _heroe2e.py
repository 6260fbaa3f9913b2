import sys, time
import numpy as np
sys.path.insert(0, '/root/repo')
import mitsuba3dopplertof_tpu as mi
from mitsuba3dopplertof_tpu.utils.hero_scene import load_hero_scene
SPP = 256
sc = load_hero_scene(res=256, spp=SPP)
t0 = time.time()
img = np.asarray(mi.render(sc, spp=SPP, seed=0))
print(f"warm {time.time()-t0:.0f}s mean {img.mean():.6f} finite {np.isfinite(img).all()}", flush=True)
ts = []
for i in range(3):
    t0 = time.time()
    np.asarray(mi.render(sc, spp=SPP, seed=1 + i))
    ts.append(time.time() - t0)
dt = float(np.median(ts))
print(f"hero: {dt:.2f}s ({256*256*SPP/dt/1e6:.2f} Ms/s) spread {(max(ts)-min(ts))/dt*100:.0f}%", flush=True)
