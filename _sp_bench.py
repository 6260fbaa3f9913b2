import sys, time
import numpy as np
sys.path.insert(0, '/root/repo')
import mitsuba3dopplertof_tpu as mi
mi.set_variant("tpu_spectral_polarized")
sc = mi.load_file("/root/reference/configs_example/scene.xml")
spp = 1024
np.asarray(mi.render(sc, spp=spp, seed=0))
np.asarray(mi.render(sc, spp=spp, seed=99))
ts = []
for i in range(5):
    t0 = time.time()
    for b in range(3):
        np.asarray(mi.render(sc, spp=spp, seed=1 + i * 3 + b))
    ts.append((time.time() - t0) / 3)
dt = float(np.median(ts))
print(f"spectral_polarized canonical: {256*256*spp/dt/1e6:.2f} Ms/s "
      f"({dt:.2f}s, spread {(max(ts)-min(ts))/dt*100:.0f}%)", flush=True)
