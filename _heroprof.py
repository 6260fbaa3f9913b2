"""Attribute the hero scene's per-sample cost: time one 256x256 render
under ablations (full, no smoke medium, no envmap, depth 3, spp half) —
paired order, one pass each, repeated twice."""
import sys, time

import numpy as np

sys.path.insert(0, '/root/repo')
import mitsuba3dopplertof_tpu as mi
from mitsuba3dopplertof_tpu.utils.hero_scene import hero_scene_dict

SPP = 128
RES = 256


def build(mod):
    d = hero_scene_dict(spp=SPP, res=RES)
    if mod == "nosmoke":
        del d["smoke"]
    elif mod == "noenv":
        del d["env"]
    elif mod == "depth3":
        d["integrator"]["max_depth"] = 3
    elif mod == "noknot":
        del d["knot"]
    return mi.load_dict(d)


scenes = {}
for mod in ("full", "nosmoke", "noenv", "depth3", "noknot"):
    sc = build(mod)
    t0 = time.time()
    img = np.asarray(mi.render(sc, seed=0, spp=SPP))
    print(f"{mod}: compile+first {time.time() - t0:.1f}s "
          f"mean {img.mean():.6f}", flush=True)
    scenes[mod] = sc

for rep in range(2):
    for mod, sc in scenes.items():
        t0 = time.time()
        np.asarray(mi.render(sc, seed=1 + rep, spp=SPP))
        dt = time.time() - t0
        ms = RES * RES * SPP / dt / 1e6
        print(f"rep{rep} {mod}: {dt:.1f}s ({ms:.3f} Ms/s)", flush=True)
print("done", flush=True)
