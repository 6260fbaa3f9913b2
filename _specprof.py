"""Attribute the spectral/polarized variant overhead on the canonical
scene: rgb/mono/spectral/rgb_polarized under dopplertofpath, and
rgb/spectral under plain path (no doppler machinery). Paired order x3."""
import sys, time

import numpy as np

sys.path.insert(0, '/root/repo')
import mitsuba3dopplertof_tpu as mi

SPP = 1024
XML = "/root/reference/configs_example/scene.xml"

configs = []
for variant in ("tpu_rgb", "tpu_mono", "tpu_spectral", "tpu_rgb_polarized"):
    configs.append((f"{variant} doppler", variant, None))
for variant in ("tpu_rgb", "tpu_spectral"):
    configs.append((f"{variant} path", variant,
                    {"type": "path", "max_depth": 4}))

scenes = {}
for name, variant, integ in configs:
    mi.set_variant(variant)
    sc = mi.load_file(XML)
    if integ is not None:
        sc.integrator = mi.load_dict(integ)
    t0 = time.time()
    img = np.asarray(mi.render(sc, seed=0, spp=SPP))
    print(f"{name}: compile+first {time.time() - t0:.1f}s "
          f"|mean| {np.abs(img).mean():.5f}", flush=True)
    scenes[name] = (variant, sc)

for rep in range(3):
    for name, (variant, sc) in scenes.items():
        mi.set_variant(variant)
        t0 = time.time()
        np.asarray(mi.render(sc, seed=1 + rep, spp=SPP))
        dt = time.time() - t0
        print(f"rep{rep} {name}: {dt:.2f}s "
              f"({256 * 256 * SPP / dt / 1e6:.1f} Ms/s)", flush=True)
mi.set_variant("tpu_rgb")
print("done", flush=True)
