"""Paired A/B: canonical scene strip vs spp-slice passes, alternating."""
import os, sys, time
import numpy as np
sys.path.insert(0, '/root/repo')

def bench(mode, scene, mi, spp=1024, burst=3):
    t0 = time.time()
    for b in range(burst):
        np.asarray(mi.render(scene, spp=spp, seed=17 + b))
    return (time.time() - t0) / burst

import mitsuba3dopplertof_tpu as mi
sc_strip = mi.load_file("/root/reference/configs_example/scene.xml")
os.environ["MI_SPP_SLICE_PASSES"] = "1"
sc_slice = mi.load_file("/root/reference/configs_example/scene.xml")
# warm both (separate scene objects -> separate pass-fn caches)
del os.environ["MI_SPP_SLICE_PASSES"]
np.asarray(mi.render(sc_strip, spp=1024, seed=0))
os.environ["MI_SPP_SLICE_PASSES"] = "1"
np.asarray(mi.render(sc_slice, spp=1024, seed=0))
ratios = []
for rep in range(4):
    del os.environ["MI_SPP_SLICE_PASSES"]
    a = bench("strip", sc_strip, mi)
    os.environ["MI_SPP_SLICE_PASSES"] = "1"
    b = bench("slice", sc_slice, mi)
    ratios.append(b / a)
    print(f"rep{rep}: strip {a:.3f}s slice {b:.3f}s slice/strip {b/a:.3f}",
          flush=True)
print(f"median slice/strip: {float(np.median(ratios)):.3f}", flush=True)
