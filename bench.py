"""Headline benchmark: dopplertofpath on the canonical scene
(reference configs_example/scene.xml — 256x256, correlated sampler,
antithetic time sampling, path_correlation_depth=4, 2 animated cubes).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
Baseline (BASELINE.md): >= 50 Msamples/s/chip on TPU v5e.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main():
    import numpy as np
    import mitsuba3dopplertof_tpu as mi

    scene = mi.load_file(
        os.environ.get("BENCH_SCENE",
                       "/root/reference/configs_example/scene.xml"))
    spp = int(os.environ.get("BENCH_SPP", "1024"))  # canonical scene.xml spp

    # warm up / compile at the SAME spp (the pass program specializes on
    # sample_count for interval stratification, so a different-spp warmup
    # would leave the measured run paying the compile)
    img = np.asarray(mi.render(scene, spp=spp, seed=0))
    assert np.isfinite(img).all()

    # >=5 timed repeats, report the median: the axon tunnel's ambient
    # throughput varies between sessions, and single-shot numbers made
    # cross-round drift indistinguishable from regressions (VERDICT r2)
    repeats = int(os.environ.get("BENCH_REPEATS", "5"))
    # each timed repeat renders BURST back-to-back frames: the tunnel's
    # per-dispatch latency fluctuates by hundreds of ms between sessions,
    # which at ~1 s/frame made the headline swing +-50% on dispatch
    # weather alone; sustained multi-frame throughput is also what the
    # reference's benchmarks report
    burst = int(os.environ.get("BENCH_BURST", "4"))
    times = []
    for i in range(repeats):
        t0 = time.time()
        for b in range(burst):
            np.asarray(mi.render(scene, spp=spp, seed=1 + i * burst + b))
        times.append((time.time() - t0) / burst)
    dt = float(np.median(times))

    w, h = scene.sensor.film.size
    msps = w * h * spp / dt / 1e6
    spread = (max(times) - min(times)) / dt
    print(json.dumps({
        "metric": "dopplertofpath_throughput",
        "value": round(msps, 3),
        "unit": "Msamples/s/chip",
        "vs_baseline": round(msps / 50.0, 3),
        "repeats": repeats,
        "spread_frac": round(spread, 3),
    }))


if __name__ == "__main__":
    main()
