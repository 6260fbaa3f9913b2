"""One-command chip validation queue — run this when the axon TPU tunnel
returns (it was down for all of round-3 session 2). Executes, in order:

  1. health check (trivial jit)
  2. canonical-scene smoke under all variants (exercises the sa pytree
     changes: bsphere_center, env_coeff, M_FILTER/M_SAMPLE_EM columns)
  3. ptracer + stokes{volpath} smoke (the new integrator paths)
  4. binned-path bitwise recipe (MI_NO_RAY_BINNING A/B on a >1k-tri scene)
  5. early-exit bounce-loop A/B (MI_NO_EARLY_EXIT, canonical + deep-RR)
  6. scripts/bench_suite.py (v2 default kernel) -> BENCH_TABLE.md
  7. MI_STREAM_KERNEL=v3 A/B of the animated-40k scene
  8. bench.py headline

Each stage is subprocess-isolated (a Pallas fault crashes the shared TPU
worker; isolation keeps one failure from killing the run — wait ~5 min
and rerun from the failed stage). Usage:

    python scripts/tpu_checklist.py [--from N]
"""

import argparse
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

STAGES = []


def stage(name):
    def deco(fn):
        STAGES.append((name, fn))
        return fn
    return deco


def run_py(code, env=None, timeout=1800):
    e = dict(os.environ)
    if env:
        e.update(env)
    t0 = time.time()
    r = subprocess.run([sys.executable, "-c", code], env=e, cwd=REPO,
                       capture_output=True, text=True, timeout=timeout)
    dt = time.time() - t0
    if r.returncode != 0:
        print(r.stdout[-2000:])
        print(r.stderr[-2000:])
        raise RuntimeError(f"subprocess failed ({dt:.0f}s)")
    return r.stdout, dt


@stage("health check")
def health():
    out, dt = run_py("import jax, jax.numpy as jnp;"
                     "print(jax.devices());"
                     "print(float(jax.jit(lambda x: x*2)(jnp.ones(1))[0]))",
                     timeout=300)
    assert "2.0" in out, out
    print(out.strip().splitlines()[0])


@stage("variant smoke (canonical scene)")
def variants():
    out, dt = run_py("""
import numpy as np
import mitsuba3dopplertof_tpu as mi
for v in mi.variants():
    mi.set_variant(v)
    sc = mi.load_file('/root/reference/configs_example/scene.xml',
                      resx=32, resy=32)
    img = np.asarray(mi.render(sc, spp=16, seed=0))
    assert np.isfinite(img).all(), v
    print(v, 'ok', float(img[..., :3].mean()))
""", timeout=2400)
    print(out.strip())


@stage("ptracer + stokes{volpath} smoke")
def integrators():
    out, dt = run_py("""
import numpy as np
import mitsuba3dopplertof_tpu as mi
from mitsuba3dopplertof_tpu.core import transform as tf
d = {'type': 'scene',
     'integrator': {'type': 'ptracer', 'max_depth': 3},
     'sensor': {'type': 'perspective', 'fov': 60,
                'to_world': tf.look_at([0, 1.5, -3], [0, 0, 0], [0, 1, 0]),
                'film': {'type': 'hdrfilm', 'width': 32, 'height': 32,
                         'rfilter': {'type': 'box'}},
                'sampler': {'type': 'independent', 'sample_count': 64}},
     'floor': {'type': 'rectangle',
               'to_world': tf.rotate([1, 0, 0], -90) @ tf.scale([3, 3, 1]),
               'bsdf': {'type': 'diffuse'}},
     'light': {'type': 'sphere', 'radius': 0.3,
               'to_world': tf.translate([0, 2, 0]),
               'emitter': {'type': 'area',
                           'radiance': {'type': 'rgb', 'value': 10.0}}}}
img = np.asarray(mi.render(mi.load_dict(d), spp=64, seed=0))
assert np.isfinite(img).all() and img.sum() > 0
print('ptracer ok', float(img.sum()))
mi.set_variant('tpu_rgb_polarized')
d['integrator'] = {'type': 'stokes', 'nested': {'type': 'volpath',
                                                'max_depth': 4}}
d['medium'] = {'type': 'cube', 'to_world': tf.scale([1.0] * 3),
               'bsdf': {'type': 'null'},
               'interior': {'type': 'homogeneous', 'sigma_t': 0.4,
                            'albedo': 0.6}}
img = np.asarray(mi.render(mi.load_dict(d), spp=32, seed=0))
assert np.isfinite(img).all()
print('stokes volpath ok', float(img[..., 3:6].sum()))
""", timeout=2400)
    print(out.strip())


@stage("binned-path bitwise recipe")
def binned():
    code = """
import os
import numpy as np
import mitsuba3dopplertof_tpu as mi
import sys
sys.path.insert(0, 'scripts')
from bench_suite import animated_mesh_scene
from mitsuba3dopplertof_tpu.core import transform as tf
from mitsuba3dopplertof_tpu.core.transform import AnimatedTransform
_, sc = animated_mesh_scene(mi, tf, AnimatedTransform, 32, 32, 16, res=64)
img = np.asarray(mi.render(sc, spp=16, seed=0))
np.save('/tmp/checklist_binned_%s.npy' % os.environ.get('TAG'), img)
print('sum', img.sum())
"""
    run_py(code, env={"TAG": "on"}, timeout=2400)
    run_py(code, env={"TAG": "off", "MI_NO_RAY_BINNING": "1"}, timeout=2400)
    import numpy as np
    a = np.load("/tmp/checklist_binned_on.npy")
    b = np.load("/tmp/checklist_binned_off.npy")
    assert np.array_equal(a, b), "binning is not a pure permutation!"
    print("bitwise identical:", a.sum())


@stage("early-exit A/B")
def early_exit():
    code = """
import os, time
import numpy as np
import mitsuba3dopplertof_tpu as mi
sc = mi.load_file('/root/reference/configs_example/scene.xml')
img = np.asarray(mi.render(sc, spp=256, seed=0))   # warm
t0 = time.time()
for s in range(3):
    np.asarray(mi.render(sc, spp=256, seed=1 + s))
print('JSON', {'mode': os.environ.get('MI_NO_EARLY_EXIT', '0'),
               'sum': float(img.sum()), 's': (time.time() - t0) / 3})
"""
    on, _ = run_py(code, timeout=2400)
    off, _ = run_py(code, env={"MI_NO_EARLY_EXIT": "1"}, timeout=2400)
    print("early-exit ON :", on.strip().splitlines()[-1])
    print("early-exit OFF:", off.strip().splitlines()[-1])
    s_on = eval(on.split("JSON", 1)[1])["sum"]
    s_off = eval(off.split("JSON", 1)[1])["sum"]
    assert abs(s_on - s_off) < 1e-6 * max(abs(s_on), 1.0), (s_on, s_off)


@stage("bench suite (v2 kernel) -> BENCH_TABLE.md")
def bench_suite():
    r = subprocess.run([sys.executable, "scripts/bench_suite.py"],
                       cwd=REPO, capture_output=True, text=True,
                       timeout=5400)
    print(r.stdout[-3000:])
    if r.returncode != 0:
        print(r.stderr[-2000:])
        raise RuntimeError("bench_suite failed")


@stage("v3 kernel A/B (animated 40k)")
def v3_ab():
    code = """
import os, time
import numpy as np, sys
sys.path.insert(0, 'scripts')
import mitsuba3dopplertof_tpu as mi
from mitsuba3dopplertof_tpu.core import transform as tf
from mitsuba3dopplertof_tpu.core.transform import AnimatedTransform
from bench_suite import animated_mesh_scene, measure
ntri, sc = animated_mesh_scene(mi, tf, AnimatedTransform, 144, 140, 64)
msps, dt, sp = measure(mi, sc, 64)
print('JSON', {'kernel': os.environ.get('MI_STREAM_KERNEL', 'v2'),
               'tris': ntri, 'Msps': msps, 's': dt})
"""
    for k in ("v2", "v3"):
        out, _ = run_py(code, env={"MI_STREAM_KERNEL": k}, timeout=5400)
        print(out.strip().splitlines()[-1])


@stage("bench.py headline")
def headline():
    r = subprocess.run([sys.executable, "bench.py"], cwd=REPO,
                       capture_output=True, text=True, timeout=3600)
    print(r.stdout.strip())
    if r.returncode != 0:
        print(r.stderr[-1000:])
        raise RuntimeError("bench.py failed")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--from", dest="start", type=int, default=1,
                    help="1-based stage to start from")
    args = ap.parse_args()
    for i, (name, fn) in enumerate(STAGES, 1):
        if i < args.start:
            continue
        print(f"\n=== [{i}/{len(STAGES)}] {name} " + "=" * 30)
        t0 = time.time()
        fn()
        print(f"=== stage {i} ok in {time.time() - t0:.0f}s")
    print("\nALL STAGES PASSED")


if __name__ == "__main__":
    main()
