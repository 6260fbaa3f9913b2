"""Inverse rendering: recover a wall albedo from a reference image with
mi.ad.Adam over the differentiable scene tables.

    python examples/inverse_rendering.py [--quick]
"""

import argparse
import os

import jax
import jax.numpy as jnp
import numpy as np

import mitsuba3dopplertof_tpu as mi
from mitsuba3dopplertof_tpu.ad import Adam
from mitsuba3dopplertof_tpu.render.ad import _render_image_fn, DIFF_FIELDS

XML = '''
<scene version="3.0.0">
  <integrator type="path"><integer name="max_depth" value="2"/></integrator>
  <sensor type="perspective"><float name="fov" value="45"/>
    <film type="hdrfilm"><integer name="width" value="{res}"/>
      <integer name="height" value="{res}"/><rfilter type="box"/></film>
    <sampler type="independent"><integer name="sample_count" value="{spp}"/></sampler>
  </sensor>
  <shape type="rectangle">
    <transform name="to_world"><translate z="2"/></transform>
    <bsdf type="twosided"><bsdf type="diffuse">
      <rgb name="reflectance" value="{refl}"/></bsdf></bsdf>
  </shape>
  <emitter type="point">
    <transform name="to_world"><translate z="1"/></transform>
    <rgb name="intensity" value="5"/>
  </emitter>
</scene>'''


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true")
    ap.add_argument("--iters", type=int, default=None)
    args = ap.parse_args()
    res, spp = (8, 8) if args.quick else (32, 16)
    iters = args.iters or (40 if args.quick else 100)

    target_scene = mi.load_string(XML.format(res=res, spp=spp,
                                             refl="0.8,0.3,0.1"))
    target = jnp.asarray(mi.render(target_scene, spp=spp, seed=0))

    scene = mi.load_string(XML.format(res=res, spp=spp, refl="0.5,0.5,0.5"))
    f, sa = _render_image_fn(scene.integrator, scene, None, spp, 0, 1 << 18)
    base = {k: getattr(sa, k) for k in DIFF_FIELDS}

    def loss(p):
        d = f(p) - target
        return 0.5 * jnp.sum(d * d)

    vg = jax.jit(jax.value_and_grad(loss))
    opt = Adam(lr=0.02, params=base)
    for it in range(iters):
        val, grads = vg({k: opt[k] for k in DIFF_FIELDS})
        opt.step(grads)
        if it % max(1, iters // 10) == 0:
            print(f"iter {it:4d}  loss {float(val):.5f}")
    final = np.asarray(f({k: opt[k] for k in DIFF_FIELDS}))
    err = np.abs(final - np.asarray(target)).mean()
    print(f"final mean image error: {err:.4f} (target albedo 0.8/0.3/0.1)")


if __name__ == "__main__":
    main()
