"""JIT correctness: recompilation accounting (the role of reference
src/render/tests/test_megakernel.py). Repeated renders of the same scene
shape reuse the compiled pass program; editing parameter VALUES (via
traverse/update) re-compiles scene arrays but must NOT retrace; only a
different wavefront shape (spp) builds a new program."""

import numpy as np
import pytest

import mitsuba3dopplertof_tpu as mi

XML = '''
<scene version="3.0.0">
  <integrator type="path"><integer name="max_depth" value="2"/></integrator>
  <sensor type="perspective"><float name="fov" value="45"/>
    <film type="hdrfilm"><integer name="width" value="8"/>
      <integer name="height" value="8"/><rfilter type="box"/></film>
    <sampler type="independent"><integer name="sample_count" value="8"/></sampler>
  </sensor>
  <shape type="rectangle">
    <transform name="to_world"><translate z="2"/></transform>
    <bsdf type="twosided"><bsdf type="diffuse">
      <rgb name="reflectance" value="0.5,0.5,0.5"/></bsdf></bsdf>
  </shape>
  <emitter type="point">
    <transform name="to_world"><translate z="1"/></transform>
    <rgb name="intensity" value="5"/>
  </emitter>
</scene>'''


def _trace_counts(integ):
    cache = getattr(integ, "_pass_fn_cache", {})
    return {k: f._cache_size() for k, f in cache.items()
            if hasattr(f, "_cache_size")}


def test_render_reuses_compiled_program():
    scene = mi.load_string(XML)
    integ = scene.integrator
    a = np.asarray(mi.render(scene, spp=8, seed=0))
    counts1 = _trace_counts(integ)
    assert counts1 and all(v == 1 for v in counts1.values()), counts1

    # same shape, different seed: no new keys, no new traces
    b = np.asarray(mi.render(scene, spp=8, seed=1))
    counts2 = _trace_counts(integ)
    assert counts2 == counts1, (counts1, counts2)
    assert not np.allclose(a, b)  # the seed actually changed the image

    # edit a parameter VALUE: scene arrays rebuild, program is reused
    params = mi.traverse(scene)
    key = [k for k in params if k.endswith("intensity.value")][0]
    params[key] = np.asarray([9.0, 1.0, 1.0])
    params.update()
    c = np.asarray(mi.render(scene, spp=8, seed=0))
    counts3 = _trace_counts(integ)
    assert counts3 == counts1, (counts1, counts3)
    assert not np.allclose(a, c)  # the edit actually took effect

    # a different wavefront shape compiles one (and only one) new program
    mi.render(scene, spp=16, seed=0)
    counts4 = _trace_counts(integ)
    assert len(counts4) == 2 * len(counts1), counts4


def test_traverse_exposes_nested_bsdf_params():
    """traverse recurses adapter BSDFs and round-trips edits through the
    compiled tables (reference util.py traverse semantics)."""
    scene = mi.load_string(XML)
    params = mi.traverse(scene)
    keys = [k for k in params if "reflectance" in k]
    assert keys, list(params)
    base = np.asarray(mi.render(scene, spp=16, seed=0))
    params[keys[0]] = np.asarray([0.1, 0.1, 0.1])
    params.update()
    dark = np.asarray(mi.render(scene, spp=16, seed=0))
    assert dark.sum() < 0.3 * base.sum(), (base.sum(), dark.sum())


def test_traverse_scalar_roughness():
    scene = mi.load_dict({
        "type": "scene",
        "sensor": {"type": "perspective"},
        "s": {"type": "rectangle",
              "bsdf": {"type": "roughconductor", "alpha": 0.1}}})
    params = mi.traverse(scene)
    key = [k for k in params if k.endswith(".alpha_u")][0]
    assert params[key] == 0.1
    params[key] = 0.4
    params.update()
    assert scene.shapes[0].bsdf.alpha_u == 0.4
