"""Feature renders: textures, BSDFs, sensors, film filters — smoke + value
checks on tiny scenes (the per-plugin test style of SURVEY.md §4)."""

import numpy as np
import jax.numpy as jnp
import pytest

import mitsuba3dopplertof_tpu as mi

BASE = '''
<scene version="3.0.0">
  <integrator type="{integrator}">
    <integer name="max_depth" value="{depth}"/>
  </integrator>
  <sensor type="perspective">
    <float name="fov" value="45"/>
    <film type="hdrfilm">
      <integer name="width" value="16"/><integer name="height" value="16"/>
      <rfilter type="{rfilter}"/>
    </film>
    <sampler type="independent"><integer name="sample_count" value="16"/></sampler>
  </sensor>
  <shape type="rectangle">
    <transform name="to_world"><translate z="2"/></transform>
    {bsdf}
  </shape>
  <emitter type="point">
    <transform name="to_world"><translate z="1"/></transform>
    <rgb name="intensity" value="5"/>
  </emitter>
</scene>
'''

TWOSIDED_DIFFUSE = '''<bsdf type="twosided"><bsdf type="diffuse">
  <rgb name="reflectance" value="0.8,0.6,0.4"/></bsdf></bsdf>'''


def render(xml, spp=16, seed=0):
    scene = mi.load_string(xml)
    return np.asarray(mi.render(scene, spp=spp, seed=seed))


def test_diffuse_point_light_analytic():
    """Direct lighting of a diffuse plane by a point light has a closed
    form: L = rho/pi * I * cos/d^2."""
    img = render(BASE.format(integrator="path", depth=2, rfilter="box",
                             bsdf=TWOSIDED_DIFFUSE))
    # center pixel: surface point ~(0,0,2), light at (0,0,1): d=1, cos=1
    expect = 0.8 / np.pi * 5.0
    assert abs(img[8, 8, 0] - expect) / expect < 0.05, (img[8, 8], expect)
    # rgb ratio matches reflectance
    assert abs(img[8, 8, 1] / img[8, 8, 0] - 0.6 / 0.8) < 0.02


def test_checkerboard_texture():
    bsdf = '''<bsdf type="twosided"><bsdf type="diffuse">
      <texture type="checkerboard" name="reflectance">
        <rgb name="color0" value="0.9,0.1,0.1"/>
        <rgb name="color1" value="0.1,0.1,0.9"/>
      </texture></bsdf></bsdf>'''
    img = render(BASE.format(integrator="path", depth=2, rfilter="box",
                             bsdf=bsdf))
    lit = img.sum(-1) > 0
    r_dom = (img[..., 0] > img[..., 2]) & lit
    b_dom = (img[..., 2] > img[..., 0]) & lit
    assert r_dom.any() and b_dom.any()


def test_filters_preserve_energy():
    """box/tent/gaussian all reconstruct ~the same mean (energy
    preservation of the normalized splat + develop)."""
    means = {}
    for f in ("box", "tent", "gaussian"):
        img = render(BASE.format(integrator="path", depth=2, rfilter=f,
                                 bsdf=TWOSIDED_DIFFUSE), spp=64)
        means[f] = img[4:12, 4:12].mean()
    ref = means["box"]
    for f, m in means.items():
        assert abs(m - ref) / ref < 0.03, means


def test_conductor_mirror_reflection():
    """A smooth conductor between camera and light reflects the scene: a
    mirror plane in front of a diffuse wall shows the wall's color."""
    xml = '''
    <scene version="3.0.0">
      <integrator type="path"><integer name="max_depth" value="4"/></integrator>
      <sensor type="perspective">
        <float name="fov" value="45"/>
        <film type="hdrfilm"><integer name="width" value="8"/>
          <integer name="height" value="8"/><rfilter type="box"/></film>
        <sampler type="independent"><integer name="sample_count" value="64"/></sampler>
      </sensor>
      <shape type="rectangle">
        <transform name="to_world"><rotate x="1" angle="180"/><translate z="2"/></transform>
        <bsdf type="conductor"/>
      </shape>
      <shape type="rectangle">
        <transform name="to_world"><translate z="-3"/></transform>
        <bsdf type="twosided"><bsdf type="diffuse">
          <rgb name="reflectance" value="0.9,0.2,0.2"/></bsdf></bsdf>
      </shape>
      <emitter type="point">
        <transform name="to_world"><translate z="-1"/></transform>
        <rgb name="intensity" value="10"/>
      </emitter>
    </scene>'''
    img = render(xml, spp=64)
    center = img[4, 4]
    # mirror shows the red wall
    assert center[0] > 2.0 * center[1], center
    assert center[0] > 0.01


def test_area_emitter_rect():
    """Area light NEE: diffuse plane lit by a rect emitter."""
    xml = '''
    <scene version="3.0.0">
      <integrator type="path"><integer name="max_depth" value="2"/></integrator>
      <sensor type="perspective">
        <float name="fov" value="45"/>
        <film type="hdrfilm"><integer name="width" value="8"/>
          <integer name="height" value="8"/><rfilter type="box"/></film>
        <sampler type="independent"><integer name="sample_count" value="128"/></sampler>
      </sensor>
      <shape type="rectangle">
        <transform name="to_world"><translate z="2"/></transform>
        <bsdf type="twosided"><bsdf type="diffuse">
          <rgb name="reflectance" value="1,1,1"/></bsdf></bsdf>
      </shape>
      <shape type="rectangle" id="Light">
        <transform name="to_world"><scale value="0.25"/><translate z="1"/></transform>
        <emitter type="area"><rgb name="radiance" value="10"/></emitter>
      </shape>
    </scene>'''
    img = render(xml, spp=128)
    # the light's own (black) back side occludes the image center — the
    # plane is lit in the periphery
    assert img[4, 4, 0] < 1e-4          # looking at the emitter's back
    assert img[1, 1, 0] > 0.05          # NEE-lit plane around it
    assert img.mean() > 0.05


def test_thinlens_defocus():
    """Thin lens blurs out-of-focus geometry: variance of a checkerboard
    drops when focus is far from the plane."""
    def make(focus):
        return f'''
        <scene version="3.0.0">
          <integrator type="path"><integer name="max_depth" value="2"/></integrator>
          <sensor type="thinlens">
            <float name="fov" value="45"/>
            <float name="aperture_radius" value="0.2"/>
            <float name="focus_distance" value="{focus}"/>
            <film type="hdrfilm"><integer name="width" value="32"/>
              <integer name="height" value="32"/><rfilter type="box"/></film>
            <sampler type="independent"><integer name="sample_count" value="64"/></sampler>
          </sensor>
          <shape type="rectangle">
            <transform name="to_world"><translate z="2"/></transform>
            <bsdf type="twosided"><bsdf type="diffuse">
              <texture type="checkerboard" name="reflectance">
                <transform name="to_uv"><scale value="8"/></transform>
                <rgb name="color0" value="1,1,1"/>
                <rgb name="color1" value="0,0,0"/>
              </texture></bsdf></bsdf>
          </shape>
          <emitter type="point">
            <transform name="to_world"><translate z="1"/></transform>
            <rgb name="intensity" value="5"/>
          </emitter>
        </scene>'''
    sharp = render(make(2.0), spp=64)
    blurred = render(make(0.5), spp=64)
    assert blurred[8:24, 8:24, 0].std() < sharp[8:24, 8:24, 0].std()


def test_ptracer_energy_parity():
    """Light tracing agrees with path tracing in the mean (unbiasedness of
    the adjoint estimator, reference ptracer.cpp)."""
    xml = '''
    <scene version="3.0.0">
      <integrator type="{integ}"><integer name="max_depth" value="3"/></integrator>
      <sensor type="perspective"><float name="fov" value="45"/>
        <film type="hdrfilm"><integer name="width" value="16"/>
          <integer name="height" value="16"/><rfilter type="box"/></film>
        <sampler type="independent"><integer name="sample_count" value="64"/></sampler>
      </sensor>
      <shape type="rectangle">
        <transform name="to_world"><translate z="2"/></transform>
        <bsdf type="twosided"><bsdf type="diffuse">
          <rgb name="reflectance" value="0.8,0.8,0.8"/></bsdf></bsdf>
      </shape>
      <emitter type="point">
        <transform name="to_world"><translate z="1"/></transform>
        <rgb name="intensity" value="5"/>
      </emitter>
    </scene>'''
    fwd = render(xml.format(integ="path"), spp=64)
    lt = render(xml.format(integ="ptracer"), spp=256)
    assert abs(lt.mean() / fwd.mean() - 1.0) < 0.05


def test_sphere_area_emitter():
    """Analytic sphere emitter: exact cone-sampled NEE (emitters
    EMITTER_AREA_SPHERE, reference sphere.cpp sample_direction).
    Floor radiance under the sphere: albedo * L * sin^2(theta_max)."""
    from mitsuba3dopplertof_tpu.core import transform as tf
    sc = mi.load_dict({
        "type": "scene",
        "light": {"type": "sphere", "center": [0, 2.0, 0], "radius": 0.5,
                  "emitter": {"type": "area",
                              "radiance": {"type": "rgb", "value": 2.0}}},
        "floor": {"type": "rectangle",
                  "to_world": tf.rotate([1, 0, 0], -90) @ tf.scale([5] * 3),
                  "bsdf": {"type": "diffuse",
                           "reflectance": {"type": "rgb", "value": 0.5}}},
        "sensor": {"type": "radiancemeter",
                   "to_world": tf.look_at([0, 1.0, 0], [0, 0, 0], [1, 0, 0]),
                   "film": {"type": "hdrfilm", "width": 1, "height": 1},
                   "sampler": {"type": "independent", "sample_count": 1024}},
        "integrator": {"type": "path", "max_depth": 2},
    })
    img = np.asarray(sc.integrator.render(sc, seed=0, spp=1024))
    expect = 0.5 * 2.0 * (0.5 / 2.0) ** 2
    assert abs(img.ravel()[0] / expect - 1.0) < 0.02, img.ravel()[0]


def test_sphere_emitter_mis_consistency():
    """NEE pdf and BSDF-hit MIS agree: depth-2 path == direct."""
    from mitsuba3dopplertof_tpu.core import transform as tf
    sc = mi.load_dict({
        "type": "scene",
        "light": {"type": "sphere", "center": [0, 2.0, 0], "radius": 0.5,
                  "emitter": {"type": "area",
                              "radiance": {"type": "rgb", "value": 2.0}}},
        "floor": {"type": "rectangle",
                  "to_world": tf.rotate([1, 0, 0], -90) @ tf.scale([5] * 3)},
        "sensor": {"type": "perspective", "fov": 60,
                   "to_world": tf.look_at([0, 1.0, -3.5], [0, 0.5, 0],
                                          [0, 1, 0]),
                   "film": {"type": "hdrfilm", "width": 8, "height": 8},
                   "sampler": {"type": "independent", "sample_count": 128}},
        "integrator": {"type": "path", "max_depth": 2},
    })
    a = np.asarray(mi.load_dict({"type": "direct"}).render(sc, seed=0,
                                                           spp=128))
    b = np.asarray(sc.integrator.render(sc, seed=1, spp=128))
    assert abs(b[..., :3].mean() / a[..., :3].mean() - 1.0) < 0.05


def test_bumpmap_gradients(tmp_path):
    """Bumpmap perturbs shading by height-texture gradients (reference
    bumpmap.cpp); a constant height map must leave shading bit-unchanged,
    a ramp must tilt it."""
    import PIL.Image as I
    from mitsuba3dopplertof_tpu.core import transform as tf
    ramp = np.tile(np.linspace(0, 255, 64, dtype=np.uint8)[None, :], (64, 1))
    I.fromarray(np.stack([ramp] * 3, -1)).save(str(tmp_path / "ramp.png"))
    I.fromarray(np.full((64, 64, 3), 128, np.uint8)).save(
        str(tmp_path / "flat.png"))

    def sc(tex=None):
        bsdf = ({"type": "bumpmap", "scale": 2.0,
                 "bump": {"type": "bitmap", "filename": tex},
                 "nested": {"type": "diffuse"}}
                if tex else {"type": "diffuse"})
        return mi.load_dict({
            "type": "scene",
            "plate": {"type": "rectangle", "bsdf": bsdf},
            "light": {"type": "point", "position": [2, 2, 2],
                      "intensity": {"type": "rgb", "value": 10.0}},
            "sensor": {"type": "perspective", "fov": 45,
                       "to_world": tf.look_at([0, 0, 3], [0, 0, 0],
                                              [0, 1, 0]),
                       "film": {"type": "hdrfilm", "width": 8, "height": 8},
                       "sampler": {"type": "independent",
                                   "sample_count": 16}},
            "integrator": {"type": "path", "max_depth": 2},
        })

    s1 = sc(str(tmp_path / "ramp.png"))
    a = np.asarray(s1.integrator.render(s1, seed=0, spp=16))
    s2 = sc()
    b = np.asarray(s2.integrator.render(s2, seed=0, spp=16))
    s3 = sc(str(tmp_path / "flat.png"))
    c = np.asarray(s3.integrator.render(s3, seed=0, spp=16))
    assert np.abs(c - b)[..., :3].max() < 1e-5       # flat == unperturbed
    assert np.abs(a - b)[..., :3].mean() > 1e-3      # ramp tilts shading


def test_irradiancemeter_shape_bound():
    """Irradiancemeter bound to a rectangle under constant radiance L:
    measured E = pi * L exactly (irradiancemeter.cpp semantics)."""
    sc = mi.load_dict({
        "type": "scene",
        "plate": {"type": "rectangle",
                  "sensor": {"type": "irradiancemeter",
                             "film": {"type": "hdrfilm", "width": 1,
                                      "height": 1},
                             "sampler": {"type": "independent",
                                         "sample_count": 256}}},
        "env": {"type": "constant", "radiance": {"type": "rgb",
                                                 "value": 2.0}},
        "integrator": {"type": "path", "max_depth": 2},
    })
    img = np.asarray(sc.integrator.render(sc, sensor=sc.sensors[-1],
                                          seed=0, spp=256))
    assert abs(img.ravel()[0] / (2.0 * np.pi) - 1.0) < 1e-4


def test_batch_sensor_side_by_side():
    """Batch sensor renders nested sensors into film columns
    (batch.cpp): each half equals the standalone render of its child."""
    from mitsuba3dopplertof_tpu.core import transform as tf
    cam = {"type": "perspective", "fov": 45,
           "to_world": tf.look_at([0, 1, -3], [0, 0, 0], [0, 1, 0]),
           "film": {"type": "hdrfilm", "width": 8, "height": 8}}
    base = {
        "type": "scene",
        "light": {"type": "point", "position": [0, 2, 0],
                  "intensity": {"type": "rgb", "value": 5.0}},
        "floor": {"type": "rectangle",
                  "to_world": tf.rotate([1, 0, 0], -90) @ tf.scale([5] * 3)},
        "integrator": {"type": "path", "max_depth": 2},
    }
    sc = mi.load_dict(dict(base, sensor={
        "type": "batch", "s1": dict(cam), "s2": dict(cam),
        "film": {"type": "hdrfilm", "width": 16, "height": 8},
        "sampler": {"type": "independent", "sample_count": 32}}))
    img = np.asarray(sc.integrator.render(sc, seed=0, spp=32))
    sc2 = mi.load_dict(dict(base, sensor=dict(
        cam, sampler={"type": "independent", "sample_count": 32})))
    ref = np.asarray(sc2.integrator.render(sc2, seed=0, spp=64))
    for half in (img[:, :8, :3], img[:, 8:, :3]):
        assert abs(half.mean() / ref[..., :3].mean() - 1.0) < 0.05


def test_use_nee_off_unbiased():
    """use_nee=false (the reference prb_basic estimator): pure BSDF
    sampling must agree with the NEE+MIS estimator in the mean."""
    from mitsuba3dopplertof_tpu.core import transform as tf

    def build(use_nee):
        return mi.load_dict({
            "type": "scene",
            "integrator": {"type": "path", "max_depth": 3,
                           "use_nee": use_nee},
            "sensor": {"type": "perspective", "fov": 45,
                       "to_world": tf.look_at([0, 1.2, -3.2], [0, 0, 0],
                                              [0, 1, 0]),
                       "film": {"type": "hdrfilm", "width": 16,
                                "height": 16,
                                "rfilter": {"type": "box"}},
                       "sampler": {"type": "independent",
                                   "sample_count": 16}},
            "lamp": {"type": "rectangle",
                     "to_world": tf.translate([0, 2.0, 0])
                     @ tf.rotate([1, 0, 0], 90) @ tf.scale([0.8] * 3),
                     "emitter": {"type": "area",
                                 "radiance": {"type": "rgb", "value": 8.0}}},
            "floor": {"type": "rectangle",
                      "to_world": tf.translate([0, -0.5, 0])
                      @ tf.rotate([1, 0, 0], -90) @ tf.scale([3, 3, 1])},
        })
    a = np.asarray(mi.render(build(True), spp=256, seed=0))
    b = np.asarray(mi.render(build(False), spp=1024, seed=1))
    am, bm = a[..., :3].mean(), b[..., :3].mean()
    assert abs(am - bm) < 0.08 * am, (am, bm)


def test_prb_basic_wraps_pure_bsdf_sampling():
    integ = mi.load_dict({"type": "prb_basic", "max_depth": 3})
    assert integ.nested.use_nee is False
    integ2 = mi.load_dict({"type": "prb", "max_depth": 3})
    assert integ2.nested.use_nee is True


PP_SCENE = '''
<scene version="3.0.0">
  <integrator type="path"><integer name="max_depth" value="2"/></integrator>
  <sensor type="perspective">
    <float name="fov" value="45"/>
    <float name="principal_point_offset_x" value="{ppx}"/>
    <film type="hdrfilm">
      <integer name="width" value="32"/><integer name="height" value="32"/>
      <rfilter type="box"/>
    </film>
    <sampler type="independent"><integer name="sample_count" value="16"/></sampler>
  </sensor>
  <shape type="sphere">
    <float name="radius" value="0.15"/>
    <transform name="to_world"><translate z="2"/></transform>
    <emitter type="area"><rgb name="radiance" value="10"/></emitter>
  </shape>
</scene>'''


def test_principal_point_offset_shifts_image():
    """principal_point_offset_x (film-size units, reference
    perspective.cpp:191-205) translates image content horizontally by
    offset*width pixels without changing total energy."""
    base = render(PP_SCENE.format(ppx=0.0))
    off = render(PP_SCENE.format(ppx=0.25))
    col0 = int(np.argmax(base.sum(axis=(0, 2))))
    col1 = int(np.argmax(off.sum(axis=(0, 2))))
    assert abs(abs(col1 - col0) - 8) <= 1, (col0, col1)
    assert abs(off.sum() / base.sum() - 1.0) < 0.05


def test_aov_albedo_channel():
    """aov 'albedo' returns the first-hit diffuse reflectance (reference
    aov.cpp eval_diffuse_reflectance), zero on misses."""
    xml = '''
    <scene version="3.0.0">
      <integrator type="aov"><string name="aovs" value="alb:albedo"/>
        <integrator type="path"><integer name="max_depth" value="2"/></integrator>
      </integrator>
      <sensor type="perspective"><float name="fov" value="45"/>
        <film type="hdrfilm"><integer name="width" value="8"/>
          <integer name="height" value="8"/><rfilter type="box"/></film>
        <sampler type="independent"><integer name="sample_count" value="4"/></sampler>
      </sensor>
      <shape type="rectangle">
        <transform name="to_world"><translate z="2"/></transform>
        <bsdf type="twosided"><bsdf type="diffuse">
          <rgb name="reflectance" value="0.8,0.6,0.4"/></bsdf></bsdf>
      </shape>
      <emitter type="point">
        <transform name="to_world"><translate z="1"/></transform>
        <rgb name="intensity" value="5"/>
      </emitter>
    </scene>'''
    img = render(xml, spp=4)
    # channels: rgb(3) [+ alpha/weight handled by develop] + albedo 3
    alb = img[..., -3:]
    center = alb[4, 4]
    assert np.allclose(center, [0.8, 0.6, 0.4], atol=1e-3), center
    import mitsuba3dopplertof_tpu as mi
    with pytest.raises(RuntimeError, match="differential"):
        mi.load_dict({"type": "aov", "aovs": "d:duv_dx"})
