"""mi.test.util scaffolding (reference src/python/python/test/util.py)."""

import os

import numpy as np
import jax.numpy as jnp

from mitsuba3dopplertof_tpu.test.util import (find_resource,
                                              fresolver_append_path,
                                              check_vectorization)
from mitsuba3dopplertof_tpu.core.fresolver import file_resolver


def test_find_resource():
    p = find_resource("tests")
    assert os.path.isdir(p) and p.endswith("tests")


@fresolver_append_path
def test_fresolver_append_path_inside():
    paths = file_resolver().paths
    here = os.path.dirname(os.path.realpath(__file__))
    assert here in paths


def test_fresolver_restored():
    here = os.path.dirname(os.path.realpath(__file__))
    before = list(file_resolver().paths)

    @fresolver_append_path
    def inner():
        assert here in file_resolver().paths
    inner()
    assert file_resolver().paths == before


def test_tmpfile_fixture(tmpfile):
    assert os.path.exists(tmpfile)


def test_check_vectorization():
    check_vectorization(lambda a, b: jnp.sin(a) * b + a * a, arg_dims=[1, 1])


def test_binding_type_aliases():
    """Tutorial-compat aliases: Point/Vector/Color constructors, TensorXf,
    Thread.thread().file_resolver()."""
    import numpy as np
    import mitsuba3dopplertof_tpu as mi
    assert np.allclose(mi.ScalarPoint3f(1, 2, 3), [1, 2, 3])
    assert np.allclose(mi.Vector3f([4, 5, 6]), [4, 5, 6])
    assert np.allclose(mi.Color3f(0.25), [0.25] * 3)
    assert mi.TensorXf(np.zeros(6), shape=(2, 3)).shape == (2, 3)
    fr = mi.Thread.thread().file_resolver()
    assert fr is mi.file_resolver()


def test_xml_path_tag_extends_resolver(tmp_path):
    """<path value=.../> adds a search path (reference xml.cpp
    Tag::Resource): meshes resolve from the added directory."""
    import numpy as np
    import mitsuba3dopplertof_tpu as mi
    assets = tmp_path / "assets"
    assets.mkdir()
    (assets / "tri.obj").write_text(
        "v 0 0 0\nv 1 0 0\nv 0 1 0\nf 1 2 3\n")
    scene_xml = tmp_path / "scene.xml"
    scene_xml.write_text('''
    <scene version="3.0.0">
      <path value="assets"/>
      <sensor type="perspective">
        <film type="hdrfilm"><integer name="width" value="4"/>
          <integer name="height" value="4"/></film>
      </sensor>
      <shape type="obj"><string name="filename" value="tri.obj"/></shape>
    </scene>''')
    sc = mi.load_file(str(scene_xml))
    assert len(sc.shapes) == 1


def test_native_obj_parser_parity(tmp_path):
    """The native OBJ parser (ops/native/obj_shim.cpp) produces the same
    mesh as the pure-Python fallback (ngons, negative indices, wedges)."""
    import numpy as np
    import mitsuba3dopplertof_tpu.io.mesh_loaders as ml
    p = str(tmp_path / "t.obj")
    open(p, "w").write(
        "v 0 0 0\nv 1 0 0\nv 1 1 0\nv 0 1 0\n"
        "vn 0 0 1\nvt 0 0\nvt 1 0\nvt 1 1\nvt 0 1\n"
        "f 1/1/1 2/2/1 3/3/1 4/4/1\n"
        "f -4/-4/-1 -3/-3/-1 -2/-2/-1\n")
    native = ml.load_obj(p)
    old = ml._OBJ_SHIM, ml._OBJ_SHIM_TRIED
    ml._OBJ_SHIM, ml._OBJ_SHIM_TRIED = None, True
    try:
        py = ml.load_obj(p)
    finally:
        ml._OBJ_SHIM, ml._OBJ_SHIM_TRIED = old
    assert np.allclose(native.vertices, py.vertices)
    assert np.array_equal(native.faces, py.faces)
    assert np.allclose(native.normals, py.normals)
    assert np.allclose(native.uvs, py.uvs)
    assert native.faces.shape == (3, 3)   # quad fan + tri
