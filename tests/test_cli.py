"""CLI renderer (reference src/mitsuba/mitsuba.cpp option surface)."""

import os

import numpy as np
import pytest

from mitsuba3dopplertof_tpu.cli import main as cli_main
from mitsuba3dopplertof_tpu.io.bitmap import read_exr

SCENE = "/root/reference/configs_example/scene.xml"


def test_cli_render_with_defines(tmp_path):
    out = str(tmp_path / "img.exr")
    cli_main([SCENE, "-o", out, "-D", "resx=8", "-D", "resy=8",
              "--spp", "8", "-s", "0", "-t", "4", "-v"])
    ch = read_exr(out)
    names = sorted(ch)
    img = np.stack([ch[n] for n in names[:3]], -1)
    assert img.shape[:2] == (8, 8) and np.isfinite(img).all()


def test_cli_bad_define(tmp_path):
    with pytest.raises(SystemExit):
        cli_main([SCENE, "-D", "novalue"])


def test_cli_update_roundtrip(tmp_path):
    import shutil
    import mitsuba3dopplertof_tpu as mi
    xml = str(tmp_path / "scene.xml")
    shutil.copy(SCENE, xml)
    for sub in ("meshes", "textures"):
        src = os.path.join(os.path.dirname(SCENE), sub)
        if os.path.isdir(src):
            shutil.copytree(src, str(tmp_path / sub))
    out = str(tmp_path / "updated.xml")
    cli_main([xml, "-u", "-o", out, "-D", "resx=8", "-D", "resy=8"])
    sc = mi.load_file(out)
    assert sc.sensor.film.size[0] == 8
