"""The examples/ scripts run end to end in --quick mode (the switcher's
first-contact surface; each exercises a full workflow)."""

import os
import runpy
import sys

import pytest

EX = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "examples")


@pytest.mark.parametrize("script", [
    "doppler_tof.py", "inverse_rendering.py", "polarization.py",
    "time_sampling_variance.py"])
def test_example_quick(script, tmp_path, monkeypatch, capsys):
    monkeypatch.setattr(sys, "argv", ["x", "--quick"]
                        + (["--out", str(tmp_path)]
                           if script in ("doppler_tof.py",
                                         "polarization.py") else []))
    runpy.run_path(os.path.join(EX, script), run_name="__main__")
    out = capsys.readouterr().out
    assert out.strip(), script
