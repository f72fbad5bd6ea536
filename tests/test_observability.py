"""Observability parity: leveled logging (ref Verbose, System.h:47-72) and
the debug dump (ref System::SaveDebugData, System.cc:836)."""

import json

import numpy as np

from tpuslam.utils import verbose as V


def test_verbose_levels(capsys):
    V.set_level(V.Level.QUIET)
    V.print_mess("hidden", V.Level.NORMAL)
    assert capsys.readouterr().err == ""
    V.set_level("normal")
    V.print_mess("shown", V.Level.NORMAL)
    V.print_mess("hidden2", V.Level.DEBUG)
    err = capsys.readouterr().err
    assert "shown" in err and "hidden2" not in err
    V.set_level(V.Level.QUIET)


def test_save_debug_data(tmp_path):
    from tpuslam.cameras import Pinhole
    from tpuslam.engine import System

    cam = Pinhole([100.0, 100.0, 80.0, 60.0], 160, 120)
    slam = System(cam)
    p = tmp_path / "debug.json"
    slam.save_debug_data(str(p))
    data = json.loads(p.read_text())
    for key in ("imu_events", "loops_closed", "keyframes", "map_points",
                "maps", "imu_initialized", "tracking_state", "stage_ms"):
        assert key in data, key
    assert data["keyframes"] == 0
    assert data["tracking_state"] == "NO_IMAGES_YET"
