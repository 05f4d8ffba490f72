"""Hermetic gate for the real-data readiness kit (tools/verify_dataset.py):
running the full check battery against the synthetic TUM fixture must pass —
this is exactly the procedure BASELINE.md prescribes for the day a real
TUM/ICL directory appears (VERDICT round-2 item 5)."""

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))))


@pytest.fixture(scope="module")
def fixture_dir(tmp_path_factory):
    from rgbd_pose_estimation_tpu.data.tum import write_synthetic_tum

    root = tmp_path_factory.mktemp("tum_fixture")
    write_synthetic_tum(str(root), n_frames=6, size=(64, 48), motion_scale=0.01)
    return str(root)


def test_verify_dataset_passes_on_fixture(fixture_dir, capsys):
    import importlib

    import tools.verify_dataset as vd

    importlib.reload(vd)  # reset the module-level results list
    rc = vd.main(fixture_dir)
    out = capsys.readouterr().out
    assert rc == 0, out
    assert "FAIL" not in out.replace("0 FAIL", "")
    # The kit must print the exact commands of record.
    assert "cli.main odom" in out and "cli.main eval" in out


def test_verify_dataset_catches_byteswap(fixture_dir, tmp_path, capsys):
    """A deliberately byte-swapped 16-bit depth PNG (the classic endianness
    failure) must be reported as a depth-scale/decode FAIL."""
    import shutil

    import cv2
    import importlib

    import tools.verify_dataset as vd

    root = tmp_path / "swapped"
    shutil.copytree(fixture_dir, root)
    ddir = root / "depth"
    for name in os.listdir(ddir):
        img = cv2.imread(str(ddir / name), cv2.IMREAD_UNCHANGED)
        cv2.imwrite(str(ddir / name), img.byteswap())
    importlib.reload(vd)
    rc = vd.main(str(root))
    out = capsys.readouterr().out
    assert rc == 1, out
    assert "FAIL" in out
