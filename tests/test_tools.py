"""Wiring tests for the CLI tools (reference parity rows: Inspector,
ImageComparer): tree/flatten/pick report and image compare metrics must
drive end-to-end in-process."""

import numpy as np

from stratum_tpu.io import image as sio
from stratum_tpu.tools import compare as tcompare
from stratum_tpu.tools import inspect as tinspect


def test_inspect_tree_flatten_pick(capsys):
    rc = tinspect.main(
        ["--scene=cornell", "--flatten", "--pick=16,16",
         "--width=32", "--height=32"]
    )
    assert rc == 0
    out = capsys.readouterr().out
    assert "root" in out
    assert "triangles" in out
    assert "pick (16,16): instance=" in out
    assert "depth=" in out


def test_compare_metrics_and_diff(tmp_path, capsys):
    a = np.linspace(0, 1, 16 * 16 * 3, dtype=np.float32).reshape(16, 16, 3)
    b = a + 0.1
    pa, pb = tmp_path / "a.hdr", tmp_path / "b.hdr"
    sio.save_image(str(pa), a)
    sio.save_image(str(pb), b)
    diff = tmp_path / "d.png"
    rc = tcompare.main([str(pa), str(pb), f"--diff={diff}"])
    assert rc == 0
    out = capsys.readouterr().out
    assert "rmse" in out and "smape" in out
    assert diff.exists()
    # single-metric mode prints just the number
    rc = tcompare.main([str(pa), str(pb), "--metric=rmse"])
    assert rc == 0
    val = float(capsys.readouterr().out.strip())
    assert abs(val - 0.1) < 0.02


def test_compare_shape_mismatch_fails(tmp_path):
    a = np.zeros((8, 8, 3), np.float32)
    b = np.zeros((8, 16, 3), np.float32)
    pa, pb = tmp_path / "a.hdr", tmp_path / "b.hdr"
    sio.save_image(str(pa), a)
    sio.save_image(str(pb), b)
    assert tcompare.main([str(pa), str(pb)]) == 1
