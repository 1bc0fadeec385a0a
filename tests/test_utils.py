"""Flags, profiler, and compare-metric unit tests (reference behaviors:
Instance option multimap Core/Instance.cpp:57-70, Profiler sample tree,
CompareMetric semantics)."""

import time

import numpy as np

from stratum_tpu.utils import compare
from stratum_tpu.utils.flags import Options
from stratum_tpu.utils.profiler import Profiler


def test_flags_grammar():
    o = Options(
        ["--width=512", "-height:256", "--debug", "scene.obj", "--k=a", "--k=b"]
    )
    assert o.get_int("width", 0) == 512
    assert o.get_int("height", 0) == 256
    assert o.get_bool("debug") is True
    assert o.get_bool("missing", False) is False
    assert o.positional == ["scene.obj"]
    assert o.find_all("k") == ["a", "b"]
    assert o.find("k") == "b"  # last wins (find_argument semantics)


def test_feature_flags_negation():
    o = Options(["--bdptFlag=NEE", "--bdptFlag=~MIS"])
    out = o.feature_flags("bdptFlag", {"NEE": False, "MIS": True, "X": False})
    assert out == {"NEE": True, "MIS": False, "X": False}


def test_profiler_tree_and_report():
    p = Profiler()
    p.begin_frame()
    with p.region("outer"):
        with p.region("inner"):
            time.sleep(0.01)
    p.end_frame()
    rep = p.report()
    assert "outer" in rep and "inner" in rep
    p.begin_frame()  # starting the next frame records the previous one
    assert len(p.frame_times) == 1


def test_compare_metrics():
    a = np.zeros((4, 4, 3), np.float32)
    b = np.ones((4, 4, 3), np.float32)
    assert float(compare.mse(a, b)) == 1.0
    assert float(compare.rmse(a, b)) == 1.0
    assert 0.99 < float(compare.smape(a, b)) <= 1.0
    assert float(compare.average(b)) == 1.0
    assert float(compare.mse(b, b)) == 0.0
