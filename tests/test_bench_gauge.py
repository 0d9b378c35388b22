"""The gauge->drag calibration fit lives in bench.py (source of truth)
and is mirrored inline in tools/bench_diff.py to keep that tool
import-light. These pins keep the two copies equal and the fit anchored
to its calibration data (docs/BENCH_NOTES.md r12 calibration table)."""

import os
import sys

import pytest

sys.path.insert(
    0,
    os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools"
    ),
)

import bench
import bench_diff


def test_constants_mirrored():
    assert bench.GAUGE_FIT_SLOPE == bench_diff.GAUGE_FIT_SLOPE
    assert bench.GAUGE_FIT_INTERCEPT == bench_diff.GAUGE_FIT_INTERCEPT
    assert bench.IDLE_GAUGE == bench_diff.IDLE_GAUGE


@pytest.mark.parametrize("g", [None, 1.0, 1.232, 1.3, 1.505, 2.0])
def test_est_drag_agrees(g):
    assert bench.est_drag(g) == bench_diff.est_drag(g)


def test_est_drag_anchors():
    # normalized to 1.0 at the quietest observed gauge, floored at 1.0
    assert bench.est_drag(bench.IDLE_GAUGE) == 1.0
    assert bench.est_drag(1.0) == 1.0
    # the fit reproduces the four calibration archives' drags-vs-pooled-
    # minima within 0.12 RELATIVE to the idle anchor's raw value (the
    # absolute fit residual bound from the least-squares table)
    idle_raw = bench.GAUGE_FIT_SLOPE * bench.IDLE_GAUGE + bench.GAUGE_FIT_INTERCEPT
    for gauge, drag in [(1.232, 1.114), (1.393, 1.399), (1.490, 1.391), (1.505, 1.575)]:
        est_raw = bench.est_drag(gauge) * idle_raw
        assert abs(est_raw - drag) <= 0.125, (gauge, est_raw, drag)
    # loud threshold sits ~8% above idle under the fit
    assert 1.05 < bench.est_drag(bench.REGIME_FACTOR) < 1.12
