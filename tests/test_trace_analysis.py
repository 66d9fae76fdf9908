"""Unit tests for the profiler-trace post-processor (utils/trace_analysis.py)
on a synthetic perfetto trace: interval-union busy time, leaf-op detection
(parents containing nested ops must not double-count), and substring
grouping. The real-trace path is exercised on hardware by
scripts/profile_train.py and the bench's whole-program MFU accounting."""

import gzip
import json
import os

import numpy as np
import pytest

from arttts_tpu.utils.trace_analysis import (
    device_busy_seconds,
    grouped_report,
    leaf_op_table,
)


@pytest.fixture()
def trace_dir(tmp_path):
    events = [
        # metadata: pid 7 is the TPU device, thread 3 is "XLA Ops"
        {"ph": "M", "pid": 7, "name": "process_name",
         "args": {"name": "/device:TPU:0"}},
        {"ph": "M", "pid": 7, "tid": 3, "name": "thread_name",
         "args": {"name": "XLA Ops"}},
        # metadata: pid 1 is host python — must be ignored
        {"ph": "M", "pid": 1, "name": "process_name",
         "args": {"name": "python3"}},
        {"ph": "M", "pid": 1, "tid": 9, "name": "thread_name",
         "args": {"name": "XLA Ops"}},
        {"ph": "X", "pid": 1, "tid": 9, "name": "host_noise", "ts": 0,
         "dur": 10_000},
        # device ops: a 100us parent (while loop) containing two children,
        # then a disjoint 50us leaf after a 50us gap
        {"ph": "X", "pid": 7, "tid": 3, "name": "while", "ts": 0, "dur": 100},
        {"ph": "X", "pid": 7, "tid": 3, "name": "conv_a", "ts": 0, "dur": 60},
        {"ph": "X", "pid": 7, "tid": 3, "name": "copy_b", "ts": 60, "dur": 40},
        {"ph": "X", "pid": 7, "tid": 3, "name": "conv_a", "ts": 150, "dur": 50},
    ]
    d = tmp_path / "plugins"
    os.makedirs(d)
    with gzip.open(d / "host.trace.json.gz", "wt") as f:
        json.dump({"traceEvents": events}, f)
    return str(tmp_path)


def test_device_busy_union(trace_dir):
    # union of [0,100] and [150,200] = 150 us; the nested children and the
    # host event must not inflate it
    assert np.isclose(device_busy_seconds(trace_dir), 150e-6)


def test_leaf_table_excludes_parents(trace_dir):
    table = dict((name, (ms, cnt)) for name, ms, cnt in leaf_op_table(trace_dir))
    assert "while" not in table  # parent: conv_a starts strictly inside it
    assert table["conv_a"] == (0.11, 2)  # 60us + 50us
    assert table["copy_b"] == (0.04, 1)
    assert "host_noise" not in table


def test_grouped_report(trace_dir):
    rep = grouped_report(
        trace_dir, {"conv": ("conv",), "copy": ("copy", "bitcast")}
    )
    assert rep == {"conv": 0.11, "copy": 0.04, "other": 0.0}
