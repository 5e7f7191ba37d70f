"""Tests for utils/profiling.py trace parsing (the machinery behind
tools/serving_device_time.py and tools/train_step_breakdown.py).

The synthetic-event tests pin the parsing semantics exactly; the live test
captures a real jax.profiler trace on CPU and checks the xprof conversion
path end-to-end (skipped when the converter is unavailable).
"""

import jax
import jax.numpy as jnp
import pytest

from keras_object_detection_tpu.utils.profiling import (
    device_lane_ms, op_breakdown, op_category, trace, traced_events)


def test_op_category():
    assert op_category("fusion.123") == "fusion"
    assert op_category("%convolution.5") == "convolution"
    assert op_category("copy-done.2") == "copy"
    assert op_category("copy-start") == "copy"
    assert op_category("all-reduce-start.1") == "all-reduce"
    assert op_category("reduce-window.7") == "reduce-window"
    assert op_category("reduce.3") == "reduce"
    assert op_category("select-and-scatter.2") == "select-and-scatter"
    assert op_category("custom-call.4") == "custom-call"
    assert op_category("dynamic-slice") == "dynamic-slice"
    assert op_category("123garbage") == "other"


def _meta(pid, pname, tid=None, tname=None):
    evs = [{"ph": "M", "name": "process_name", "pid": pid,
            "args": {"name": pname}}]
    if tid is not None:
        evs.append({"ph": "M", "name": "thread_name", "pid": pid, "tid": tid,
                    "args": {"name": tname}})
    return evs


def _synthetic_events():
    # device plane with an XLA Modules lane and an XLA Ops lane; a host
    # plane that must be ignored. dur is in microseconds (Chrome trace).
    evs = []
    evs += _meta(1, "/device:TPU:0 (plane)", 10, "XLA Modules")
    evs += _meta(1, "/device:TPU:0 (plane)", 11, "XLA Ops")
    evs += _meta(2, "/host:CPU (plane)", 20, "XLA Ops")
    evs.append({"ph": "X", "pid": 1, "tid": 10, "name": "jit_step",
                "dur": 2000.0, "ts": 0})
    evs.append({"ph": "X", "pid": 1, "tid": 11, "name": "fusion.1",
                "dur": 700.0, "ts": 0})
    evs.append({"ph": "X", "pid": 1, "tid": 11, "name": "fusion.2",
                "dur": 300.0, "ts": 700})
    evs.append({"ph": "X", "pid": 1, "tid": 11, "name": "convolution.9",
                "dur": 900.0, "ts": 1000})
    evs.append({"ph": "X", "pid": 1, "tid": 11, "name": "copy-done.3",
                "dur": 100.0, "ts": 1900})
    # host event that must not count
    evs.append({"ph": "X", "pid": 2, "tid": 20, "name": "fusion.1",
                "dur": 5000.0, "ts": 0})
    return evs


def test_device_lane_ms_synthetic():
    lanes = device_lane_ms(_synthetic_events())
    assert lanes == {
        "/device:TPU:0 (plane)/XLA Modules": 2.0,
        "/device:TPU:0 (plane)/XLA Ops": 2.0,
    }


def test_op_breakdown_synthetic():
    bd = op_breakdown(_synthetic_events())
    assert bd["total_ms"] == pytest.approx(2.0)
    assert bd["categories"] == pytest.approx(
        {"fusion": 1.0, "convolution": 0.9, "copy": 0.1})
    # top op is the single 0.9 ms convolution, then the 0.7 ms fusion
    assert bd["top_ops"][0] == {"name": "convolution.9", "ms": 0.9,
                                "count": 1}
    assert bd["top_ops"][1]["name"] == "fusion.1"


def test_traced_events_live_cpu(tmp_path):
    """End-to-end: capture a real trace of a jitted program and parse it."""
    pytest.importorskip("xprof.convert")
    f = jax.jit(lambda x: (x @ x).sum())
    x = jnp.ones((64, 64), jnp.float32)
    float(f(x))  # compile outside the trace
    with trace(str(tmp_path)):
        float(f(x))
    events = traced_events(str(tmp_path))
    assert events, "trace produced no events"
    # the jitted program must appear somewhere in the trace
    names = {str(e.get("name", "")) for e in events}
    assert any("jit" in n for n in names)
