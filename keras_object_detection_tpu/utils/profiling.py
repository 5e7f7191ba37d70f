"""Profiling / tracing utilities (SURVEY.md §5: the reference's only tracing
is manual ``time.time()`` wall-clock prints with TensorBoard profiling
explicitly disabled, ref train.py:159 ``profile_batch=0``).

TPU-native replacements:
- ``trace(logdir)``: a ``jax.profiler`` trace context producing TensorBoard /
  Perfetto-compatible traces of device execution,
- ``StepTimer``: steady-state step timing with proper device synchronization
  (value readback — see bench.py for why plain ``block_until_ready`` is not
  trusted on every platform),
- ``device_memory_stats()``: live HBM usage,
- ``traced_events`` / ``device_lane_ms`` / ``op_breakdown``: parse a captured
  trace's xplane protos (via xprof's trace_viewer converter) into per-lane
  device busy time and a per-HLO-op-category time breakdown — the machinery
  behind ``tools/serving_device_time.py`` and
  ``tools/train_step_breakdown.py``.
"""

from __future__ import annotations

import contextlib
import glob
import json
import os
import re
import time
from typing import Dict, Iterator, List, Optional, Tuple

import jax


@contextlib.contextmanager
def trace(logdir: str, create_perfetto_link: bool = False) -> Iterator[None]:
    """Capture a jax.profiler trace of everything inside the context."""
    jax.profiler.start_trace(logdir, create_perfetto_link=create_perfetto_link)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    """Rolling throughput meter for a training loop.

    >>> timer = StepTimer(batch_size=64)
    >>> for batch in ds: state, m = step(state, *batch); timer.tick(m["total"])
    >>> timer.summary()  # {'steps': ..., 'images_per_s': ..., 'p50_ms': ...}
    """

    def __init__(self, batch_size: int, sync_every: int = 10):
        self.batch_size = batch_size
        self.sync_every = sync_every
        self._times: list = []
        self._last = None
        self._steps = 0

    def tick(self, sync_value=None) -> None:
        """Call once per step; pass a device scalar to force a sync point
        every ``sync_every`` steps."""
        self._steps += 1
        if sync_value is not None and self._steps % self.sync_every == 0:
            float(sync_value)  # device round-trip = true step boundary
            now = time.perf_counter()
            if self._last is not None:
                self._times.append((now - self._last) / self.sync_every)
            self._last = now

    def summary(self) -> Dict[str, float]:
        if not self._times:
            return {"steps": self._steps, "images_per_s": 0.0, "p50_ms": 0.0}
        ts = sorted(self._times)
        p50 = ts[len(ts) // 2]
        return {
            "steps": self._steps,
            "images_per_s": self.batch_size / p50,
            "p50_ms": p50 * 1000.0,
        }


def traced_events(trace_dir: str) -> List[dict]:
    """Parse every ``*.xplane.pb`` under ``trace_dir`` into Chrome-trace
    events via xprof's trace_viewer converter (the profiler's own tooling —
    no TensorFlow dependency). Returns the raw ``traceEvents`` list;
    raises RuntimeError when the converter or the trace is unavailable."""
    try:
        from xprof.convert import raw_to_tool_data as r2t
    except Exception as e:  # pragma: no cover - env without xprof
        raise RuntimeError(f"xprof converter unavailable: {e!r}") from e
    paths = glob.glob(os.path.join(trace_dir, "**", "*.xplane.pb"),
                      recursive=True)
    if not paths:
        raise RuntimeError(f"no xplane.pb under {trace_dir}")
    data, _mime = r2t.xspace_to_tool_data(paths, "trace_viewer", {})
    if isinstance(data, bytes):
        data = data.decode()
    return json.loads(data).get("traceEvents", [])


def _lane_names(events: List[dict]) -> Tuple[Dict, Dict]:
    """(pid -> process name, (pid, tid) -> thread/lane name) metadata."""
    pnames = {e["pid"]: str(e.get("args", {}).get("name", ""))
              for e in events
              if e.get("ph") == "M" and e.get("name") == "process_name"}
    tnames = {(e["pid"], e.get("tid")): str(e.get("args", {}).get("name", ""))
              for e in events
              if e.get("ph") == "M" and e.get("name") == "thread_name"}
    return pnames, tnames


def _device_pids(pnames: Dict) -> set:
    """Accelerator-plane pids ("/device:TPU:0 ..."), never host threads."""
    return {pid for pid, name in pnames.items()
            if ("tpu" in name.lower() or "device" in name.lower())
            and "host" not in name.lower()}


def device_lane_ms(events: List[dict]) -> Dict[str, float]:
    """Total duration (ms) per device-plane lane.

    The "XLA Modules" lane holds one non-overlapping event per executed
    program, so its sum IS device busy time; other lanes ("Framework Name
    Scope", "XLA Ops") stack nested events and summing them double-counts.
    """
    pnames, tnames = _lane_names(events)
    dev = _device_pids(pnames)
    lanes: Dict[str, float] = {}
    for e in events:
        if e.get("ph") == "X" and e.get("pid") in dev and e.get("dur"):
            key = f"{pnames.get(e['pid'], e['pid'])}/" \
                  f"{tnames.get((e['pid'], e.get('tid')), e.get('tid'))}"
            lanes[key] = lanes.get(key, 0.0) + float(e["dur"]) / 1e3
    return lanes


_OP_PREFIX = re.compile(r"^%?([a-zA-Z][a-zA-Z_-]*)")


def op_category(name: str) -> str:
    """HLO instruction name -> coarse category ("fusion.123" -> "fusion",
    "%convolution.5" -> "convolution", "copy-done.2" -> "copy")."""
    m = _OP_PREFIX.match(name.strip())
    if not m:
        return "other"
    cat = m.group(1).lower()
    # canonicalize async pairs and numbered variants
    for base in ("copy", "all-reduce", "all-gather", "reduce-scatter",
                 "collective-permute", "send", "recv"):
        if cat.startswith(base):
            return base
    if cat.startswith("reduce"):  # reduce, reduce-window
        return cat
    return cat


def op_breakdown(events: List[dict], top_k: int = 25) -> Dict[str, object]:
    """Aggregate the device "XLA Ops" lane into per-category busy time.

    Returns ``{"categories": {cat: ms}, "top_ops": [{name, ms, count}, ...],
    "total_ms": float}`` summed over the whole trace (divide by the number
    of traced calls for per-call numbers). Uses the XLA Ops lane — the leaf
    instruction timeline — whose events tile the module execution without
    nesting, so the category sums are additive.
    """
    pnames, tnames = _lane_names(events)
    dev = _device_pids(pnames)
    cats: Dict[str, float] = {}
    per_op: Dict[str, List[float]] = {}
    total = 0.0
    for e in events:
        if e.get("ph") != "X" or e.get("pid") not in dev or not e.get("dur"):
            continue
        lane = str(tnames.get((e["pid"], e.get("tid")), "")).lower()
        if "xla ops" not in lane:
            continue
        ms = float(e["dur"]) / 1e3
        name = str(e.get("name", ""))
        cat = op_category(name)
        cats[cat] = cats.get(cat, 0.0) + ms
        total += ms
        acc = per_op.setdefault(name, [0.0, 0])
        acc[0] += ms
        acc[1] += 1
    top = sorted(per_op.items(), key=lambda kv: -kv[1][0])[:top_k]
    return {
        "categories": dict(sorted(cats.items(), key=lambda kv: -kv[1])),
        "top_ops": [{"name": n, "ms": round(v[0], 4), "count": v[1]}
                    for n, v in top],
        "total_ms": round(total, 4),
    }


def device_memory_stats() -> Optional[Dict[str, int]]:
    """Per-device HBM stats when the backend exposes them."""
    try:
        dev = jax.devices()[0]
        stats = dev.memory_stats()
        return {k: int(v) for k, v in stats.items()} if stats else None
    except Exception:
        return None
