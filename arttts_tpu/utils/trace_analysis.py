"""Post-processing for `jax.profiler` device traces.

The reference has no profiling subsystem at all (SURVEY.md §5.1); here the
perfetto trace (`*.trace.json.gz`) that `utils/profiling.trace` captures is
parsed into per-op device-time tables and a device-busy figure, which the
benchmark uses for whole-program MFU accounting — XLA's `cost_analysis`
cannot see inside Pallas custom calls, but the profiler times every op that
executes, custom calls included (the r3 bench's `mfu_xla_ops` went
meaningless once the U-Net body and vocoder moved to Pallas).
"""

from __future__ import annotations

import collections
import glob
import gzip
import json
import os
from typing import Dict, List, Tuple


def _latest_trace_file(trace_dir: str) -> str:
    files = sorted(
        glob.glob(
            os.path.join(trace_dir, "**", "*.trace.json.gz"), recursive=True
        )
    )
    if not files:
        raise FileNotFoundError(f"no *.trace.json.gz under {trace_dir}")
    return files[-1]


def load_device_events(trace_dir: str) -> List[dict]:
    """All complete ('X') events on device-pid "XLA Ops" threads, each a
    dict with name/ts/dur (microseconds).

    Only "XLA Ops" threads count: the "Steps" thread carries one umbrella
    event per executed program (named "0", "1", ...) spanning the whole
    step INCLUDING device idle gaps — it would both inflate the busy union
    and appear as a giant fake leaf op (seen on the first train-step trace:
    a 5.96 ms "0" leaf over a ~5.6 ms op sum)."""
    data = json.load(gzip.open(_latest_trace_file(trace_dir)))
    events = data["traceEvents"]
    device_pids = set()
    op_tids = set()
    for e in events:
        if e.get("ph") == "M":
            if e.get("name") == "process_name" and "TPU" in str(
                e["args"].get("name", "")
            ):
                device_pids.add(e["pid"])
            if (
                e.get("name") == "thread_name"
                and e["args"].get("name") == "XLA Ops"
            ):
                op_tids.add((e["pid"], e["tid"]))
    out = []
    for e in events:
        if (
            e.get("ph") == "X"
            and e["pid"] in device_pids
            and (e["pid"], e.get("tid")) in op_tids
        ):
            out.append(e)
    return out


def device_busy_seconds(trace_dir: str) -> float:
    """Union of device op intervals (seconds): wall time the TPU core spent
    executing anything.  Nested events (e.g. a `while` containing its body
    ops) collapse into one interval, so parents don't double-count."""
    spans = sorted(
        (e["ts"], e["ts"] + e["dur"]) for e in load_device_events(trace_dir)
    )
    busy = 0.0
    cur_s = cur_e = None
    for s, t in spans:
        if cur_e is None or s > cur_e:
            if cur_e is not None:
                busy += cur_e - cur_s
            cur_s, cur_e = s, t
        else:
            cur_e = max(cur_e, t)
    if cur_e is not None:
        busy += cur_e - cur_s
    return busy / 1e6


def leaf_op_table(trace_dir: str) -> List[Tuple[str, float, int]]:
    """Per-op (name, total_ms, count) for LEAF device ops, sorted by total
    time descending.  An event is a leaf if no other event starts strictly
    inside it (nesting detection by interval containment per thread)."""
    events = load_device_events(trace_dir)
    by_tid: Dict[int, List[dict]] = collections.defaultdict(list)
    for e in events:
        by_tid[e.get("tid")].append(e)
    agg: Dict[str, List[float]] = collections.defaultdict(lambda: [0.0, 0])
    for tid_events in by_tid.values():
        tid_events.sort(key=lambda e: (e["ts"], -e["dur"]))
        # an event is a parent if the next event starts before it ends
        for i, e in enumerate(tid_events):
            end = e["ts"] + e["dur"]
            is_parent = (
                i + 1 < len(tid_events) and tid_events[i + 1]["ts"] < end
            )
            if not is_parent:
                a = agg[e["name"]]
                a[0] += e["dur"] / 1e3
                a[1] += 1
    return sorted(
        ((k, v[0], v[1]) for k, v in agg.items()), key=lambda r: -r[1]
    )


def grouped_report(
    trace_dir: str, groups: Dict[str, Tuple[str, ...]] | None = None
) -> Dict[str, float]:
    """Bucket leaf op time (ms) by substring groups, e.g.
    {"conv": ("conv",), "copy": ("copy", "bitcast")}; ungrouped time lands
    in "other"."""
    table = leaf_op_table(trace_dir)
    groups = groups or {}
    out = {k: 0.0 for k in groups}
    out["other"] = 0.0
    for name, ms, _ in table:
        for key, subs in groups.items():
            if any(s in name for s in subs):
                out[key] += ms
                break
        else:
            out["other"] += ms
    return {k: round(v, 3) for k, v in out.items()}
