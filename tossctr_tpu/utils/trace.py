"""jax.profiler trace post-processing: per-op device-time budgets.

The reference has no profiling at all (SURVEY.md §5 "Tracing: none");
this module is the TPU build's observability primitive: run a step
window under ``jax.profiler.trace``, then fold the exported Perfetto
``trace.json.gz`` into a named device-time breakdown (the same numbers
DESIGN.md §2 quotes).  Used by ``bench.py --breakdown`` to attach a
scatter/select/attention budget to the bench JSON.
"""

from __future__ import annotations

import glob
import gzip
import json
import os
import re
from typing import Dict, List, Optional, Tuple

# op-name classification for the flagship step, most-specific first
GROUPS: List[Tuple[str, str]] = [
    ("table_update", r"sweep|scatter"),
    ("attention", r"attention|mha|softmax"),
    ("select_gather", r"gather|take|dynamic-slice|dynamic_slice"),
    ("sort", r"sort"),
    ("matmul", r"dot|einsum|conv"),
    ("elementwise_fusion", r"fusion|loop|add|mul|divide|select"),
]


def find_trace_file(log_dir: str) -> Optional[str]:
    """Latest exported trace.json.gz under a jax.profiler log dir."""
    hits = sorted(
        glob.glob(
            os.path.join(log_dir, "**", "*.trace.json.gz"), recursive=True
        ),
        key=os.path.getmtime,
    )
    return hits[-1] if hits else None


def load_device_events(trace_path: str) -> List[Dict]:
    """Complete events (ph == 'X') from device-side tracks.

    Device tracks are the process names containing 'TPU' / 'Device'
    (host python/runtime threads are excluded so the budget is pure
    device time)."""
    with gzip.open(trace_path, "rt") as f:
        data = json.load(f)
    events = data.get("traceEvents", [])
    dev_pids = set()
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            nm = str(e.get("args", {}).get("name", ""))
            if re.search(r"TPU|Device|/device", nm, re.I):
                dev_pids.add(e.get("pid"))
    out = []
    for e in events:
        if e.get("ph") == "X" and e.get("pid") in dev_pids:
            out.append(e)
    return out


def op_time_breakdown(
    trace_path: str, groups: Optional[List[Tuple[str, str]]] = None
) -> Dict[str, float]:
    """Total device ms per named group over the whole trace window.

    Events nested inside other events on the same track would double
    count; XLA device tracks are flat (one op per timeslice), so a
    plain sum is correct."""
    groups = groups or GROUPS
    totals: Dict[str, float] = {}
    for e in load_device_events(trace_path):
        name = str(e.get("name", ""))
        dur_ms = float(e.get("dur", 0.0)) / 1e3  # dur is in us
        for gname, pat in groups:
            if re.search(pat, name, re.I):
                totals[gname] = totals.get(gname, 0.0) + dur_ms
                break
        else:
            totals["other"] = totals.get("other", 0.0) + dur_ms
    return dict(sorted(totals.items(), key=lambda kv: -kv[1]))


def top_ops(trace_path: str, n: int = 15) -> List[Tuple[str, float]]:
    """(op name, total device ms) for the n most expensive op names."""
    by_name: Dict[str, float] = {}
    for e in load_device_events(trace_path):
        name = str(e.get("name", ""))
        by_name[name] = by_name.get(name, 0.0) + float(e.get("dur", 0.0)) / 1e3
    return sorted(by_name.items(), key=lambda kv: -kv[1])[:n]
