"""jax.profiler trace post-processing: per-op device-time budgets.

The reference has no profiling at all (SURVEY.md §5 "Tracing: none");
this module is the TPU build's observability primitive: run a step
window under ``jax.profiler.trace``, then fold the exported Perfetto
``trace.json.gz`` into a named device-time breakdown (the same numbers
DESIGN.md §2 quotes).  Used by ``bench.py --breakdown`` to attach a
table/select/attention budget to the bench JSON.

Only the device "XLA Ops" track is summed: the "XLA Modules" and
"Steps" tracks cover the same wall-span (one event per step each) and
would double-count every op.  Classification uses the per-op
``hlo_category`` plus the HLO ``long_name`` (operand/output shapes):
an op whose *output* has >= ``big_rows`` rows is a table write
(scatter/update of a vocab-sized embedding table); one whose *operand*
has >= ``big_rows`` rows is a table gather (selection lookup).
"""

from __future__ import annotations

import glob
import gzip
import json
import os
import re
from typing import Dict, List, Optional, Tuple

# rows at/above which an array is considered "a vocab-sized table"
BIG_ROWS = 5_000_000


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
    """Complete events (ph == 'X') from the device "XLA Ops" tracks.

    Host python/runtime threads, and the per-step "Steps" / "XLA
    Modules" device tracks (which span the same time as their child
    ops), are excluded so a plain sum is pure, non-overlapping device
    time."""
    with gzip.open(trace_path, "rt") as f:
        data = json.load(f)
    events = data.get("traceEvents", [])
    dev_pids = set()
    op_tids = set()
    for e in events:
        if e.get("ph") != "M":
            continue
        if e.get("name") == "process_name":
            nm = str(e.get("args", {}).get("name", ""))
            if re.search(r"TPU|Device|/device", nm, re.I):
                dev_pids.add(e.get("pid"))
        elif e.get("name") == "thread_name":
            nm = str(e.get("args", {}).get("name", ""))
            if re.search(r"XLA Ops", nm, re.I):
                op_tids.add((e.get("pid"), e.get("tid")))
    out = []
    for e in events:
        if (
            e.get("ph") == "X"
            and e.get("pid") in dev_pids
            and (e.get("pid"), e.get("tid")) in op_tids
        ):
            out.append(e)
    return out


def _shape_rows(long_name: str) -> Tuple[int, int]:
    """(output_rows, max_operand_rows) parsed from an HLO long_name.

    ``%fusion.27 = bf16[10000000,128]{...} fusion(bf16[10000000,128]{...}
    %emb_tables, s32[491520]{...} %ids)`` -> (10000000, 10000000)."""
    dims = [int(d) for d in re.findall(r"\w+\[(\d+)", long_name)]
    if not dims:
        return 0, 0
    return dims[0], (max(dims[1:]) if len(dims) > 1 else 0)


def classify_op(name: str, long_name: str, category: str,
                big_rows: int = BIG_ROWS) -> str:
    if re.search(r"mha|attention|softmax|flash", name, re.I):
        return "attention"
    out_rows, op_rows = _shape_rows(long_name)
    if out_rows >= big_rows or re.search(r"scatter|sweep", name, re.I):
        return "table_update"
    if op_rows >= big_rows or re.search(r"gather|take", name, re.I):
        return "select_gather"
    if category == "sort" or "sort" in name:
        return "sort"
    if category in ("convolution fusion", "convolution") or re.search(
        r"dot|conv|einsum", name, re.I
    ):
        return "matmul"
    if category == "custom-call":
        return "custom_call"
    if "fusion" in category or "fusion" in name:
        return "elementwise_fusion"
    if category in ("data formatting", "copy", "copy-start", "copy-done",
                    "pad", "slice", "broadcast", "reshape", "transpose"):
        return "data_formatting"
    return "other"


def op_time_breakdown(
    trace_path: str, big_rows: int = BIG_ROWS
) -> Dict[str, float]:
    """Total device ms per class over the whole trace window."""
    totals: Dict[str, float] = {}
    for e in load_device_events(trace_path):
        name = str(e.get("name", ""))
        args = e.get("args", {}) or {}
        g = classify_op(
            name,
            str(args.get("long_name", "")),
            str(args.get("hlo_category", "")),
            big_rows,
        )
        totals[g] = totals.get(g, 0.0) + float(e.get("dur", 0.0)) / 1e3
    return dict(sorted(totals.items(), key=lambda kv: -kv[1]))


def top_ops(trace_path: str, n: int = 15) -> List[Tuple[str, float]]:
    """(op name, total device ms) for the n most expensive op names."""
    by_name: Dict[str, float] = {}
    for e in load_device_events(trace_path):
        name = str(e.get("name", ""))
        by_name[name] = by_name.get(name, 0.0) + float(e.get("dur", 0.0)) / 1e3
    return sorted(by_name.items(), key=lambda kv: -kv[1])[:n]


def top_ops_detailed(
    trace_path: str, n: int = 20, big_rows: int = BIG_ROWS
) -> List[Dict]:
    """Top-n ops with their class and long_name (shapes) — names every
    millisecond instead of printing opaque 'fusion.28' labels."""
    by_name: Dict[str, Dict] = {}
    for e in load_device_events(trace_path):
        name = str(e.get("name", ""))
        args = e.get("args", {}) or {}
        d = by_name.setdefault(
            name,
            {"name": name, "ms": 0.0,
             "long_name": str(args.get("long_name", ""))[:400],
             "category": str(args.get("hlo_category", "")),
             "class": classify_op(
                 name, str(args.get("long_name", "")),
                 str(args.get("hlo_category", "")), big_rows)},
        )
        d["ms"] += float(e.get("dur", 0.0)) / 1e3
    return sorted(by_name.values(), key=lambda d: -d["ms"])[:n]
