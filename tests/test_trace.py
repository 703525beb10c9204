"""utils/trace.py: Perfetto trace post-processing.

The breakdown must sum only the device "XLA Ops" track (the "Steps" and
"XLA Modules" tracks each cover the same wall-span and would double the
budget — the exact bug this guards against) and classify table traffic
by operand/output row counts from the HLO long_name.
"""

import gzip
import json

from tossctr_tpu.utils.trace import (
    _shape_rows, classify_op, find_trace_file, op_time_breakdown,
)


def test_shape_rows():
    ln = ("%fusion.27 = bf16[10000000,128]{1,0} fusion("
          "bf16[10000000,128]{1,0} %emb, s32[491520]{0} %ids)")
    assert _shape_rows(ln) == (10_000_000, 10_000_000)
    ln2 = "%fusion = bf16[3276800,128]{1,0} fusion(bf16[10000000,128]{1,0} %emb)"
    assert _shape_rows(ln2) == (3_276_800, 10_000_000)
    assert _shape_rows("no shapes here") == (0, 0)


def test_classify_op():
    tbl = "%f = bf16[10000000,128]{1,0} fusion(bf16[10000000,128]{1,0} %t)"
    gat = "%f = bf16[3276800,128]{1,0} fusion(bf16[10000000,128]{1,0} %t)"
    assert classify_op("fusion.27", tbl, "custom fusion") == "table_update"
    assert classify_op("fusion", gat, "custom fusion") == "select_gather"
    assert classify_op("mha.9", "", "custom-call") == "attention"
    assert classify_op("fusion.99", "%f = f32[8192,60]", "convolution fusion") == "matmul"
    assert classify_op("fusion.5", "%f = f32[8192,60]", "loop fusion") == "elementwise_fusion"
    assert classify_op("sort.1", "", "sort") == "sort"
    assert classify_op("copy.2", "", "data formatting") == "data_formatting"


def _write_trace(path):
    """Minimal Perfetto trace: device pid 3 with Steps/Modules/Ops
    threads (overlapping spans), host pid 7."""
    ev = [
        {"ph": "M", "pid": 3, "name": "process_name",
         "args": {"name": "/device:TPU:0"}},
        {"ph": "M", "pid": 7, "name": "process_name",
         "args": {"name": "/host:CPU"}},
        {"ph": "M", "pid": 3, "tid": 1, "name": "thread_name",
         "args": {"name": "Steps"}},
        {"ph": "M", "pid": 3, "tid": 2, "name": "thread_name",
         "args": {"name": "XLA Modules"}},
        {"ph": "M", "pid": 3, "tid": 3, "name": "thread_name",
         "args": {"name": "XLA Ops"}},
        {"ph": "M", "pid": 7, "tid": 1, "name": "thread_name",
         "args": {"name": "python"}},
        # whole-step spans that must NOT be counted
        {"ph": "X", "pid": 3, "tid": 1, "ts": 0, "dur": 10_000, "name": "3"},
        {"ph": "X", "pid": 3, "tid": 2, "ts": 0, "dur": 10_000,
         "name": "jit_train_step(123)"},
        {"ph": "X", "pid": 7, "tid": 1, "ts": 0, "dur": 10_000,
         "name": "host_thing"},
        # real ops: 6 ms table update + 4 ms attention
        {"ph": "X", "pid": 3, "tid": 3, "ts": 0, "dur": 6_000,
         "name": "fusion.27",
         "args": {"hlo_category": "custom fusion",
                  "long_name": "%fusion.27 = bf16[10000000,128]{1,0} "
                               "fusion(bf16[10000000,128]{1,0} %t)"}},
        {"ph": "X", "pid": 3, "tid": 3, "ts": 6_000, "dur": 4_000,
         "name": "mha.9", "args": {"hlo_category": "custom-call"}},
    ]
    with gzip.open(path, "wt") as f:
        json.dump({"traceEvents": ev}, f)


def test_breakdown_counts_only_xla_ops(tmp_path):
    d = tmp_path / "plugins" / "profile" / "x"
    d.mkdir(parents=True)
    tp = d / "vm.trace.json.gz"
    _write_trace(tp)
    assert find_trace_file(str(tmp_path)) == str(tp)
    bd = op_time_breakdown(str(tp))
    assert bd == {"table_update": 6.0, "attention": 4.0}
    assert sum(bd.values()) == 10.0  # == one step, no double counting
