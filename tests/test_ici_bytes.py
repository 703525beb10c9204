"""Compiler-verified ICI byte accounting (VERDICT r4 next#4).

bench_scaling.exchange_bytes() publishes analytic per-device byte
tables for the sharded-lookup exchanges (psum / a2a) and the sparse
grad returns (allgather / bucketed a2a).  These tests compile the REAL
production train step on an 8-virtual-device mesh, extract every
collective the compiler actually emitted (operand/result shapes +
replica groups from the optimized HLO), and assert the analytic
numbers.  Wire conventions, applied to the compiler shapes:

  * all-to-all: each device transmits its full operand buffer
    -> bytes = operand bytes,
  * all-gather: each device receives the concatenated result
    -> bytes = result bytes,
  * all-reduce (ring): 2*(m-1)/m * operand bytes.

Collectives are classified by replica group: 'model' axis groups,
'data' axis groups, or 'global' (whole mesh — dense-grad psum, scalar
counters; excluded from the model-axis tables under test).
"""

from __future__ import annotations

import re
from functools import lru_cache

import jax
import numpy as np
import pytest

import __graft_entry__ as ge
from bench_scaling import exchange_bytes
from tossctr_tpu.parallel.mesh import build_mesh
from tossctr_tpu.parallel.sharding import batch_sharding
from tossctr_tpu.train.trainer import (
    build_model,
    make_optimizer,
    make_train_step,
    setup_sharded_state,
)

_DTYPE_BYTES = {
    "f64": 8, "s64": 8, "u64": 8, "f32": 4, "s32": 4, "u32": 4,
    "bf16": 2, "f16": 2, "s16": 2, "u16": 2, "s8": 1, "u8": 1, "pred": 1,
}

_COLLECTIVE_RE = re.compile(
    r"^\s*(?:ROOT )?%?[\w\.\-]+ = (?P<shape>\(.*?\)|[a-z0-9]+\[[0-9,]*\]\S*)"
    r" (?P<op>all-to-all|all-gather|all-reduce|reduce-scatter|"
    r"collective-permute)(?:-start)?\("
)
_SHAPE_RE = re.compile(r"([a-z0-9]+)\[([0-9,]*)\]")
_GROUPS_RE = re.compile(
    r"replica_groups=(?:\{(?P<explicit>\{[^}]*\}(?:,\{[^}]*\})*)\}"
    r"|\[(?P<iota_dims>[0-9,]+)\]<=\[(?P<iota_n>\d+)\])"
)


def _shape_bytes(shape_str: str) -> int:
    total = 0
    for dt, dims in _SHAPE_RE.findall(shape_str):
        if dt not in _DTYPE_BYTES:
            continue
        n = 1
        for d in dims.split(","):
            if d:
                n *= int(d)
        total += n * _DTYPE_BYTES[dt]
    return total


def _parse_groups(line: str):
    m = _GROUPS_RE.search(line)
    if not m:
        return None
    if m.group("explicit") is not None:
        return [
            frozenset(int(x) for x in g.split(",") if x)
            for g in re.findall(r"\{([^}]*)\}", m.group("explicit"))
        ]
    dims = [int(x) for x in m.group("iota_dims").split(",")]
    n = int(m.group("iota_n"))
    arr = np.arange(n).reshape(dims)
    # groups = rows over the LAST dim after reshape
    return [frozenset(row) for row in arr.reshape(-1, dims[-1])]


def collectives(hlo_text: str):
    """-> list of dicts {op, operand_bytes, result_bytes, groups}."""
    out = []
    for line in hlo_text.splitlines():
        m = _COLLECTIVE_RE.match(line)
        if not m:
            continue
        # optimized HLO prints operands as bare %refs; the RESULT shape
        # is inline — and for all-to-all / all-reduce result bytes ==
        # operand bytes, while all-gather wants result bytes anyway
        result_b = _shape_bytes(m.group("shape"))
        out.append({
            "op": m.group("op"),
            "result_bytes": result_b,
            "groups": _parse_groups(line),
        })
    return out


def classify_axis(groups, mesh) -> str:
    if not groups:
        return "unknown"
    dev = np.array([[d.id for d in row] for row in mesh.devices])
    model_groups = {frozenset(row) for row in dev}
    data_groups = {frozenset(col) for col in dev.T}
    gs = set(groups)
    if gs <= model_groups:
        return "model"
    if gs <= data_groups:
        return "data"
    if gs == {frozenset(dev.reshape(-1))}:
        return "global"
    return "other"


@lru_cache(maxsize=None)
def compiled_step(model_axis: int, exchange: str, grad_exchange: str,
                  select_proxy: bool = False):
    """Compile the production sharded train step; return (cfg, mesh,
    collective list).  Mirrors __graft_entry__._dryrun_multichip."""
    devices = jax.devices()[:8]
    assert len(devices) == 8
    data_axis = 8 // model_axis
    mesh = build_mesh(data=data_axis, model=model_axis, devices=devices)
    cfg, n_num = ge._flagship_cfg(tiny=True)
    cfg.train.embedding_optimizer = "rowwise_adagrad"
    cfg.mesh.exchange = exchange
    cfg.mesh.grad_exchange = grad_exchange
    cfg.model.fused_seq_tables = True
    if select_proxy:
        cfg.sequence.select_proxy = True
        cfg.sequence.select_proxy_block = 8
        cfg.sequence.select_proxy_candidates = max(
            cfg.sequence.top_k, cfg.sequence.max_len // 2)
    dims = {"X_num": n_num, "X_mask": n_num,
            "X_cat": len(cfg.data.cat_cols), "seq_len": cfg.sequence.max_len}
    model = build_model(cfg, dims, mesh=mesh)
    batch = ge._batch_for(cfg, n_num, cfg.train.batch_size, with_labels=True)
    tx, schedule = make_optimizer(cfg, steps_per_epoch=10)
    state, ema_mask, s_sh, _ = setup_sharded_state(
        cfg, model, tx, {k: v for k, v in batch.items() if k != "y"},
        jax.random.PRNGKey(0), mesh,
    )
    batch_dev = batch_sharding(mesh)(batch)
    step = make_train_step(
        model, tx, cfg, jax.random.PRNGKey(1), ema_mask=ema_mask,
        schedule=schedule, state_sharding=s_sh, mesh=mesh,
    )
    text = step.lower(state, batch_dev).compile().as_text()
    cols = collectives(text)
    for c in cols:
        c["axis"] = classify_axis(c["groups"], mesh)
    return cfg, data_axis, cols


def wire_bytes(c, model_axis, data_axis) -> float:
    n = model_axis if c["axis"] == "model" else data_axis
    if c["op"] == "all-reduce":
        return 2 * (n - 1) / n * c["result_bytes"]
    return c["result_bytes"]


TOL = 0.10  # the tables claim the dominant streams, not every byte


@pytest.mark.parametrize("model_axis", [2, 4])
def test_a2a_lookup_bytes(model_axis):
    """model-axis all-to-all bytes == the analytic a2a lookup table
    (grad return rides allgather, which emits no all-to-all)."""
    cfg, d, cols = compiled_step(model_axis, "a2a", "allgather")
    measured = sum(
        wire_bytes(c, model_axis, d)
        for c in cols if c["op"] == "all-to-all" and c["axis"] == "model"
    )
    expect = exchange_bytes(cfg, d, model_axis, "a2a")["ici_bytes_per_device"]
    assert measured == pytest.approx(expect, rel=TOL), (measured, expect)


@pytest.mark.parametrize("model_axis", [2, 4])
def test_psum_lookup_bytes(model_axis):
    """model-axis all-reduce ring bytes == the analytic psum table."""
    cfg, d, cols = compiled_step(model_axis, "psum", "allgather")
    measured = sum(
        wire_bytes(c, model_axis, d)
        for c in cols if c["op"] == "all-reduce" and c["axis"] == "model"
    )
    expect = exchange_bytes(cfg, d, model_axis, "psum")["ici_bytes_per_device"]
    assert measured == pytest.approx(expect, rel=TOL), (measured, expect)


@pytest.mark.parametrize("model_axis", [2, 4])
def test_grad_allgather_bytes(model_axis):
    """all-gather bytes (data leg + model leg) == the analytic
    allgather grad-return row."""
    cfg, d, cols = compiled_step(model_axis, "a2a", "allgather")
    measured = sum(
        wire_bytes(c, model_axis, d)
        for c in cols
        if c["op"] == "all-gather" and c["axis"] in ("model", "data")
    )
    expect = exchange_bytes(cfg, d, model_axis, "a2a")[
        "grad_return_bytes_per_device"]["allgather"]
    assert measured == pytest.approx(expect, rel=TOL), (measured, expect)


@pytest.mark.parametrize("model_axis", [2, 4])
def test_grad_a2a_bytes(model_axis):
    """Bucketed return: (total model-axis a2a − lookup a2a) + data-axis
    all-gather == the analytic a2a grad-return row."""
    cfg, d, cols = compiled_step(model_axis, "a2a", "a2a")
    a2a_total = sum(
        wire_bytes(c, model_axis, d)
        for c in cols if c["op"] == "all-to-all" and c["axis"] == "model"
    )
    ag_data = sum(
        wire_bytes(c, model_axis, d)
        for c in cols if c["op"] == "all-gather" and c["axis"] == "data"
    )
    lookup = exchange_bytes(cfg, d, model_axis, "a2a")["ici_bytes_per_device"]
    expect = exchange_bytes(cfg, d, model_axis, "a2a")[
        "grad_return_bytes_per_device"]["a2a"]
    measured = (a2a_total - lookup) + ag_data
    assert measured == pytest.approx(expect, rel=TOL), (measured, expect)


def test_crossover_claim_compiler_counted():
    """The published crossover (a2a_win_x: win = (m/c)·item ratio —
    m/2 at fp32 cotangents, ~m/4 at bf16) must hold in
    COMPILER-counted bytes."""
    ratios = {}
    expected = {}
    for m in (2, 4):
        cfg, d, cols_ag = compiled_step(m, "a2a", "allgather")
        _, _, cols_a2a = compiled_step(m, "a2a", "a2a")
        lookup = exchange_bytes(cfg, d, m, "a2a")["ici_bytes_per_device"]
        ag = sum(
            wire_bytes(c, m, d) for c in cols_ag
            if c["op"] == "all-gather" and c["axis"] in ("model", "data")
        )
        a2a = (
            sum(wire_bytes(c, m, d) for c in cols_a2a
                if c["op"] == "all-to-all" and c["axis"] == "model")
            - lookup
            + sum(wire_bytes(c, m, d) for c in cols_a2a
                  if c["op"] == "all-gather" and c["axis"] == "data")
        )
        ratios[m] = ag / a2a
        expected[m] = exchange_bytes(cfg, d, m, "a2a")[
            "grad_return_bytes_per_device"]["a2a_win_x"]
    # the win doubles from m=2 to m=4 and matches the published
    # cfg-exact a2a_win_x (fp32 cotangents on this backend -> m/2)
    assert ratios[4] > ratios[2]
    for m in (2, 4):
        assert ratios[m] == pytest.approx(expected[m], rel=TOL), (
            ratios, expected)


@pytest.mark.parametrize("exchange", ["a2a", "psum"])
def test_select_proxy_lookup_bytes(exchange):
    """With the hierarchical prefilter, the full-L scoring leg gathers
    from the REPLICATED proxy (no exchange); only candidate + recompute
    rows ride the sharded lookup — the analytic table models the
    reduction and the compiler must agree."""
    m = 2
    cfg, d, cols = compiled_step(m, exchange, "allgather", select_proxy=True)
    op = "all-to-all" if exchange == "a2a" else "all-reduce"
    measured = sum(
        wire_bytes(c, m, d)
        for c in cols if c["op"] == op and c["axis"] == "model"
    )
    expect = exchange_bytes(cfg, d, m, exchange)["ici_bytes_per_device"]
    assert measured == pytest.approx(expect, rel=TOL), (measured, expect)
    # and the reduction vs dense is real: proxy moves fewer bytes
    cfg_d, _, _ = compiled_step(m, exchange, "allgather")
    dense = exchange_bytes(cfg_d, d, m, exchange)["ici_bytes_per_device"]
    assert expect < dense, (expect, dense)
