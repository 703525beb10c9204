"""Hierarchical (proxy-prefilter) selection — semantics tests
(VERDICT r4 #8; ops/topk_select._proxy_topk_ids).

The prefilter scores positions against block-means of the att table and
keeps `candidates` positions; the exact top-k is then taken within that
set.  Contracts under test:

  1. block=1 -> the proxy IS the att table, so selection must be
     BIT-IDENTICAL to the dense path (same ids, same positions,
     including tie order and short-sequence pad fill).
  2. block>1 -> the result is exactly the top-k BY EXACT SCORE of the
     candidate set (verified against a numpy oracle that replays the
     two stages), pads are never preferred over non-pads, and the
     candidate set is the proxy-score top-C2.
  3. The full CTRModel forward runs and differs only in selection
     (identical when candidates >= L).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tossctr_tpu.ops.topk_select import (
    dare_select_ids,
    recency_log_decay,
)

B, L, D, K = 8, 64, 16, 8
V, BLOCK = 4096, 8
PAD = 0


def _data(seed, short_rows=True):
    rng = np.random.default_rng(seed)
    table = rng.normal(0, 1, (V, D)).astype(np.float32)
    ids = rng.integers(1, V, (B, L)).astype(np.int32)
    if short_rows:
        ids[0, : L - 3] = PAD      # only 3 real tokens (< K)
        ids[1, : L // 2] = PAD     # half pads
    query = rng.normal(0, 1, (B, D)).astype(np.float32)
    return jnp.asarray(table), jnp.asarray(ids), jnp.asarray(query)


def test_block1_bit_identical_to_dense():
    table, ids, query = _data(0)
    idx_d, sel_d, _ = dare_select_ids(
        table, ids, query, top_k=K, tau=32.0, pad_id=PAD,
    )
    idx_p, sel_p, _ = dare_select_ids(
        table, ids, query, top_k=K, tau=32.0, pad_id=PAD,
        select_proxy={"block": 1, "candidates": 2 * K},
    )
    np.testing.assert_array_equal(np.asarray(idx_p), np.asarray(idx_d))
    np.testing.assert_array_equal(np.asarray(sel_p), np.asarray(sel_d))


def test_candidates_ge_L_falls_back_to_dense():
    table, ids, query = _data(1)
    idx_d, sel_d, _ = dare_select_ids(
        table, ids, query, top_k=K, tau=32.0, pad_id=PAD,
    )
    idx_p, sel_p, _ = dare_select_ids(
        table, ids, query, top_k=K, tau=32.0, pad_id=PAD,
        select_proxy={"block": BLOCK, "candidates": L},
    )
    np.testing.assert_array_equal(np.asarray(idx_p), np.asarray(idx_d))
    np.testing.assert_array_equal(np.asarray(sel_p), np.asarray(sel_d))


def _numpy_two_stage(table, ids, query, block, C2):
    """Oracle: proxy top-C2 then exact top-K within candidates."""
    tb, idn, qn = map(np.asarray, (table, ids, query))
    C = tb.shape[0] // block
    proxy = tb.reshape(C, block, -1)[:, :, :D].mean(axis=1)
    dec = np.asarray(recency_log_decay(L, 32.0))
    out_idx = np.zeros((B, K), np.int64)
    out_ids = np.zeros((B, K), np.int64)
    for b in range(B):
        cl = np.minimum(idn[b] // block, C - 1)
        s1 = proxy[cl] @ qn[b] + dec
        s1[idn[b] == PAD] = -1e9
        order1 = np.argsort(-s1, kind="stable")[:C2]
        s2 = tb[idn[b, order1]] @ qn[b] + dec[order1]
        s2[idn[b, order1] == PAD] = -1e9
        order2 = np.argsort(-s2, kind="stable")[:K]
        pos = order1[order2]
        out_idx[b], out_ids[b] = pos, idn[b, pos]
    return out_idx, out_ids


def test_blocked_proxy_matches_numpy_oracle():
    table, ids, query = _data(2, short_rows=False)
    C2 = 2 * K
    idx_p, sel_p, _ = dare_select_ids(
        table, ids, query, top_k=K, tau=32.0, pad_id=PAD,
        select_proxy={"block": BLOCK, "candidates": C2},
    )
    ref_idx, ref_ids = _numpy_two_stage(table, ids, query, BLOCK, C2)
    np.testing.assert_array_equal(np.asarray(sel_p), ref_ids)
    np.testing.assert_array_equal(np.asarray(idx_p), ref_idx)


def test_pads_never_displace_real_tokens():
    table, ids, query = _data(3)
    _, sel_p, _ = dare_select_ids(
        table, ids, query, top_k=K, tau=32.0, pad_id=PAD,
        select_proxy={"block": BLOCK, "candidates": 2 * K},
    )
    sel = np.asarray(sel_p)
    # row 0 has 3 real tokens: they must all be selected, pads fill rest
    n_real = int((np.asarray(ids)[0] != PAD).sum())
    assert (sel[0] != PAD).sum() == min(K, n_real)
    # rows with >= K real tokens must select no pads
    full = np.asarray(ids)[2:] != PAD
    assert np.all(sel[2:] != PAD) or not np.all(full.sum(1) >= K)


def test_full_model_forward_with_proxy():
    """End-to-end: CTRModel with sequence.select_proxy on compiles,
    runs, and matches the dense model exactly when candidates >= L."""
    import __graft_entry__ as ge
    from tossctr_tpu.train.trainer import build_model

    cfg, n_num = ge._flagship_cfg(tiny=True)
    cfg.model.seq_vocab = 1024
    cfg.sequence.select_proxy = True
    cfg.sequence.select_proxy_block = 8
    cfg.sequence.select_proxy_candidates = cfg.sequence.max_len  # == dense
    cfg.validate()
    dims = {"X_num": n_num, "X_mask": n_num,
            "X_cat": len(cfg.data.cat_cols), "seq_len": cfg.sequence.max_len}
    model = build_model(cfg, dims)
    batch = ge._batch_for(cfg, n_num, cfg.train.batch_size, with_labels=False)
    var = model.init(jax.random.PRNGKey(0), batch, deterministic=True)
    z1, _, _ = model.apply(var, batch, deterministic=True)

    cfg.sequence.select_proxy = False
    model_d = build_model(cfg, dims)
    z2, _, _ = model_d.apply(var, batch, deterministic=True)
    np.testing.assert_allclose(np.asarray(z1), np.asarray(z2), rtol=0, atol=0)

    # and a genuinely prefiltered forward runs finite
    cfg.sequence.select_proxy = True
    cfg.sequence.select_proxy_candidates = max(
        cfg.sequence.top_k, cfg.sequence.max_len // 2)
    model_p = build_model(cfg, dims)
    z3, _, _ = model_p.apply(var, batch, deterministic=True)
    assert np.all(np.isfinite(np.asarray(z3)))


def test_config_validation():
    from tossctr_tpu.config import Config

    with pytest.raises(ValueError, match="candidates"):
        Config.from_dict({
            "exp_name": "x",
            "sequence": {"top_k": 64, "select_proxy": True,
                         "select_proxy_candidates": 32},
        }).validate()
    with pytest.raises(ValueError, match="divide"):
        Config.from_dict({
            "exp_name": "x",
            "model": {"seq_vocab": 1000},
            "sequence": {"top_k": 8, "select_proxy": True,
                         "select_proxy_block": 64,
                         "select_proxy_candidates": 32},
        }).validate()
