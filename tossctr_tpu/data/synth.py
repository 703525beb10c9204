"""Synthetic Toss-shaped Parquet generator.

The reference has no test data; SURVEY.md §4b calls for golden-file
integration tests on a small synthetic Parquet shaped like the Toss
schema (categorical cols incl. inventory_id/gender/age_group, ``feat_*``
and ``history_*`` numerics with missing values, a comma-separated
``seq`` string column, ``clicked`` label and string ``ID``).

The label is generated from a planted logistic model over a few
features *and* the overlap between the behaviour sequence and the
inventory id, so that a correct model demonstrably learns signal
(AP well above the positive rate).
"""

from __future__ import annotations

import os
from typing import Dict, List, Optional

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq


def make_synth_frame(
    n_rows: int,
    *,
    seed: int = 0,
    n_inventory: int = 200,
    n_l_feats: int = 4,
    n_num_feats: int = 6,
    n_history: int = 4,
    seq_vocab: int = 5000,
    seq_len_max: int = 80,
    missing_rate: float = 0.15,
    id_prefix: str = "TEST",
) -> Dict[str, np.ndarray]:
    rng = np.random.default_rng(seed)
    inv = rng.integers(1, n_inventory + 1, n_rows)
    gender = rng.choice(["M", "F", "U"], n_rows)
    age = rng.choice(["10", "20", "30", "40", "50", "60"], n_rows)
    dow = rng.integers(0, 7, n_rows)
    hour = rng.integers(0, 24, n_rows)

    cols: Dict[str, np.ndarray] = {
        "ID": np.array([f"{id_prefix}_{i:08d}" for i in range(n_rows)]),
        "gender": gender,
        "age_group": age,
        "inventory_id": inv.astype(np.int64),
        "day_of_week": dow.astype(np.int64),
        "hour": hour.astype(np.int64),
    }
    for j in range(1, n_l_feats + 1):
        cols[f"l_feat_{j}"] = rng.integers(0, 50, n_rows).astype(np.int64)

    logits = -3.0 + 0.0 * inv
    for j in range(1, n_num_feats + 1):
        x = rng.normal(0, 1, n_rows)
        miss = rng.random(n_rows) < missing_rate
        w = rng.normal(0, 0.35)
        logits = logits + w * np.where(miss, 0.0, x)
        xf = x.copy()
        xf[miss] = np.nan
        cols[f"feat_a_{j}"] = xf
    for j in range(1, n_history + 1):
        x = np.abs(rng.normal(0, 1, n_rows))
        miss = rng.random(n_rows) < missing_rate / 2
        xf = x.copy()
        xf[miss] = np.nan
        cols[f"history_a_{j}"] = xf

    # behaviour sequences: each user has a preference cluster of tokens;
    # positives tend to have their inventory's token in the recent tail.
    inv_token = (inv * 13) % seq_vocab + 1
    seqs: List[str] = []
    seq_match = np.zeros(n_rows)
    lens = rng.integers(3, seq_len_max, n_rows)
    for i in range(n_rows):
        L = int(lens[i])
        toks = rng.integers(1, seq_vocab, L)
        if rng.random() < 0.35:
            # plant the inventory token near the end
            pos = L - 1 - int(rng.integers(0, min(5, L)))
            toks[pos] = inv_token[i]
            seq_match[i] = 1.0
        seqs.append(",".join(map(str, toks)))
    cols["seq"] = np.array(seqs)
    logits = logits + 1.6 * seq_match + 0.25 * (gender == "F")
    p = 1 / (1 + np.exp(-logits))
    cols["clicked"] = (rng.random(n_rows) < p).astype(np.int8)
    return cols


def write_synth_parquet(
    path: str, n_rows: int, *, seed: int = 0, include_label: bool = True, **kw
) -> str:
    cols = make_synth_frame(n_rows, seed=seed, **kw)
    if not include_label:
        cols.pop("clicked")
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    table = pa.table({k: pa.array(v) for k, v in cols.items()})
    pq.write_table(table, path)
    return path


def write_synth_train_test(
    out_dir: str,
    n_train: int = 20_000,
    n_test: int = 4_000,
    seed: int = 0,
    **kw,
) -> Dict[str, str]:
    train = write_synth_parquet(
        os.path.join(out_dir, "train.parquet"), n_train, seed=seed, id_prefix="TRAIN", **kw
    )
    test = write_synth_parquet(
        os.path.join(out_dir, "test.parquet"),
        n_test,
        seed=seed + 1,
        include_label=False,
        id_prefix="TEST",
        **kw,
    )
    return {"train": train, "test": test}
