import json
import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from tossctr_tpu.data.etl import (
    _match_patterns,
    analyze_schema_and_stats,
    build_sharded_cache,
    tokenize_sequences,
)
from tossctr_tpu.data.synth import write_synth_train_test


def test_match_patterns():
    cols = ["feat_a_1", "feat_b_2", "history_1", "other", "l_feat_3"]
    assert _match_patterns(cols, ["feat_*"]) == ["feat_a_1", "feat_b_2"]
    assert _match_patterns(cols, ["feat_*", "history_*"]) == [
        "feat_a_1",
        "feat_b_2",
        "history_1",
    ]


def test_tokenize_right_aligned():
    s = np.array(["1,2,3", "7", "", None, "4,5,6,7,8"], dtype=object)
    out = tokenize_sequences(s, max_len=4, pad_id=0)
    assert out.shape == (5, 4)
    assert out[0].tolist() == [0, 1, 2, 3]
    assert out[1].tolist() == [0, 0, 0, 7]
    assert out[2].tolist() == [0, 0, 0, 0]
    assert out[3].tolist() == [0, 0, 0, 0]
    # keeps the LAST max_len tokens
    assert out[4].tolist() == [5, 6, 7, 8]


def test_tokenize_empty_tokens_filtered_before_alignment():
    """Mid-string/trailing empty tokens: the reference filters `if x`
    per token BEFORE the [-max_len:] slice (build_cache_v1.py:153), so
    '1,,2' right-aligns as [1,2] and empties never consume keep slots."""
    s = np.array(["1,,2", "5,7,", ",3", ",,9,,", "1,2,,3,4,5"], dtype=object)
    out = tokenize_sequences(s, max_len=4, pad_id=0)
    assert out[0].tolist() == [0, 0, 1, 2]
    assert out[1].tolist() == [0, 0, 5, 7]
    assert out[2].tolist() == [0, 0, 0, 3]
    assert out[3].tolist() == [0, 0, 0, 9]
    # 5 valid tokens, window keeps the last 4 VALID ones
    assert out[4].tolist() == [2, 3, 4, 5]


def test_tokenize_matches_reference_scalar_loop():
    rng = np.random.default_rng(0)
    strs = []
    for _ in range(200):
        L = rng.integers(0, 30)
        toks = [str(int(t)) for t in rng.integers(1, 999, L)]
        # sprinkle empty tokens (double/trailing/leading commas)
        for j in range(len(toks)):
            if rng.random() < 0.1:
                toks[j] = ""
        strs.append(",".join(toks))
    strs = np.array(strs, dtype=object)
    max_len = 12
    got = tokenize_sequences(strs, max_len, pad_id=0)
    # reference semantics (build_cache_v1.py:149-156)
    want = np.zeros((len(strs), max_len), np.int32)
    for i, st in enumerate(strs):
        toks = [int(x) for x in str(st).split(",") if x]
        toks = toks[-max_len:]
        if toks:
            want[i, -len(toks):] = np.asarray(toks, np.int32)
    assert np.array_equal(got, want)


@pytest.fixture(scope="module")
def synth_cache(tmp_path_factory):
    root = tmp_path_factory.mktemp("synth")
    paths = write_synth_train_test(str(root), n_train=5000, n_test=1000, seed=0)
    man = build_sharded_cache(
        paths["train"],
        str(root / "cache" / "train"),
        is_train=True,
        target_col="clicked",
        seq_col="seq",
        cat_cols=["gender", "age_group", "inventory_id", "day_of_week", "hour"],
        hash_buckets={"gender": 1005, "inventory_id": 1020},
        hash_buckets_margin=0,
        num_patterns=["feat_*", "history_*"],
        max_len=20,
        pad_id=0,
        group_key="inventory_id",
        time_key="day_of_week",
        composite_group=True,
        shard_rows=2000,
        stream_batch_rows=1300,
    )
    return root, paths, man


def test_cache_manifest_contract(synth_cache):
    root, paths, man_path = synth_cache
    with open(man_path) as f:
        man = json.load(f)
    assert man["rows"] == 5000
    # 5000 rows / 2000 per shard = 3 shards (2000, 2000, 1000)
    assert len(man["shards"]) == 3
    assert [s["rows"] for s in man["shards"]] == [2000, 2000, 1000]
    assert man["shards"][0]["start"] == 0 and man["shards"][0]["end"] == 2000
    assert man["shards"][2]["start"] == 4000 and man["shards"][2]["end"] == 5000
    s0 = man["shards"][0]
    for k in ["X_num", "X_mask", "X_cat", "seq", "y", "groups", "ids"]:
        assert os.path.exists(s0[k]["path"]), k
    assert s0["X_cat"]["shape"] == [2000, 5]
    assert s0["seq"]["shape"] == [2000, 20]
    assert s0["X_num"]["shape"][1] == s0["X_mask"]["shape"][1] == 10


def test_cache_arrays_semantics(synth_cache):
    root, paths, man_path = synth_cache
    with open(man_path) as f:
        man = json.load(f)
    s0 = man["shards"][0]
    X_num = np.load(s0["X_num"]["path"])
    X_mask = np.load(s0["X_mask"]["path"])
    X_cat = np.load(s0["X_cat"]["path"])
    y = np.load(s0["y"]["path"])
    groups = np.load(s0["groups"]["path"])
    ids = np.load(s0["ids"]["path"])
    assert X_num.dtype == np.float32 and not np.isnan(X_num).any()
    assert X_mask.dtype == np.uint8 and set(np.unique(X_mask)) <= {0, 1}
    assert X_cat.dtype == np.int32
    assert (X_cat[:, 0] < 1005).all()  # gender bucket
    assert (X_cat[:, 2] < 1020).all()  # inventory bucket
    assert (X_cat[:, 1] < 1_000_003).all()  # default bucket
    assert y.dtype == np.int8 and set(np.unique(y)) <= {0, 1}
    assert groups.dtype == np.int64 and (groups >= 0).all()
    assert ids.dtype.kind == "U" and ids[0].startswith("TRAIN_")

    # median imputation: masked cells hold the column median of raw data
    import pyarrow.parquet as pq_

    raw = pq_.read_table(paths["train"]).to_pandas()
    col = "feat_a_1"
    j = man["num_cols"].index(col)
    med = float(np.nanmedian(raw[col].to_numpy()))
    masked = X_mask[:, j].astype(bool)
    assert masked.any()
    assert np.allclose(X_num[masked, j], np.float32(med))
    # unmasked cells match the raw values
    raw_head = raw[col].to_numpy()[:2000].astype(np.float32)
    assert np.allclose(X_num[~masked, j], raw_head[~masked])


def test_schema_stats_exact_median(tmp_path):
    t = pa.table(
        {
            "feat_x_1": pa.array([1.0, 2.0, None, 100.0]),
            "feat_x_2": pa.array([None, None, None, None], type=pa.float64()),
            "clicked": pa.array([0, 1, 0, 1]),
            "seq": pa.array(["1", "2", "3", "4"]),
        }
    )
    p = str(tmp_path / "t.parquet")
    pq.write_table(t, p)
    s = analyze_schema_and_stats(
        p, "clicked", "seq", [], ["feat_*"], "g", "median"
    )
    assert s["num_cols"] == ["feat_x_1", "feat_x_2"]
    assert s["med_map"]["feat_x_1"] == 2.0
    assert s["med_map"]["feat_x_2"] == 0.0  # all-null column -> 0.0 fallback
    assert s["n_rows"] == 4


def test_remove_cols_respected(tmp_path):
    t = pa.table(
        {
            "feat_x_1": pa.array([1.0, 2.0]),
            "feat_x_2": pa.array([3.0, 4.0]),
            "seq": pa.array(["1", "2"]),
        }
    )
    p = str(tmp_path / "t.parquet")
    pq.write_table(t, p)
    s = analyze_schema_and_stats(
        p, None, "seq", [], ["feat_*"], "g", "median", remove_cols=["feat_x_2"]
    )
    assert s["num_cols"] == ["feat_x_1"]


def test_hash_buckets_margin_in_cache(tmp_path):
    """hash_buckets_margin widens every bucket (reference
    build_cache_v1.py:127, train.py:119)."""
    t = pa.table(
        {
            "c1": pa.array([str(i % 7) for i in range(100)]),
            "seq": pa.array(["1,2"] * 100),
            "clicked": pa.array([0, 1] * 50),
        }
    )
    p = str(tmp_path / "t.parquet")
    pq.write_table(t, p)
    man = build_sharded_cache(
        p, str(tmp_path / "cache"), is_train=True, target_col="clicked",
        seq_col="seq", cat_cols=["c1"], hash_buckets={"c1": 10},
        hash_buckets_margin=500, num_patterns=[], max_len=4, pad_id=0,
        group_key="c1", shard_rows=1000,
    )
    with open(man) as f:
        m = json.load(f)
    X_cat = np.load(m["shards"][0]["X_cat"]["path"])
    assert X_cat.max() < 510  # 10 + 500


def test_remove_cols_in_cache_build(tmp_path):
    t = pa.table(
        {
            "feat_x_1": pa.array([1.0] * 10),
            "feat_x_2": pa.array([2.0] * 10),
            "seq": pa.array(["3"] * 10),
            "clicked": pa.array([0] * 5 + [1] * 5),
        }
    )
    p = str(tmp_path / "t.parquet")
    pq.write_table(t, p)
    man = build_sharded_cache(
        p, str(tmp_path / "cache"), is_train=True, target_col="clicked",
        seq_col="seq", cat_cols=[], hash_buckets={}, hash_buckets_margin=0,
        num_patterns=["feat_*"], max_len=4, pad_id=0, group_key="g",
        shard_rows=100, remove_cols=["feat_x_2"],
    )
    with open(man) as f:
        m = json.load(f)
    assert m["num_cols"] == ["feat_x_1"]
    assert np.load(m["shards"][0]["X_num"]["path"]).shape == (10, 1)


def test_missing_cat_column_zero_filled(tmp_path):
    """Configured cat column absent from the parquet -> zeros
    (reference build_cache_v1.py:131-132)."""
    t = pa.table(
        {
            "seq": pa.array(["1"] * 6),
            "clicked": pa.array([0, 1] * 3),
        }
    )
    p = str(tmp_path / "t.parquet")
    pq.write_table(t, p)
    man = build_sharded_cache(
        p, str(tmp_path / "cache"), is_train=True, target_col="clicked",
        seq_col="seq", cat_cols=["ghost"], hash_buckets={}, hash_buckets_margin=0,
        num_patterns=[], max_len=4, pad_id=0, group_key="g", shard_rows=100,
    )
    with open(man) as f:
        m = json.load(f)
    X_cat = np.load(m["shards"][0]["X_cat"]["path"])
    assert (X_cat == 0).all()
