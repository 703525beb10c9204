import numpy as np
import pytest

from tossctr_tpu.native.build import (
    gather_rows_multi_native,
    gather_rows_native,
    have_fastgather,
)

pytestmark = pytest.mark.skipif(
    not have_fastgather(), reason="native fastgather not built (no g++?)"
)


def test_gather_rows_matches_numpy():
    rng = np.random.default_rng(0)
    src = rng.normal(0, 1, (1000, 17)).astype(np.float32)
    idx = rng.integers(0, 1000, 333)
    out = gather_rows_native(src, idx, n_threads=4)
    assert np.array_equal(out, src[idx])


def test_gather_rows_1d_and_dtypes():
    rng = np.random.default_rng(1)
    for dtype in [np.int8, np.uint8, np.int32, np.float32, np.int64]:
        src = rng.integers(0, 100, (500, 3)).astype(dtype)
        idx = rng.integers(0, 500, 100)
        out = gather_rows_native(src, idx)
        assert np.array_equal(out, src[idx]), dtype
    src1 = rng.normal(0, 1, 200).astype(np.float32)
    idx = rng.integers(0, 200, 50)
    out1 = gather_rows_native(src1, idx)
    assert np.array_equal(out1, src1[idx])


def test_gather_rows_multi():
    rng = np.random.default_rng(2)
    srcs = [
        rng.normal(0, 1, (2000, 82)).astype(np.float32),
        rng.integers(0, 2, (2000, 82)).astype(np.uint8),
        rng.integers(0, 1000, (2000, 35)).astype(np.int32),
        rng.integers(0, 7, 2000).astype(np.int8),
    ]
    idx = rng.integers(0, 2000, 4096)
    outs = [np.empty((4096,) + s.shape[1:], s.dtype) for s in srcs]
    assert gather_rows_multi_native(srcs, idx, outs, n_threads=6)
    for s, o in zip(srcs, outs):
        assert np.array_equal(o, s[idx])


def test_cache_gather_native_equals_numpy(tmp_path):
    """ShardCache.gather with and without the native path agree."""
    import os

    from tossctr_tpu.data.dataset import ShardCache
    from tossctr_tpu.data.etl import build_sharded_cache
    from tossctr_tpu.data.synth import write_synth_train_test

    paths = write_synth_train_test(str(tmp_path), n_train=1500, n_test=100, seed=9)
    man = build_sharded_cache(
        paths["train"], str(tmp_path / "cache"), is_train=True,
        target_col="clicked", seq_col="seq", cat_cols=["inventory_id"],
        hash_buckets={}, hash_buckets_margin=0, num_patterns=["feat_*"],
        max_len=12, pad_id=0, group_key="inventory_id",
        shard_rows=700, stream_batch_rows=600,
    )
    idx = np.random.default_rng(0).permutation(1500)[:512]
    cache = ShardCache(man)
    b_native = cache.gather(idx, train=True)
    os.environ["TOSSCTR_NATIVE_GATHER"] = "0"
    try:
        cache2 = ShardCache(man)
        b_numpy = cache2.gather(idx, train=True)
    finally:
        os.environ.pop("TOSSCTR_NATIVE_GATHER")
    for k in b_numpy:
        assert np.array_equal(b_native[k], b_numpy[k]), k
