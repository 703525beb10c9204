import numpy as np
import pytest

from tossctr_tpu.data.dataset import ShardCache, load_labels_groups_for_split
from tossctr_tpu.data.etl import build_sharded_cache
from tossctr_tpu.data.loader import BatchIterator, DevicePrefetcher
from tossctr_tpu.data.sampler import BalancedBatchSampler, ShuffleBatchSampler
from tossctr_tpu.data.synth import write_synth_train_test


@pytest.fixture(scope="module")
def cache(tmp_path_factory):
    root = tmp_path_factory.mktemp("loadsynth")
    paths = write_synth_train_test(str(root), n_train=3000, n_test=500, seed=1)
    man = build_sharded_cache(
        paths["train"],
        str(root / "cache" / "train"),
        is_train=True,
        target_col="clicked",
        seq_col="seq",
        cat_cols=["gender", "inventory_id"],
        hash_buckets={},
        hash_buckets_margin=0,
        num_patterns=["feat_*"],
        max_len=16,
        pad_id=0,
        group_key="inventory_id",
        shard_rows=1000,
        stream_batch_rows=700,
    )
    return ShardCache(man)


def test_gather_cross_shard_order_preserved(cache):
    idx = np.array([2999, 0, 1500, 999, 1000, 42])
    b = cache.gather(idx, train=True)
    assert b["X_num"].shape[0] == 6
    # row identity: gather one-by-one must equal the batched gather
    for k in ["X_num", "X_cat", "seq", "y"]:
        for i, gi in enumerate(idx):
            single = cache.gather(np.array([gi]), train=True)
            assert np.array_equal(b[k][i], single[k][0]), (k, gi)


def test_gather_test_mode_has_ids(cache):
    b = cache.gather(np.array([0, 1]), train=False)
    assert "ids" in b and "y" not in b
    assert b["ids"][0].startswith("TRAIN_")


def test_labels_groups_concat(cache):
    y, g = cache.labels(), cache.groups()
    assert y.shape == (3000,) and g.shape == (3000,)
    assert set(np.unique(y)) <= {0, 1}


def test_shuffle_sampler_epoch_determinism():
    s = ShuffleBatchSampler(100, batch_size=32, seed=3)
    s.set_epoch(1)
    a = list(s)
    s.set_epoch(1)
    b = list(s)
    assert all(np.array_equal(x, y) for x, y in zip(a, b))
    s.set_epoch(2)
    c = list(s)
    assert not np.array_equal(a[0], c[0])
    assert len(a) == 3  # drop_last
    covered = np.concatenate(a)
    assert np.unique(covered).size == 96


def test_balanced_sampler_fractions():
    y = np.zeros(1000, np.int8)
    y[:50] = 1
    s = BalancedBatchSampler(y, batch_size=64, pos_fraction=0.25, seed=0)
    batches = list(s)
    assert len(s) == 1000 // 64
    for b in batches:
        assert b.shape == (64,)
        assert y[b].sum() == 16  # 0.25 * 64


def test_balanced_sampler_reference_quirk_no_reseed():
    y = np.zeros(100, np.int8)
    y[:10] = 1
    s = BalancedBatchSampler(y, batch_size=10, seed=5, reseed_each_epoch=False)
    a = np.concatenate(list(s))
    s.set_epoch(1)  # ignored, as in the reference (set_epoch never called)
    b = np.concatenate(list(s))
    assert np.array_equal(a, b)


def test_batch_iterator_static_shapes_and_padding(cache):
    it = BatchIterator(
        cache,
        np.arange(2500),
        batch_size=512,
        train=False,
        shuffle=False,
        drop_last=False,
    )
    batches = list(it)
    assert len(batches) == 5
    for b in batches:
        assert b["X_num"].shape[0] == 512  # static shape incl. last partial
    assert batches[-1]["valid"].sum() == 2500 - 4 * 512


def test_batch_iterator_train_covers_index(cache):
    idx = np.arange(1024)
    it = BatchIterator(cache, idx, batch_size=256, train=True, shuffle=True, seed=0)
    ys = [b["y"] for b in it]
    assert len(ys) == 4
    want = cache.gather(idx, train=True)["y"]
    assert np.isclose(np.sort(np.concatenate(ys)).sum(), want.sum())


def test_device_prefetcher_roundtrip(cache):
    it = BatchIterator(cache, np.arange(600), batch_size=128, train=True, shuffle=False)
    out = list(DevicePrefetcher(iter(it)))
    assert len(out) == 4
    import jax.numpy as jnp

    assert isinstance(out[0]["X_num"], jnp.ndarray)
    host = list(BatchIterator(cache, np.arange(600), batch_size=128, train=True, shuffle=False))
    assert np.allclose(np.asarray(out[0]["X_num"]), host[0]["X_num"])


def test_load_labels_groups_helper(cache):
    y, g = load_labels_groups_for_split(
        # reconstruct path from the cache object
        cache.manifest["shards"][0]["X_num"]["path"].rsplit("/shard_", 1)[0]
        + "/manifest.json"
    )
    assert y.shape == (3000,)
