import numpy as np

from tossctr_tpu.utils.hashing import (
    hash_group_ids,
    hash_to_buckets,
    stable_hash64,
)


def test_deterministic_and_seeded():
    vals = np.array(["a", "b", "NA", "hello world", ""], dtype=object)
    h1 = stable_hash64(vals)
    h2 = stable_hash64(vals)
    assert np.array_equal(h1, h2)
    h3 = stable_hash64(vals, seed=1)
    assert not np.array_equal(h1, h3)


def test_none_and_nan_map_to_na():
    vals = np.array([None, "NA", float("nan")], dtype=object)
    h = stable_hash64(vals)
    assert h[0] == h[1]
    f = stable_hash64(np.array([np.nan], dtype=np.float64))
    assert f[0] == h[1]


def test_int_float_string_agree():
    """'3', 3 and 3.0 hash identically (polars Utf8 cast semantics)."""
    hs = stable_hash64(np.array(["3"]))
    hi = stable_hash64(np.array([3], dtype=np.int64))
    hf = stable_hash64(np.array([3.0], dtype=np.float64))
    assert hs[0] == hi[0] == hf[0]


def test_bucket_range_and_dtype():
    vals = np.arange(10_000)
    b = hash_to_buckets(vals, 1009)
    assert b.dtype == np.int32
    assert b.min() >= 0 and b.max() < 1009


def test_uniformity_balls_in_bins():
    """Collision rate matches the balls-in-bins estimate within 10% —
    the property check_inventory_hash_collisions.py relies on."""
    n, m = 50_000, 10_007
    b = hash_to_buckets(np.arange(n).astype(str), m)
    unique = np.unique(b).size
    expected = m * (1 - (1 - 1 / m) ** n)
    assert abs(unique - expected) / expected < 0.1


def test_group_ids_range_and_composite():
    g = hash_group_ids(np.array(["x", "y", "x"]))
    assert g.dtype == np.int64
    assert (g >= 0).all() and (g < 2**31 - 1).all()
    assert g[0] == g[2] and g[0] != g[1]
    gc = hash_group_ids(np.array(["x", "x"]), np.array(["mon", "tue"]))
    assert gc[0] != gc[1]  # composite group x time differs by time


def test_vectorized_matches_scalar_loop():
    """The byte-position loop must equal a straightforward per-row FNV."""

    def fnv_scalar(s: str, seed: int = 2025) -> int:
        def mix(h):
            h &= (1 << 64) - 1
            h ^= h >> 30
            h = (h * 0xBF58476D1CE4E5B9) & ((1 << 64) - 1)
            h ^= h >> 27
            h = (h * 0x94D049BB133111EB) & ((1 << 64) - 1)
            h ^= h >> 31
            return h

        h = 0xCBF29CE484222325 ^ mix(seed)
        for byte in s.encode("utf-8"):
            h = ((h ^ byte) * 0x100000001B3) & ((1 << 64) - 1)
        return mix(h)

    vals = np.array(["", "a", "abc", "inventory_123", "한글"], dtype=object)
    vec = stable_hash64(vals)
    for i, v in enumerate(vals):
        assert int(vec[i]) == fnv_scalar(str(v))
