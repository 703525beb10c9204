from .hashing import stable_hash64, hash_to_buckets, hash_group_ids
from .seed import set_seed, prng_key
from .log import Logger

__all__ = [
    "stable_hash64",
    "hash_to_buckets",
    "hash_group_ids",
    "set_seed",
    "prng_key",
    "Logger",
]
