from .etl import analyze_schema_and_stats, build_sharded_cache, build_train_and_test
from .dataset import ShardCache, load_labels_groups_for_split
from .loader import BatchIterator, DevicePrefetcher
from .sampler import BalancedBatchSampler

__all__ = [
    "analyze_schema_and_stats",
    "build_sharded_cache",
    "build_train_and_test",
    "ShardCache",
    "load_labels_groups_for_split",
    "BatchIterator",
    "DevicePrefetcher",
    "BalancedBatchSampler",
]
