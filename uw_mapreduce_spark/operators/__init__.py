from .partitioning import range_partition, rebalance_by_rank, sort_within_partitions, total_sort
from .rank import global_rank, global_rank_scalable
from .sampling import bernoulli_sample, equi_depth_borders
from .window import sliding_aggregate
from .scale import sliding_aggregate_scalable

__all__ = [
    "bernoulli_sample",
    "equi_depth_borders",
    "global_rank",
    "global_rank_scalable",
    "range_partition",
    "rebalance_by_rank",
    "sliding_aggregate",
    "sliding_aggregate_scalable",
    "sort_within_partitions",
    "total_sort",
]
