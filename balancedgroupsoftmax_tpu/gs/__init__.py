from .partition import GSPartition, make_partition, load_partition, save_partition
from .head import gs_loss, gs_merge_scores

__all__ = [
    "GSPartition",
    "make_partition",
    "load_partition",
    "save_partition",
    "gs_loss",
    "gs_merge_scores",
]
