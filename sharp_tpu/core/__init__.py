from sharp_tpu.core.wmetac import wmetac
from sharp_tpu.core.block import cluster_block_ensemble

__all__ = ["wmetac", "cluster_block_ensemble"]
