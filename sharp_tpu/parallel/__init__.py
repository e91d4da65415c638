from sharp_tpu.parallel.mesh import make_mesh
from sharp_tpu.parallel.sharded import process_folds_sharded

__all__ = ["make_mesh", "process_folds_sharded"]
