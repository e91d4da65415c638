from sharp_tpu.analysis.ari import ari, rand_metrics

__all__ = ["ari", "rand_metrics"]
