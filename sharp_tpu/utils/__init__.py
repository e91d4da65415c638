from sharp_tpu.utils.prng import seed_to_key, member_key
from sharp_tpu.utils.timers import StageTimer, log

__all__ = ["seed_to_key", "member_key", "StageTimer", "log"]
