from sharp_tpu.io.blocks import BlockStore, save_blocks

__all__ = ["BlockStore", "save_blocks"]
