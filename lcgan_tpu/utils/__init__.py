from lcgan_tpu.utils.checkpoint import CheckpointManager
from lcgan_tpu.utils.media import make_grid, save_image_grid, save_video

__all__ = ["CheckpointManager", "make_grid", "save_image_grid", "save_video"]
