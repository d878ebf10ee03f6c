from lcgan_tpu.train.state import TrainState, create_train_state
from lcgan_tpu.train.steps import Trainer

__all__ = ["TrainState", "create_train_state", "Trainer"]
