from acmgnn_tpu.train.config import TrainConfig
from acmgnn_tpu.train.trainer import train_single_split, run_experiment

__all__ = ["TrainConfig", "train_single_split", "run_experiment"]
