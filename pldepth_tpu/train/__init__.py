from pldepth_tpu.train.schedules import build_schedule, sgdr_schedule, step_decay_schedule
from pldepth_tpu.train.trainer import Trainer, TrainState

__all__ = [
    "Trainer",
    "TrainState",
    "build_schedule",
    "sgdr_schedule",
    "step_decay_schedule",
]
