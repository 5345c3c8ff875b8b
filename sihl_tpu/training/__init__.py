from sihl_tpu.training.trainer import Trainer
from sihl_tpu.training.optim import make_optimizer, make_schedule
from sihl_tpu.training import metrics

__all__ = ["Trainer", "make_optimizer", "make_schedule", "metrics"]
