from .distill import DistillConfig, TrainState, make_train_step, init_train_state
from .eval import run_eval
from . import checkpoint
