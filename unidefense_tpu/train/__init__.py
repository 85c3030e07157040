from unidefense_tpu.train.optim import build_optimizer, build_lr_schedule, get_optimizer
from unidefense_tpu.train.perturb import perturb_input
from unidefense_tpu.train.step import TrainState, create_train_state, make_train_step, make_eval_step

__all__ = [
    "build_optimizer",
    "build_lr_schedule",
    "get_optimizer",
    "perturb_input",
    "TrainState",
    "create_train_state",
    "make_train_step",
    "make_eval_step",
]
