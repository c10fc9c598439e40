from .schedules import exp_lr_scheduler_with_warmup, multistep_lr_scheduler_with_warmup  # noqa: F401
from .optim import get_optimizer  # noqa: F401
from .train_state import TrainState, create_train_state, make_train_step  # noqa: F401
