from nvae_tpu.train.state import TrainState, create_train_state  # noqa: F401
from nvae_tpu.train.step import make_eval_step, make_train_step  # noqa: F401
from nvae_tpu.train.trainer import Trainer, TrainResult  # noqa: F401
