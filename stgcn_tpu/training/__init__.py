from stgcn_tpu.training.checkpoint import (
    latest_checkpoint,
    restore_checkpoint,
    save_checkpoint,
)
from stgcn_tpu.training.config import ExperimentConfig, model_config_from, parse_config
from stgcn_tpu.training.loop import EarlyStopping, Trainer, make_eval_step, make_train_step
from stgcn_tpu.training.metrics import accuracy, confusion_matrix, cross_entropy
from stgcn_tpu.training.train_state import TrainState, create_train_state
from stgcn_tpu.training.optimizers import make_optimizer, make_schedule
