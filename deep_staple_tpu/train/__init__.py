from .losses import weighted_cross_entropy, per_sample_cross_entropy, dp_loss_fn
from .optim import SparseAdamState, sparse_adam_init, sparse_adam_update, exp_lr
from .state import DeepStapleState, create_state
from .step import make_train_step, make_eval_step
from .checkpoint import save_checkpoint, restore_checkpoint, checkpoint_exists
from .snapshot import export_train_label_snapshot
from .prepare import prepare_data
from .driver import train_dl, make_model

__all__ = [
    "weighted_cross_entropy",
    "per_sample_cross_entropy",
    "dp_loss_fn",
    "SparseAdamState",
    "sparse_adam_init",
    "sparse_adam_update",
    "exp_lr",
    "DeepStapleState",
    "create_state",
    "make_train_step",
    "make_eval_step",
    "save_checkpoint",
    "restore_checkpoint",
    "checkpoint_exists",
    "export_train_label_snapshot",
    "prepare_data",
    "train_dl",
    "make_model",
]
