from .loss import bce_wll_style, logit_l2, pairwise_auc_loss
from .sched import cosine_warmup_lr, make_lr_schedule
from .ema import EmaState, init_ema, update_ema, ema_params, make_ema_mask
from .trainer import train_main, train_one_fold

__all__ = [
    "bce_wll_style",
    "logit_l2",
    "pairwise_auc_loss",
    "cosine_warmup_lr",
    "make_lr_schedule",
    "EmaState",
    "init_ema",
    "update_ema",
    "ema_params",
    "make_ema_mask",
    "train_main",
    "train_one_fold",
]
