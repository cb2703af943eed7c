from .ema import init_ema, update_ema
from .metrics import psnr, ssim, mae
from .train_state import (TrainState, create_train_state, make_train_step,
                          make_eval_step, make_optimizer, make_lr_schedule)
from .trainer import Trainer, train_model, save_comparison_grid
from . import checkpoint
from .trainer import DistillationTrainer
