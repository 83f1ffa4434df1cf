from .checkpoint import (
    latest_step,
    prune_checkpoints,
    restore_checkpoint,
    save_checkpoint,
)
from .eval import (
    NBestTracker,
    average_checkpoints,
    evaluate,
    make_eval_step,
    write_averaged_checkpoint,
)
from .loop import LoopConfig, run_training
from .lora import LoraConfig, fold_lora, init_lora, merge_lora
from .optim import OptimConfig, make_optimizer, make_schedule
from .step import (
    FROZEN_BACKBONE_TRAINABLE,
    TrainConfig,
    TrainState,
    create_train_state,
    make_train_step,
    place_batch,
    place_train_state,
    train_state_shardings,
    trainable_mask,
)
