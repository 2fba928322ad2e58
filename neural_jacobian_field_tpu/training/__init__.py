from .prepare import RawBatch, prepare_training_batch
from .losses import perception_loss, action_loss, LossCfg
from .train import (
    TrainState,
    TrainCfg,
    make_optimizer,
    trainable_mask,
    create_train_state,
    make_train_step,
    make_multi_train_step,
    MultiStepDispatch,
    stack_batches,
    host_step_schedule,
    stop_frozen_gradients,
)
