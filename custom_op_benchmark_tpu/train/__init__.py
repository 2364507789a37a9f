"""Training loops, optimizers, and checkpointing."""

from custom_op_benchmark_tpu.train.loop import (
    TrainState,
    create_train_state,
    make_train_step,
    make_eval_step,
    fit_full_graph,
    fit_sampled,
    fit_sampled_dp,
)
from custom_op_benchmark_tpu.train.checkpoint import (
    save_checkpoint,
    restore_checkpoint,
)
from custom_op_benchmark_tpu.train.resilient import (
    CheckpointManager,
    DivergenceError,
    resilient_steps,
)

__all__ = [
    "TrainState",
    "create_train_state",
    "make_train_step",
    "make_eval_step",
    "fit_full_graph",
    "fit_sampled",
    "fit_sampled_dp",
    "save_checkpoint",
    "restore_checkpoint",
    "CheckpointManager",
    "DivergenceError",
    "resilient_steps",
]
