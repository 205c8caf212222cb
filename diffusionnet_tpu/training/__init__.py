"""Training harness: optimizers/schedules, jitted train/eval steps, fit loop,
checkpointing."""

from .fit import (  # noqa: F401
    adam_with_step_decay,
    make_train_step,
    make_eval_step,
    step_decay_schedule,
)
from .checkpoint import (save_checkpoint, restore_checkpoint,  # noqa: F401
                         latest_checkpoint)
from .profiling import StageTimer, device_trace, slope_throughput  # noqa: F401
from .inference import InferenceSession  # noqa: F401
