from .logging import MetricsLogger, get_sanity_metrics, maybe_init_wandb
from .profiling import trace, annotate, StepTimer
