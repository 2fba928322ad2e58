from .logging import MetricsLogger, get_sanity_metrics, maybe_init_wandb
