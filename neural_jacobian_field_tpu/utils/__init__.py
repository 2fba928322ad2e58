from .logging import (MetricsLogger, get_sanity_metrics,
                      get_sanity_metrics_traced, maybe_init_wandb)
from .profiling import trace, annotate, StepTimer
from .metrics import psnr, flow_epe, jacobian_error
