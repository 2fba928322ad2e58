"""Metrics sinks + sanity telemetry.

Replaces the reference's wandb-only logging (utils/wandb_logger.py,
utils/logging_utils.py:6-37): a composable sink that writes scalars to the
console and a JSONL metrics stream, and to wandb when available AND
configured (zero-egress environments run with mode=disabled). Sanity metrics
(min/max of every float leaf) mirror logging_utils.get_sanity_metrics.
"""

import json
import time
from pathlib import Path
from typing import Dict, Optional

import jax
import numpy as np


def get_sanity_metrics(tree, prefix: str = "") -> Dict[str, float]:
    """Min/max of every float array leaf (logging_utils.py:6-19). Host-side."""
    out = {}
    for name, leaf in _float_leaves(tree, prefix):
        arr = np.asarray(leaf)
        out[f"{name}_min"] = float(arr.min())
        out[f"{name}_max"] = float(arr.max())
    return out


def get_sanity_metrics_traced(tree, prefix: str = ""):
    """jit-safe variant: returns traced scalar min/max per float leaf (for
    merging into train-step metrics)."""
    import jax.numpy as jnp

    out = {}
    for name, leaf in _float_leaves(tree, prefix):
        out[f"{name}_min"] = jnp.min(leaf)
        out[f"{name}_max"] = jnp.max(leaf)
    return out


def _float_leaves(tree, prefix: str = ""):
    import jax.numpy as jnp

    for path, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]:
        if leaf is None:
            continue
        dtype = getattr(leaf, "dtype", None)
        if dtype is None or not jnp.issubdtype(dtype, jnp.floating):
            continue
        name = prefix + "_".join(
            str(getattr(p, "name", getattr(p, "key", getattr(p, "idx", p))))
            for p in path
        )
        yield name, leaf


class MetricsLogger:
    """Console + JSONL scalar sink; optional wandb passthrough."""

    def __init__(self, log_dir: Optional[Path] = None, wandb_run=None,
                 print_every: int = 100):
        self.log_dir = Path(log_dir) if log_dir else None
        self.print_every = print_every
        self.wandb_run = wandb_run
        self._fp = None
        if self.log_dir is not None:
            self.log_dir.mkdir(parents=True, exist_ok=True)
            self._fp = open(self.log_dir / "metrics.jsonl", "a", encoding="utf-8")
        self._t0 = time.time()

    def log(self, step: int, metrics: Dict[str, float]):
        scalars = {k: float(v) for k, v in metrics.items()}
        if self._fp is not None:
            self._fp.write(json.dumps({"step": step, "t": time.time() - self._t0,
                                       **scalars}) + "\n")
            self._fp.flush()
        if self.wandb_run is not None:
            self.wandb_run.log(scalars, step=step)
        if step % self.print_every == 0:
            parts = " ".join(f"{k}={v:.5g}" for k, v in sorted(scalars.items())
                             if not k.startswith("sanity/"))
            print(f"[step {step}] {parts}", flush=True)

    def close(self):
        if self._fp is not None:
            self._fp.close()


def maybe_init_wandb(cfg) -> Optional[object]:
    """Start a wandb run when configured AND the library is importable
    (wandb_logger.py:26-131; offline/disabled-friendly)."""
    if getattr(cfg, "mode", "disabled") == "disabled":
        return None
    try:
        import wandb
    except ImportError:
        print("wandb not installed; logging to JSONL only")
        return None
    return wandb.init(project=cfg.project, entity=cfg.entity, name=cfg.name,
                      group=cfg.group, tags=cfg.tags, mode=cfg.mode)
