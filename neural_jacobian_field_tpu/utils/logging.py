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


class WandbArtifactCheckpoints:
    """Space-efficient checkpoint artifacts + offline sync triggering — the
    orbax-flow rebuild of the reference's SpaceEfficientWandbLogger /
    OfflineWandbLogger (utils/wandb_logger.py:26-131, 134-189).

    After each orbax save, logs the checkpoint step directory as a wandb
    Artifact `model-<run id>` with alias "latest" (plus "best" when the
    caller marks it). The PREVIOUS version then gets a TTL of
    `expiration_days` — superseded checkpoints expire, the newest is kept
    indefinitely (the reference's space-saving scheme).

    With offline=True, each checkpoint also drops a wandb-osh-compatible
    trigger file (a file in `.wandb_osh_command_dir` whose content is the
    local run directory) at most every `min_sync_interval` seconds, so a
    network-connected companion process can `wandb sync` the run — the
    reference's SLURM workaround.
    """

    def __init__(self, run, expiration_days: Optional[int] = 5,
                 offline: bool = False, min_sync_interval: float = 60.0,
                 communication_dir=Path(".wandb_osh_command_dir")):
        self.run = run
        self.expiration_days = expiration_days
        self.offline = offline
        self.min_sync_interval = min_sync_interval
        self.communication_dir = Path(communication_dir)
        self._last_artifact = None
        self._last_sync = 0.0
        self._name = f"model-{getattr(run, 'id', 'run')}"

    def on_checkpoint(self, path, step: int, best: bool = False):
        """Call after CheckpointManager.maybe_save returns True."""
        import wandb

        artifact = wandb.Artifact(
            name=self._name, type="model",
            metadata={"step": int(step), "original_path": str(path)},
        )
        artifact.add_dir(str(path))
        aliases = ["latest", "best"] if best else ["latest"]
        self.run.log_artifact(artifact, aliases=aliases)

        if self._last_artifact is not None and self.expiration_days is not None:
            from datetime import timedelta

            prev = self._last_artifact
            if hasattr(prev, "wait"):
                prev.wait()
            try:
                prev.ttl = timedelta(days=self.expiration_days)
                prev.save()
            except Exception as e:  # offline runs can't set TTL server-side
                print(f"artifact TTL not set ({e}); superseded version kept")
        self._last_artifact = artifact

        if self.offline:
            self._trigger_sync()

    def _trigger_sync(self):
        now = time.time()
        if now - self._last_sync < self.min_sync_interval:
            return
        self._last_sync = now
        self.communication_dir.mkdir(parents=True, exist_ok=True)
        run_dir = getattr(self.run, "dir", None) or "wandb/latest-run"
        # wandb-osh protocol: one file per trigger, content = run dir
        trigger = self.communication_dir / f"{time.time_ns()}.command"
        trigger.write_text(str(Path(run_dir).parent), encoding="utf-8")


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
