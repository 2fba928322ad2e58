"""Training CLI — the reference's `python -m neural_jacobian_field.train`
surface (train.py:23-88) on the TPU-native stack.

Usage (README.md:124-133 parity):
  python -m neural_jacobian_field_tpu.train \
      dataset=dataset_allegro model=model_allegro \
      dataset.root=/path/to/scene dataset.mode=perception
  python -m neural_jacobian_field_tpu.train \
      dataset.mode=action checkpoint.load=checkpoints/perception

Differences from the reference, by design:
  - one jitted SPMD train step over a jax.sharding Mesh replaces PL DDP;
  - orbax checkpoints replace wandb artifacts (wandb stays optional metrics);
  - host loader threads replace torch DataLoader workers.
"""

import sys
import time
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from .config import get_typed_root_config, load_config
from .config.common import PipelineCfg
from .data import DataLoader, get_dataset
from .models.model import Model
from .parallel import make_mesh, replicate, shard_batch
from .training import TrainCfg, create_train_state, make_train_step
from .training.checkpoint import CheckpointManager, load_params_only
from .utils import MetricsLogger, maybe_init_wandb

CONFIG_DIR = Path(__file__).parent.parent / "configurations"


def train(cfg: PipelineCfg, max_steps_override=None, log_dir=None):
    mode = cfg.dataset.mode
    print(f"mode={mode} devices={jax.device_count()} ({jax.devices()[0].platform})")

    dataset = get_dataset(cfg.dataset, "train")
    num_tracks = None
    if mode == "action" and cfg.dataset.action_supervision_type == "tracks":
        num_tracks = (cfg.dataset.num_positive_samples or 512) + (
            cfg.dataset.num_negative_samples or 512
        )
    mesh = make_mesh()
    n_dev = jax.device_count()
    batch_size = max(cfg.training.data.batch_size // n_dev, 1) * n_dev
    loader = iter(DataLoader(dataset, batch_size, num_tracks=num_tracks,
                             num_workers=cfg.training.data.num_workers))

    compute_dtype = (jnp.bfloat16 if cfg.training.compute_dtype == "bfloat16"
                     else None)
    model = Model(cfg=cfg.model, compute_dtype=compute_dtype)
    tcfg = TrainCfg(
        mode=mode, lr=cfg.training.optim.lr,
        weight_decay=cfg.training.optim.weight_decay,
        warm_up_steps=cfg.training.optim.warm_up_steps,
        rays_per_batch=cfg.training.data.rays_per_batch or 256,
        loss=cfg.training.loss,
    )

    first_batch = next(loader)
    state = create_train_state(jax.random.PRNGKey(cfg.seed), model, first_batch, tcfg)
    if cfg.checkpoint.load:
        print(f"warm-starting params from {cfg.checkpoint.load}")
        state = state.replace(params=load_params_only(cfg.checkpoint.load, state.params))
    state = replicate(state, mesh)

    ckpt = CheckpointManager(cfg.checkpoint.dir,
                             save_interval_steps=cfg.checkpoint.every_n_train_steps)
    wandb_run = maybe_init_wandb(cfg.wandb)
    logger = MetricsLogger(log_dir=log_dir or Path("logs"), wandb_run=wandb_run)

    step_fn = make_train_step(model, tcfg)
    max_steps = max_steps_override or cfg.training.max_steps
    key = jax.random.PRNGKey(cfg.seed + 1)
    t_last, n_last = time.time(), 0
    for i in range(max_steps):
        key, sub = jax.random.split(key)
        batch = shard_batch(next(loader), mesh)
        state, metrics = step_fn(state, batch, sub)
        if (i + 1) % 100 == 0:
            metrics = jax.device_get(metrics)
            dt = time.time() - t_last
            rays = (i + 1 - n_last) * batch_size * tcfg.rays_per_batch
            logger.log(i + 1, {**metrics, "perf/rays_per_sec": rays / dt})
            t_last, n_last = time.time(), i + 1
        ckpt.maybe_save(state)
    ckpt.wait()
    logger.close()
    return state


def main(argv=None):
    overrides = list(argv if argv is not None else sys.argv[1:])
    cfg_dict = load_config(CONFIG_DIR, overrides)
    cfg = get_typed_root_config(cfg_dict)
    train(cfg)


if __name__ == "__main__":
    main()
