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

import math
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
from .parallel import DevicePrefetcher, make_mesh, replicate
from .training import (MultiStepDispatch, TrainCfg, create_train_state,
                       host_step_schedule, make_multi_train_step,
                       make_train_step, stack_batches)
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
        grad_clip_norm=cfg.training.optim.grad_clip_norm,
        encoder_lr_scale=cfg.training.optim.encoder_lr_scale,
    )

    first_batch = next(loader)
    print("first batch ready", flush=True)
    state = create_train_state(jax.random.PRNGKey(cfg.seed), model, first_batch, tcfg)
    print("train state initialized", flush=True)
    if cfg.checkpoint.load:
        print(f"warm-starting params from {cfg.checkpoint.load}")
        state = state.replace(params=load_params_only(cfg.checkpoint.load, state.params))
    state = replicate(state, mesh)

    ckpt = CheckpointManager(cfg.checkpoint.dir,
                             save_interval_steps=cfg.checkpoint.every_n_train_steps)
    wandb_run = maybe_init_wandb(cfg.wandb)
    logger = MetricsLogger(log_dir=log_dir or Path("logs"), wandb_run=wandb_run)
    # checkpoint-as-artifact with TTL rotation + offline sync triggers
    # (reference utils/wandb_logger.py:26-189; only when a run is live)
    wandb_ckpts = None
    if wandb_run is not None:
        from .utils.logging import WandbArtifactCheckpoints

        wandb_ckpts = WandbArtifactCheckpoints(
            wandb_run, offline=cfg.wandb.mode == "offline")

    # validation data: a length-1 random-sample wrapper over the VAL split
    # (data/data_module.py:34-43 + validation_wrapper.py:6-23) — never the
    # training batch, which could hide overfitting.
    val_sampler = None
    if cfg.training.val_check_interval:
        from .data.loader import ValidationWrapper, collate

        try:
            val_sampler = ValidationWrapper(get_dataset(cfg.dataset, "val"),
                                            seed=cfg.seed + 2)
        except Exception as e:  # e.g. no val frames in a tiny synthetic root
            print(f"val split unavailable ({e}); validating on train split")
            val_sampler = ValidationWrapper(dataset, seed=cfg.seed + 2)

        def next_val_batch():
            return collate([val_sampler[0]], num_tracks=num_tracks)

    spc = max(int(cfg.training.steps_per_call), 1)
    if spc > 1:
        step_fn = make_multi_train_step(model, tcfg, steps_per_call=spc)
        # statically-gated unrolled programs for the recurring steady-state
        # gate rotations (XLA deletes the proposal backward on the frozen
        # substeps; see make_train_step's static_updated). The rotation's
        # phase depends on where warmup leaves the ssu counter, so programs
        # are compiled on the second sight of a window's gate tuple rather
        # than assumed up front (MultiStepDispatch).
        # at steady state the gate cycle has period update_every+1; a spc
        # window can see cycle/gcd(spc, cycle) distinct rotations of it —
        # size the compile cap so every recurring rotation gets its program
        cycle = int(model.cfg.rendering.proposal_update_every) + 1
        rotations = cycle // math.gcd(spc, cycle)
        steady = MultiStepDispatch(
            lambda gt: make_multi_train_step(
                model, tcfg, steps_per_call=spc, static_schedule=gt),
            warmup=int(model.cfg.rendering.proposal_warmup),
            max_programs=max(rotations, 4))
        host_iter = iter(loader)
        stacked_iter = (stack_batches([next(host_iter) for _ in range(spc)])
                        for _ in iter(int, 1))
        device_iter = DevicePrefetcher(stacked_iter, mesh, depth=2,
                                       stacked=True)
    else:
        # two statically-gated variants: after proposal warmup only every
        # proposal_update_every-th step pays the proposal backward
        # (ray_samplers.py:536-544 semantics; host_step_schedule mirrors the
        # traced gate exactly, so the ssu counter evolution is identical)
        step_fns = {
            True: make_train_step(model, tcfg, static_updated=True),
            False: make_train_step(model, tcfg, static_updated=False),
        }
        device_iter = DevicePrefetcher(loader, mesh, depth=2)
    max_steps = max_steps_override or cfg.training.max_steps
    print(f"starting training for {max_steps} steps "
          f"({spc} per dispatch)", flush=True)
    key = jax.random.PRNGKey(cfg.seed + 1)
    t_last, n_last = time.time(), 0
    i = 0
    host_ssu = 0  # mirrors state.steps_since_update (host_step_schedule)
    while i < max_steps:
        key, sub = jax.random.split(key)
        batch = next(device_iter)
        if spc > 1:
            # window gates from the host mirror; recurring gate tuples get a
            # statically-gated program, warmup windows (tuples that never
            # recur) stay on the traced scan
            gates, ssu = [], host_ssu
            for j in range(spc):
                g, ssu = host_step_schedule(i + j, ssu, model.cfg.rendering)
                gates.append(g)
            host_ssu = ssu
            fn = steady.select(i, gates, step_fn)
            state, metrics = fn(state, batch, sub)
        else:
            updated, host_ssu = host_step_schedule(i, host_ssu,
                                                   model.cfg.rendering)
            state, metrics = step_fns[updated](state, batch, sub)
        first = i == 0
        prev = i
        i += spc
        if first:
            jax.block_until_ready(metrics["loss/total"])
            print("first step compiled + executed", flush=True)
        if (i // spc) % max(100 // spc, 1) == 0:
            metrics = jax.device_get(metrics)
            metrics = jax.tree.map(lambda x: x[-1] if getattr(x, "ndim", 0) else x,
                                   metrics)
            dt = time.time() - t_last
            rays = (i - n_last) * batch_size * tcfg.rays_per_batch
            logger.log(i, {**metrics, "perf/rays_per_sec": rays / dt})
            t_last, n_last = time.time(), i
        # validate whenever a val_check_interval boundary was crossed in this
        # dispatch (works for any steps_per_call — the scan simply pauses
        # between dispatches; model_wrapper.py:190-213 cadence)
        vci = cfg.training.val_check_interval
        if vci and val_sampler is not None and (prev // vci) != (i // vci):
            _run_validation(model, state, next_val_batch(), cfg, logger,
                            wandb_run, step=i)
        if ckpt.maybe_save(state) and wandb_ckpts is not None:
            ckpt.wait()  # artifact needs the files on disk
            wandb_ckpts.on_checkpoint(
                ckpt.directory / str(int(jax.device_get(state.step))),
                step=int(jax.device_get(state.step)))
    device_iter.close()
    ckpt.wait()
    logger.close()
    return state


def _run_validation(model, state, raw, cfg, logger, wandb_run, step: int):
    """Interpolated-camera validation video (model_wrapper.py:196-387)."""
    from .visualization import render_interpolated_view

    variables = {"params": jax.device_get(state.params)}
    if state.batch_stats is not None:
        variables["batch_stats"] = jax.device_get(state.batch_stats)
    raw0 = jax.tree.map(lambda x: np.asarray(x[:1]) if x is not None else None, raw)
    h, w = raw0.trgt_rgb.shape[1:3]
    videos = render_interpolated_view(
        model, variables,
        ctxt_rgb=raw0.ctxt_rgb, ctxt_extrinsics=raw0.ctxt_extrinsics,
        ctxt_intrinsics=raw0.ctxt_intrinsics,
        trgt_extrinsics=raw0.trgt_extrinsics, trgt_intrinsics=raw0.trgt_intrinsics,
        robot_action=raw0.robot_action,
        near=float(raw0.near[0]), far=float(raw0.far[0]),
        num_frames=cfg.validation.video.num_frames, height=h, width=w,
    )
    if wandb_run is not None:
        import wandb

        for name, vid in videos.items():
            wandb_run.log({f"video/{name}": wandb.Video(
                vid.transpose(0, 3, 1, 2), fps=cfg.validation.video.frame_rate,
                format="mp4")}, step=step)
    else:
        out = (logger.log_dir or Path("logs")) / f"val_{step}"
        out.mkdir(parents=True, exist_ok=True)
        from PIL import Image

        for name, vid in videos.items():
            Image.fromarray(vid[0]).save(out / f"{name}_f0.png")
            Image.fromarray(vid[len(vid) // 2]).save(out / f"{name}_mid.png")
        print(f"[val {step}] wrote frames -> {out}")


def main(argv=None):
    # persistent compilation cache: cold compiles of the full train step can
    # take minutes (especially via remote-TPU tunnels); cache across runs
    jax.config.update("jax_compilation_cache_dir",
                      str(Path.home() / ".cache" / "njf_jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    overrides = list(argv if argv is not None else sys.argv[1:])
    cfg_dict = load_config(CONFIG_DIR, overrides)
    cfg = get_typed_root_config(cfg_dict)
    train(cfg)


if __name__ == "__main__":
    main()
