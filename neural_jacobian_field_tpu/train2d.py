"""2D pipeline training CLI — the reference's `python -m jacobian.train`
surface (jacobian/train.py:25-83) on the TPU-native stack.

Config surface (same YAML groups + dotted overrides as the reference's
jacobian/configurations tree, served by the shared config/tools.py):

  python -m neural_jacobian_field_tpu.train2d \
      dataset=pusher_only wrapper=pusher_only \
      dataset.root=/path/to/trajectories training.max_steps=2000

A legacy argparse form (`--root ... --model unet ...`) is kept for the
tutorial examples; it is detected by a leading "--" argument.

Data: gzip-pickle Trajectory files under <root>/train/ (jacobian/dataset/
types.py:10-16); generate a synthetic set with make_synthetic=true.
Checkpoints: flattened-params .npz consumed by examples/tutorial_2 and 3.
"""

import sys
import time
from pathlib import Path

import numpy as np

CONFIG2D_DIR = Path(__file__).parent.parent / "configurations2d"


def train2d(cfg, log=print):
    """Train from a typed Pipeline2DCfg; returns (state, params_path)."""
    import jax

    import flax.traverse_util as tu

    from .jacobian2d import (Dataset2D, Dataset2DCfg, Train2DCfg, collate_2d,
                             create_train_state_2d, get_model,
                             make_synthetic_trajectories, make_train_step_2d)

    root = Path(cfg.dataset.root)
    if cfg.make_synthetic or not (root / "train").exists():
        log(f"generating synthetic trajectories -> {root}")
        make_synthetic_trajectories(root, num_trajs=16, num_steps=8,
                                    height=64, width=64,
                                    command_dim=cfg.dataset.command_dim)

    resize = None
    if cfg.dataset.new_H is not None and cfg.dataset.new_W is not None:
        resize = (cfg.dataset.new_H, cfg.dataset.new_W)
    ds = Dataset2D(Dataset2DCfg(
        name=cfg.dataset.name, root=root, command_dim=cfg.dataset.command_dim,
        action_scale=cfg.dataset.action_scale, resize_hw=resize), "train")
    log(f"dataset: {ds.num_files} trajectories ({cfg.dataset.name})")

    model_cfg = cfg.wrapper.model
    if model_cfg.command_dim != cfg.dataset.command_dim:
        from dataclasses import replace

        model_cfg = replace(model_cfg, command_dim=cfg.dataset.command_dim)
    model = get_model(model_cfg)
    tcfg = Train2DCfg(lr=cfg.wrapper.optim.lr,
                      weight_decay=cfg.wrapper.optim.weight_decay,
                      warm_up_steps=cfg.wrapper.optim.warm_up_steps)

    rng = np.random.default_rng(cfg.seed)
    batch_size = cfg.training.data.batch_size

    def batch():
        idx = rng.integers(0, len(ds), batch_size)
        return collate_2d([ds[int(i)] for i in idx])

    state = create_train_state_2d(jax.random.PRNGKey(cfg.seed), model, batch(), tcfg)
    step = make_train_step_2d(model, tcfg)
    t0 = time.time()
    for i in range(cfg.training.max_steps):
        state, m = step(state, batch())
        if (i + 1) % 100 == 0:
            log(f"step {i + 1}: loss={float(m['train/loss']):.6f} "
                f"({(i + 1) / (time.time() - t0):.1f} steps/s)")

    out = Path(cfg.checkpoint.out) if cfg.checkpoint.out else root / "params.npz"
    flat = {"/".join(k): np.asarray(v)
            for k, v in tu.flatten_dict(jax.device_get(state.params)).items()}
    np.savez(out, **flat)
    log(f"saved params -> {out}")
    return state, out


def _legacy_argparse(argv):
    """Pre-round-2 flag CLI, mapped onto the typed config."""
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--root", default="/tmp/njf_2d_data")
    ap.add_argument("--dataset", default="pusher", choices=["pusher", "planar_hand"])
    ap.add_argument("--model", default="unet", choices=["unet", "transformer"])
    ap.add_argument("--command-dim", type=int, default=2)
    ap.add_argument("--steps", type=int, default=2000)
    ap.add_argument("--batch-size", type=int, default=16)
    ap.add_argument("--lr", type=float, default=1e-4)
    ap.add_argument("--warmup", type=int, default=1000)
    ap.add_argument("--resize", type=int, nargs=2, default=None)
    ap.add_argument("--make-synthetic", action="store_true")
    ap.add_argument("--out", default=None)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args(argv)
    overrides = [
        f"dataset.name={args.dataset}", f"dataset.root={args.root}",
        f"dataset.command_dim={args.command_dim}",
        f"wrapper.model.name={args.model}",
        f"wrapper.model.command_dim={args.command_dim}",
        f"wrapper.optim.lr={args.lr}", f"wrapper.optim.warm_up_steps={args.warmup}",
        f"training.max_steps={args.steps}",
        f"training.data.batch_size={args.batch_size}",
        f"seed={args.seed}",
        f"make_synthetic={str(args.make_synthetic).lower()}",
    ]
    if args.resize:
        overrides += [f"dataset.new_H={args.resize[0]}",
                      f"dataset.new_W={args.resize[1]}"]
    if args.out:
        overrides.append(f"checkpoint.out={args.out}")
    return overrides


def main(argv=None):
    import jax

    jax.config.update("jax_compilation_cache_dir",
                      str(Path.home() / ".cache" / "njf_jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    argv = list(argv if argv is not None else sys.argv[1:])
    if any(a.startswith("--") for a in argv):
        argv = _legacy_argparse(argv)

    from .config import load_config
    from .jacobian2d.config import get_typed_2d_config

    cfg_dict = load_config(CONFIG2D_DIR, argv)
    cfg = get_typed_2d_config(cfg_dict)
    train2d(cfg)


if __name__ == "__main__":
    main()
