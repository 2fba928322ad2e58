"""2D pipeline training CLI — the reference's `python -m jacobian.train`
surface (jacobian/train.py:25-83) on the TPU-native stack.

Usage:
  python -m neural_jacobian_field_tpu.train2d \
      --root /path/to/trajectories --model unet --command-dim 2 \
      --steps 2000 [--dataset pusher|planar_hand] [--resize H W]

Data: gzip-pickle Trajectory files under <root>/train/ (jacobian/dataset/
types.py:10-16); generate a synthetic set with --make-synthetic.
Checkpoints: flattened-params .npz consumed by examples/tutorial_2 and 3.
"""

import argparse
import time
from pathlib import Path

import numpy as np


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--root", default="/tmp/njf_2d_data")
    ap.add_argument("--dataset", default="pusher",
                    choices=["pusher", "planar_hand"])
    ap.add_argument("--model", default="unet", choices=["unet", "transformer"])
    ap.add_argument("--command-dim", type=int, default=2)
    ap.add_argument("--steps", type=int, default=2000)
    ap.add_argument("--batch-size", type=int, default=16)
    ap.add_argument("--lr", type=float, default=1e-4)
    ap.add_argument("--warmup", type=int, default=1000)
    ap.add_argument("--resize", type=int, nargs=2, default=None)
    ap.add_argument("--make-synthetic", action="store_true",
                    help="generate synthetic trajectories under --root first")
    ap.add_argument("--out", default=None, help="params .npz path")
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args(argv)

    import jax

    jax.config.update("jax_compilation_cache_dir",
                      str(Path.home() / ".cache" / "njf_jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import flax.traverse_util as tu

    from .jacobian2d import (
        Dataset2D, Dataset2DCfg, Train2DCfg, collate_2d, get_model,
        make_synthetic_trajectories, make_train_step_2d, create_train_state_2d,
    )
    from .jacobian2d.models import MODELS_2D

    root = Path(args.root)
    if args.make_synthetic or not (root / "train").exists():
        print(f"generating synthetic trajectories -> {root}")
        make_synthetic_trajectories(root, num_trajs=16, num_steps=8,
                                    height=64, width=64,
                                    command_dim=args.command_dim)

    ds = Dataset2D(Dataset2DCfg(
        name=args.dataset, root=root, command_dim=args.command_dim,
        resize_hw=tuple(args.resize) if args.resize else None), "train")
    print(f"dataset: {ds.num_files} trajectories ({args.dataset})")

    cfg_cls, _ = MODELS_2D[args.model]
    model = get_model(cfg_cls(command_dim=args.command_dim))
    tcfg = Train2DCfg(lr=args.lr, warm_up_steps=args.warmup)

    rng = np.random.default_rng(args.seed)

    def batch():
        idx = rng.integers(0, len(ds), args.batch_size)
        return collate_2d([ds[int(i)] for i in idx])

    state = create_train_state_2d(jax.random.PRNGKey(args.seed), model, batch(), tcfg)
    step = make_train_step_2d(model, tcfg)
    t0 = time.time()
    for i in range(args.steps):
        state, m = step(state, batch())
        if (i + 1) % 100 == 0:
            print(f"step {i + 1}: loss={float(m['train/loss']):.6f} "
                  f"({(i + 1) / (time.time() - t0):.1f} steps/s)", flush=True)

    out = Path(args.out) if args.out else root / "params.npz"
    flat = {"/".join(k): np.asarray(v)
            for k, v in tu.flatten_dict(jax.device_get(state.params)).items()}
    np.savez(out, **flat)
    print(f"saved params -> {out}")


if __name__ == "__main__":
    main()
