"""Tutorial 1 — generate 2D data and train the UNet Jacobian field.

Equivalent of notebooks/tutorial/1_*.ipynb: the reference generates pusher
trajectories with MuJoCo (git submodule) + RAFT flow; here the default data
source is the synthetic pusher stand-in (analytic flow). With MuJoCo
installed (`import mujoco`) you can plug your own env in `generate_data`.

Run:  python examples/tutorial_1_train_2d_pusher.py [--steps 500]
"""

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import jax
import numpy as np

from neural_jacobian_field_tpu.jacobian2d import (
    Dataset2D, Dataset2DCfg, Train2DCfg, UnetJacobianField, UnetJacobianFieldCfg,
    collate_2d, create_train_state_2d, make_synthetic_trajectories,
    make_train_step_2d,
)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--root", default="/tmp/njf_2d_data")
    ap.add_argument("--steps", type=int, default=500)
    ap.add_argument("--batch-size", type=int, default=16)
    args = ap.parse_args()

    root = Path(args.root)
    if not (root / "train").exists():
        print("generating synthetic trajectories ->", root)
        make_synthetic_trajectories(root, num_trajs=16, num_steps=8,
                                    height=64, width=64)

    ds = Dataset2D(Dataset2DCfg(name="pusher", root=root), "train")
    model = UnetJacobianField(cfg=UnetJacobianFieldCfg())
    cfg = Train2DCfg(lr=1e-3, warm_up_steps=50)

    rng = np.random.default_rng(0)

    def batch():
        return collate_2d([ds[int(i)] for i in rng.integers(0, len(ds), args.batch_size)])

    state = create_train_state_2d(jax.random.PRNGKey(0), model, batch(), cfg)
    step = make_train_step_2d(model, cfg)
    for i in range(args.steps):
        state, m = step(state, batch())
        if (i + 1) % 50 == 0:
            print(f"step {i + 1}: loss={float(m['train/loss']):.6f}")

    out = Path(args.root) / "params.npz"
    import flax.traverse_util as tu

    flat = {"/".join(k): np.asarray(v)
            for k, v in tu.flatten_dict(jax.device_get(state.params)).items()}
    np.savez(out, **flat)
    print("saved params ->", out)


if __name__ == "__main__":
    main()
