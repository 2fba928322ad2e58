"""Tutorial 2 — train the planar-hand ("finger") Jacobian field in 2D.

Equivalent of notebooks/tutorial/2_training_finger_jacobian_in_2D.ipynb: the
reference trains a DINOv2-backed transformer Jacobian on MuJoCo planar-hand
trajectories (jacobian/models/jacobian_models/transformer_jacobian.py,
model_wrapper_planar_hand.py). Here the data source is the synthetic
planar-hand stand-in (two fingertip bodies, each driven by 2 of the 4 joints
— a block-structured ground-truth Jacobian), and the model is the same
frozen-ViT + UNet-decoder architecture; drop real DINOv2 weights via
jacobian2d.load_torch_dinov2_state_dict to reproduce the reference backbone.

The default ViT depth is trimmed for a laptop-scale demo; pass --full-vit
for the DINOv2 ViT-S/14 architecture.

Run:  python examples/tutorial_2_train_2d_finger.py [--steps 300]
"""

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import jax
import numpy as np

from neural_jacobian_field_tpu.jacobian2d import (
    Dataset2D, Dataset2DCfg, Train2DCfg, collate_2d, create_train_state_2d,
    make_synthetic_trajectories, make_train_step_2d,
)
from neural_jacobian_field_tpu.jacobian2d.models import (
    TransformerJacobianField, TransformerJacobianFieldCfg,
)
from neural_jacobian_field_tpu.jacobian2d.vit import ViTCfg


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--root", default="/tmp/njf_2d_finger")
    ap.add_argument("--steps", type=int, default=300)
    ap.add_argument("--batch-size", type=int, default=8)
    ap.add_argument("--full-vit", action="store_true",
                    help="DINOv2 ViT-S/14 depth (12); default demo depth is 2")
    args = ap.parse_args()

    root = Path(args.root)
    if not (root / "train").exists():
        print("generating synthetic planar-hand trajectories ->", root)
        # 56x56: a multiple of the ViT patch size (14)
        make_synthetic_trajectories(root, num_trajs=16, num_steps=8,
                                    height=56, width=56, scene="planar_hand")

    ds = Dataset2D(Dataset2DCfg(name="planar_hand", root=root,
                                command_dim=4), "train")
    vit = ViTCfg() if args.full_vit else ViTCfg(depth=2)
    model = TransformerJacobianField(
        cfg=TransformerJacobianFieldCfg(command_dim=4, vit=vit))
    cfg = Train2DCfg(lr=1e-3, warm_up_steps=50)

    rng = np.random.default_rng(0)

    def batch():
        return collate_2d([ds[int(i)]
                           for i in rng.integers(0, len(ds), args.batch_size)])

    state = create_train_state_2d(jax.random.PRNGKey(0), model, batch(), cfg)
    step = make_train_step_2d(model, cfg)
    first = None
    for i in range(args.steps):
        state, m = step(state, batch())
        loss = float(m["train/loss"])
        first = first if first is not None else loss
        if (i + 1) % 50 == 0:
            print(f"step {i + 1}: loss={loss:.6f}")

    # the DINO backbone must be bit-frozen (reference parity:
    # transformer_jacobian.py:55-57 never hands it to the optimizer)
    import flax.traverse_util as tu

    flat = {"/".join(k): np.asarray(v)
            for k, v in tu.flatten_dict(jax.device_get(state.params)).items()}
    out = root / "params.npz"
    np.savez(out, **flat)
    print(f"trained {args.steps} steps: loss {first:.5f} -> {loss:.6f}; "
          f"params -> {out}")


if __name__ == "__main__":
    main()
