"""Tutorial 2 — visualize the trained 2D Jacobian field.

Equivalent of notebooks/tutorial/2_*.ipynb: run whole-trajectory inference,
write flow and per-command sensitivity videos (as png frame strips).

Run after tutorial 1:  python examples/tutorial_2_visualize_2d.py
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import flax.traverse_util as tu
import jax
import numpy as np


def main():
    from PIL import Image

    from neural_jacobian_field_tpu.jacobian2d import (
        Dataset2D, Dataset2DCfg, UnetJacobianField, UnetJacobianFieldCfg,
        create_video_grid, flow_video, visualize_model, visualize_sensitivity,
    )

    root = Path("/tmp/njf_2d_data")
    params_file = root / "params.npz"
    model = UnetJacobianField(cfg=UnetJacobianFieldCfg())
    if params_file.exists():
        loaded = np.load(params_file)
        params = tu.unflatten_dict({tuple(k.split("/")): loaded[k] for k in loaded.files})
    else:
        print("run tutorial 1 first; using random params")
        import jax.numpy as jnp
        params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)),
                            jnp.zeros((1, 2)))["params"]
    variables = {"params": params}

    ds = Dataset2D(Dataset2DCfg(name="pusher", root=root), "train")
    val = ds.get_val_item(0)
    preds = visualize_model(model, variables, val["input_video_sequence"],
                            val["input_command_sequence"])

    pred_vid = flow_video(preds["flow"])
    gt_vid = flow_video(val["trgt_flow_sequence"][:-1])
    sens_vid = visualize_sensitivity(preds["jacobian"])
    rgb_vid = (val["input_video_sequence"][:-1] * 255).astype(np.uint8)
    grid = create_video_grid([rgb_vid, gt_vid, pred_vid, sens_vid])

    out = Path("/tmp/njf_2d_vis")
    out.mkdir(exist_ok=True)
    for t in range(len(grid)):
        Image.fromarray(grid[t]).save(out / f"frame_{t:03d}.png")
    print(f"wrote {len(grid)} grid frames (rgb | gt flow | pred flow | "
          f"sensitivity) -> {out}")


if __name__ == "__main__":
    main()
