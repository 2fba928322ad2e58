"""Real-world 1 — whole-image rendering + joint-sensitivity visualization.

Equivalent of notebooks/real_world/1_*.ipynb: load a trained 3D model, render
rgb / depth / flow with the chunked patch renderer, composite per-joint
Jacobian sensitivity over the image. Defaults to a freshly-trained tiny model
on the synthetic sphere scene so it runs anywhere; point --config/--ckpt at a
real run for actual robots.

Run:  python examples/real_world_1_visualize.py [--out /tmp/njf_vis]
"""

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="/tmp/njf_vis")
    ap.add_argument("--scene", default="/tmp/njf_3d_scene")
    ap.add_argument("--steps", type=int, default=100)
    ap.add_argument("--hw", type=int, nargs=2, default=(48, 64))
    args = ap.parse_args()

    from PIL import Image

    from neural_jacobian_field_tpu.data import (
        DataLoader, DatasetCfgCommon, get_dataset, make_synthetic_scene,
    )
    from neural_jacobian_field_tpu.inference import (
        compute_joint_sensitivity, depth_colormap, flow_to_rgb, render_camera,
        visualize_joint_sensitivity,
    )
    from neural_jacobian_field_tpu.models.encoder_resnet import EncoderResnetCfg
    from neural_jacobian_field_tpu.models.model import (
        CameraInput, Model, RenderingCfg, RobotInput, make_model_cfg,
    )
    from neural_jacobian_field_tpu.training import (
        TrainCfg, create_train_state, make_train_step, prepare_training_batch,
    )

    h, w = args.hw
    scene = Path(args.scene)
    if not (scene / "transforms.json").exists():
        make_synthetic_scene(scene, num_cameras=3, num_trajs=2,
                             frames_per_traj=4, height=h, width=w, action_dim=3)

    model = Model(cfg=make_model_cfg(
        "jacobian_mlp", action_dim=3,
        rendering=RenderingCfg(num_proposal_samples=(24,), num_nerf_samples=24,
                               proposal_warmup=50),
        encoder=EncoderResnetCfg(norm_type="group", num_layers=3),
    ))
    ds = get_dataset(DatasetCfgCommon(
        name="allegro", mode="perception", root=scene, num_total_joints=3), "train")
    loader = iter(DataLoader(ds, batch_size=4, num_workers=0))
    tcfg = TrainCfg(mode="perception", rays_per_batch=128, lr=5e-4, warm_up_steps=20)
    batch0 = next(loader)
    state = create_train_state(jax.random.PRNGKey(0), model, batch0, tcfg)
    step = make_train_step(model, tcfg, donate=False)
    print(f"training tiny perception model for {args.steps} steps...")
    for i in range(args.steps):
        state, m = step(state, next(loader), jax.random.PRNGKey(100 + i))
        if (i + 1) % 25 == 0:
            print(f"  step {i + 1}: rgb={float(m['loss/rgb']):.4f}")

    variables = {"params": state.params}
    mi, _ = prepare_training_batch(jax.random.PRNGKey(5), batch0, 8)
    out = render_camera(model, variables, mi.camera_input, mi.robot_input,
                        z_near=0.5, z_far=10.0, height=h, width=w, patch_size=512)

    outdir = Path(args.out)
    outdir.mkdir(parents=True, exist_ok=True)
    Image.fromarray((np.clip(np.asarray(out.rgb[0]), 0, 1) * 255).astype(np.uint8)
                    ).save(outdir / "rgb.png")
    Image.fromarray(depth_colormap(np.asarray(out.depth_raw[0]))).save(outdir / "depth.png")
    Image.fromarray(flow_to_rgb(np.asarray(out.flow_raw[0]))).save(outdir / "flow.png")

    sens = compute_joint_sensitivity(np.asarray(out.action_features))
    palette = np.array([[1, 0, 0], [0, 1, 0], [0, 0, 1]], np.float32).T
    img = visualize_joint_sensitivity(sens, palette)
    Image.fromarray(img[0]).save(outdir / "sensitivity.png")
    print("wrote rgb/depth/flow/sensitivity pngs ->", outdir)


if __name__ == "__main__":
    main()
