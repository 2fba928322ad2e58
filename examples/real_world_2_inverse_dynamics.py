"""Real-world 2 — inverse dynamics: recover the action from desired motion.

Equivalent of notebooks/real_world/2_inverse_dynamics.ipynb cell 17: encode
the scene ONCE (`Model.encode_image` caches density + Jacobian), then run 100
Adam iterations on the action so predicted optical flow matches a target —
the whole loop is one jitted lax.scan. Also shows the one-shot closed-form
least-squares solve.

Run:  python examples/real_world_2_inverse_dynamics.py
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    from neural_jacobian_field_tpu.data import (
        DataLoader, DatasetCfgCommon, get_dataset, make_synthetic_scene,
    )
    from neural_jacobian_field_tpu.inference import (
        optimize_actions, solve_actions_least_squares,
    )
    from neural_jacobian_field_tpu.models.encoder_resnet import EncoderResnetCfg
    from neural_jacobian_field_tpu.models.model import (
        Model, RenderingCfg, RobotInput, StepCtx, make_model_cfg,
    )
    from neural_jacobian_field_tpu.training import prepare_training_batch

    scene = Path("/tmp/njf_3d_scene_inv")
    if not (scene / "transforms.json").exists():
        make_synthetic_scene(scene, num_cameras=3, num_trajs=2,
                             frames_per_traj=4, height=48, width=64, action_dim=3)
    model = Model(cfg=make_model_cfg(
        "jacobian_mlp", action_dim=3,
        rendering=RenderingCfg(num_proposal_samples=(16,), num_nerf_samples=16),
        encoder=EncoderResnetCfg(norm_type="group", num_layers=3),
    ))
    ds = get_dataset(DatasetCfgCommon(
        name="allegro", mode="perception", root=scene, num_total_joints=3), "train")
    batch = next(iter(DataLoader(ds, batch_size=1, num_workers=0)))
    mi, _ = prepare_training_batch(jax.random.PRNGKey(1), batch, 256)
    ctx = StepCtx(key=jax.random.PRNGKey(0), anneal=jnp.asarray(1.0),
                  updated=jnp.asarray(True))
    variables = model.init(jax.random.PRNGKey(0), mi, ctx, train=False)

    # encode once (no grad through the field afterwards)
    enc = model.apply(variables, mi.camera_input, mi.rendering_input,
                      mi.robot_input, ctx, method=Model.encode_image)
    # pretend a trained Jacobian: any fixed nonzero field demonstrates the math
    enc = enc.replace(action_features=jax.random.normal(
        jax.random.PRNGKey(3), enc.action_features.shape) * 0.05)

    true_action = jnp.array([[0.4, -0.2, 0.6]])
    target_flow = model.apply(variables, enc, mi.camera_input,
                              RobotInput(robot_action=true_action),
                              method=Model.infer_optical_flow)

    result = optimize_actions(model, variables, enc, mi.camera_input, target_flow,
                              key=jax.random.PRNGKey(4), num_iters=100,
                              learning_rate=0.1)
    print("Adam (100 iters, one scan):")
    print("  true action:", np.asarray(true_action[0]).round(3))
    print("  recovered:  ", np.asarray(result.action[0]).round(3),
          f"(loss {float(result.loss):.2e})")

    a_ls = solve_actions_least_squares(model, variables, enc, mi.camera_input,
                                       target_flow)
    print("closed-form least squares:")
    print("  recovered:  ", np.asarray(a_ls[0]).round(3))


if __name__ == "__main__":
    main()
