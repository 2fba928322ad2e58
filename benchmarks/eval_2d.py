"""2D pipeline quality eval: flow-MSE/EPE + closed-loop control convergence
on the synthetic pusher (VERDICT r2 item 9 — the 2D analog of
eval_synthetic.py's measured-quality story).

Reference counterpart: jacobian/models/model_wrapper_pusher.py:99-192 logs
validation flow renders; tutorial notebook 3 demonstrates lstsq control.
Here both become numbers: train a UNet Jacobian field on synthetic pusher
trajectories, measure flow prediction error on a held-out split, then run
the closed-loop least-squares controller and report convergence.

Usage:
  python benchmarks/eval_2d.py [--steps 800] [--root /tmp/njf_2d_eval] [--tpu]
"""

import argparse
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import jax
import jax.numpy as jnp
import numpy as np


class SyntheticSquareEnv:
    """The square world from make_synthetic_trajectories as a steppable env
    (same geometry/colors so the trained model is in-distribution); kept in
    sync with examples/tutorial_3_control_demo.py."""

    def __init__(self, hw=64, half=8):
        self.hw, self.half = hw, half
        self.q = np.array([-0.4, 0.3])

    def render(self):
        img = np.full((self.hw, self.hw, 3), 0.15, np.float32)
        cx, cy = self._center()
        img[cy - self.half:cy + self.half, cx - self.half:cx + self.half] = \
            [0.9, 0.4, 0.2]
        return img

    def _center(self):
        s = self.hw - 2 * self.half
        return (int((self.q[0] * 0.5 + 0.5) * s) + self.half,
                int((self.q[1] * 0.5 + 0.5) * s) + self.half)

    def tracked_pixels(self, n=16):
        cx, cy = self._center()
        rng = np.random.default_rng(0)
        off = rng.integers(-self.half + 1, self.half - 1, (n, 2))
        return np.stack([cy + off[:, 0], cx + off[:, 1]], -1)  # yx

    def step(self, dq):
        self.q = np.clip(self.q + dq, -0.8, 0.8)


class SyntheticPlanarHandEnv:
    """The two-fingertip world from make_synthetic_trajectories(scene=
    "planar_hand") as a steppable env: square 0 in the left half driven by
    q[0:2], square 1 in the right half by q[2:4] (block-structured Jacobian
    — the 2D analog of the reference's planar-hand scene,
    model_wrapper_planar_hand.py:110-145)."""

    def __init__(self, hw=56, half=4):
        self.hw, self.half = hw, half
        self.q = np.array([-0.4, 0.3, 0.2, -0.3])

    def _center(self, which):
        x_lo, x_hi = (0, self.hw // 2) if which == 0 else (self.hw // 2, self.hw)
        q2 = self.q[0:2] if which == 0 else self.q[2:4]
        cx = int((q2[0] * 0.5 + 0.5) * (x_hi - x_lo - 2 * self.half)) + x_lo + self.half
        cy = int((q2[1] * 0.5 + 0.5) * (self.hw - 2 * self.half)) + self.half
        return cx, cy

    def render(self):
        img = np.full((self.hw, self.hw, 3), 0.15, np.float32)
        for which, color in ((0, [0.9, 0.4, 0.2]), (1, [0.2, 0.5, 0.9])):
            cx, cy = self._center(which)
            img[cy - self.half:cy + self.half,
                cx - self.half:cx + self.half] = color
        return img

    def tracked_pixels(self, n=8):
        rng = np.random.default_rng(0)
        pts = []
        for which in (0, 1):
            cx, cy = self._center(which)
            off = rng.integers(-self.half + 1, self.half - 1, (n, 2))
            pts.append(np.stack([cy + off[:, 0], cx + off[:, 1]], -1))
        return np.concatenate(pts, axis=0)  # [2n, 2] yx

    def step(self, dq):
        self.q = np.clip(self.q + dq, -0.8, 0.8)


def eval_transformer_planar_hand(args):
    """VERDICT r3 item 7: the left_finger/planar-hand TRANSFORMER path gets
    the same held-out-metric story as the UNet pusher — frozen-DINO-arch ViT
    features + UNet decoder, held-out flow EPE + closed-loop lstsq control
    driving BOTH fingertips."""
    from neural_jacobian_field_tpu.jacobian2d import (
        Dataset2D, Dataset2DCfg, Train2DCfg, collate_2d, control_step,
        create_train_state_2d, make_synthetic_trajectories, make_train_step_2d,
    )
    from neural_jacobian_field_tpu.jacobian2d.dataset import _DEFAULT_BOUNDS
    from neural_jacobian_field_tpu.jacobian2d.models import (
        TransformerJacobianField, TransformerJacobianFieldCfg)
    from neural_jacobian_field_tpu.jacobian2d.vit import ViTCfg

    root = Path(args.root + "_hand")
    if not (root / "train").exists():
        # 56x56: a multiple of the ViT patch size (14)
        make_synthetic_trajectories(root, num_trajs=16, num_steps=8,
                                    height=56, width=56, seed=0,
                                    stage="train", scene="planar_hand")
        make_synthetic_trajectories(root, num_trajs=4, num_steps=8,
                                    height=56, width=56, seed=99,
                                    stage="val", scene="planar_hand")

    ds = Dataset2D(Dataset2DCfg(name="planar_hand", root=root,
                                command_dim=4), "train")
    ds_val = Dataset2D(Dataset2DCfg(name="planar_hand", root=root,
                                    command_dim=4), "val")
    vit = ViTCfg() if args.full_vit else ViTCfg(depth=2)
    model = TransformerJacobianField(
        cfg=TransformerJacobianFieldCfg(command_dim=4, vit=vit))
    cfg = Train2DCfg(lr=1e-3, warm_up_steps=50)
    rng = np.random.default_rng(0)

    def batch(r):
        idx = r.integers(0, len(ds), args.batch_size)
        b = collate_2d([ds[int(i)] for i in idx])
        return {k: jnp.asarray(v) for k, v in b.items()}

    state = create_train_state_2d(jax.random.PRNGKey(0), model, batch(rng), cfg)
    step = make_train_step_2d(model, cfg, donate=False)
    for i in range(args.steps):
        state, metrics = step(state, batch(rng))
        if i % 200 == 0 or i == args.steps - 1:
            print(f"[hand] step {i}: loss {float(metrics['train/loss']):.5f}",
                  file=sys.stderr)
    variables = {"params": state.params}

    @jax.jit
    def predict(img, cmd):
        return model.apply(variables, img, cmd).flow

    mses, epes, n_frames = [], [], 0
    for i in range(ds_val.num_files):
        item = ds_val.get_val_item(i)
        video = jnp.asarray(item["input_video_sequence"][:-1])
        cmds = jnp.asarray(item["input_command_sequence"])
        pred = np.asarray(predict(video, cmds))
        gt = item["trgt_flow_sequence"][:-1]
        mses.append(float(np.mean((pred - gt) ** 2)))
        epes.append(float(np.mean(np.linalg.norm(pred - gt, axis=-1))))
        n_frames += len(video)
    print(json.dumps({"metric": "flow_mse_2d_transformer",
                      "value": round(float(np.mean(mses)), 5),
                      "unit": f"px^2 over {n_frames} held-out frames (planar hand)"}))
    print(json.dumps({"metric": "flow_epe_2d_transformer",
                      "value": round(float(np.mean(epes)), 3),
                      "unit": "px end-point error (held-out, planar hand)"}))

    # closed-loop control of BOTH fingertips (the block-Jacobian must route
    # each finger's desired motion to its own joints)
    env = SyntheticPlanarHandEnv()
    target = SyntheticPlanarHandEnv()
    target.q = np.array([0.5, -0.5, -0.4, 0.5])
    lo, hi = _DEFAULT_BOUNDS["planar_hand"]
    iters_to_converge, final_dist = None, None
    for it in range(40):
        obs = jnp.asarray(env.render())[None]
        yx = env.tracked_pixels()
        desired = []
        for which in (0, 1):
            cx, cy = env._center(which)
            tx, ty = target._center(which)
            d = np.clip(np.tile([[tx - cx, ty - cy]], (len(yx) // 2, 1)), -6, 6)
            desired.append(d)
        desired = np.concatenate(desired, axis=0).astype(np.float32)
        u = control_step(model, variables, obs, jnp.asarray(yx),
                         jnp.asarray(desired), damping=1e-3)
        dq = np.asarray(u) / 4.0 * (hi - lo)
        env.step(np.clip(dq, -0.1, 0.1))
        final_dist = float(max(
            np.hypot(target._center(0)[0] - env._center(0)[0],
                     target._center(0)[1] - env._center(0)[1]),
            np.hypot(target._center(1)[0] - env._center(1)[0],
                     target._center(1)[1] - env._center(1)[1])))
        if final_dist < 2 and iters_to_converge is None:
            iters_to_converge = it + 1
            break
    print(json.dumps({"metric": "control_iters_2d_transformer",
                      "value": iters_to_converge if iters_to_converge else -1,
                      "unit": "lstsq iters to BOTH fingertips <2 px (40 max; -1 = no convergence)"}))
    print(json.dumps({"metric": "control_final_dist_2d_transformer",
                      "value": round(final_dist, 2), "unit": "px (max over fingers)"}))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--root", default="/tmp/njf_2d_eval")
    ap.add_argument("--steps", type=int, default=800)
    ap.add_argument("--batch-size", type=int, default=16)
    ap.add_argument("--tpu", action="store_true",
                    help="run on the TPU (default: CPU — tiny workload)")
    ap.add_argument("--model", default="unet", choices=["unet", "transformer"])
    ap.add_argument("--full-vit", action="store_true",
                    help="DINOv2 ViT-S/14 depth (12); default eval depth is 2")
    args = ap.parse_args()
    if not args.tpu:
        jax.config.update("jax_platforms", "cpu")

    if args.model == "transformer":
        eval_transformer_planar_hand(args)
        return

    from neural_jacobian_field_tpu.jacobian2d import (
        Dataset2D, Dataset2DCfg, Train2DCfg, UnetJacobianField,
        UnetJacobianFieldCfg, collate_2d, control_step, create_train_state_2d,
        make_synthetic_trajectories, make_train_step_2d,
    )
    from neural_jacobian_field_tpu.jacobian2d.dataset import _DEFAULT_BOUNDS

    root = Path(args.root)
    if not (root / "train").exists():
        make_synthetic_trajectories(root, num_trajs=16, num_steps=8,
                                    height=64, width=64, seed=0, stage="train")
        make_synthetic_trajectories(root, num_trajs=4, num_steps=8,
                                    height=64, width=64, seed=99, stage="val")

    ds = Dataset2D(Dataset2DCfg(name="pusher", root=root), "train")
    ds_val = Dataset2D(Dataset2DCfg(name="pusher", root=root), "val")

    model = UnetJacobianField(cfg=UnetJacobianFieldCfg())
    cfg = Train2DCfg(lr=1e-3)
    rng = np.random.default_rng(0)

    def batch(r):
        idx = r.integers(0, len(ds), args.batch_size)
        b = collate_2d([ds[int(i)] for i in idx])
        return {k: jnp.asarray(v) for k, v in b.items()}

    state = create_train_state_2d(jax.random.PRNGKey(0), model, batch(rng), cfg)
    step = make_train_step_2d(model, cfg, donate=False)
    loss = None
    for i in range(args.steps):
        state, metrics = step(state, batch(rng))
        if i % 200 == 0 or i == args.steps - 1:
            loss = float(metrics["train/loss"])
            print(f"step {i}: loss {loss:.5f}", file=sys.stderr)

    variables = {"params": state.params}

    # --- flow error on the held-out split (every val sample)
    @jax.jit
    def predict(img, cmd):
        return model.apply(variables, img, cmd).flow

    mses, epes, n_frames = [], [], 0
    for i in range(ds_val.num_files):
        item = ds_val.get_val_item(i)  # whole trajectory, deterministic
        video = jnp.asarray(item["input_video_sequence"][:-1])
        cmds = jnp.asarray(item["input_command_sequence"])
        pred = np.asarray(predict(video, cmds))
        gt = item["trgt_flow_sequence"][:-1]
        mses.append(float(np.mean((pred - gt) ** 2)))
        epes.append(float(np.mean(np.linalg.norm(pred - gt, axis=-1))))
        n_frames += len(video)
    print(json.dumps({"metric": "flow_mse_2d", "value": round(float(np.mean(mses)), 5),
                      "unit": f"px^2 over {n_frames} held-out frames"}))
    print(json.dumps({"metric": "flow_epe_2d", "value": round(float(np.mean(epes)), 3),
                      "unit": "px end-point error (held-out)"}))

    # --- closed-loop control convergence (tutorial-3 loop, deterministic)
    env = SyntheticSquareEnv()
    target = SyntheticSquareEnv()
    target.q = np.array([0.5, -0.5])
    tx, ty = target._center()
    lo, hi = _DEFAULT_BOUNDS["pusher"]
    iters_to_converge, final_dist = None, None
    for it in range(30):
        obs = jnp.asarray(env.render())[None]
        yx = env.tracked_pixels()
        cx, cy = env._center()
        desired = np.clip(np.tile([[tx - cx, ty - cy]], (len(yx), 1)), -6, 6)
        u = control_step(model, variables, obs, jnp.asarray(yx),
                         jnp.asarray(desired.astype(np.float32)), damping=1e-3)
        dq = np.asarray(u) / 4.0 * (hi - lo)
        env.step(np.clip(dq, -0.1, 0.1))
        final_dist = float(np.hypot(tx - env._center()[0], ty - env._center()[1]))
        if final_dist < 2 and iters_to_converge is None:
            iters_to_converge = it + 1
            break
    print(json.dumps({"metric": "control_iters_2d",
                      "value": iters_to_converge if iters_to_converge else -1,
                      "unit": "lstsq control iters to <2 px (30 max; -1 = no convergence)"}))
    print(json.dumps({"metric": "control_final_dist_2d",
                      "value": round(final_dist, 2), "unit": "px"}))


if __name__ == "__main__":
    main()
