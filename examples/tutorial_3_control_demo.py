"""Tutorial 3 — closed-loop least-squares control with the 2D Jacobian field.

Equivalent of notebooks/tutorial/3_control_demo_block_pushing.ipynb cell 14:
per step, evaluate the Jacobian field on the observation, gather J at tracked
pixels, solve du = lstsq(J, desired pixel motion), step the system. The
reference steps a MuJoCo env and re-tracks with CoTracker; here the "system"
is the synthetic square world (its ground-truth dynamics ARE the Jacobian),
so the loop runs self-contained. Swap `SyntheticSquareEnv` for a MuJoCo env
+ a host-side tracker for the real demo.

Run after tutorial 1:  python examples/tutorial_3_control_demo.py
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import argparse

import flax.traverse_util as tu
import jax
import jax.numpy as jnp
import numpy as np

from neural_jacobian_field_tpu.jacobian2d import (
    UnetJacobianField, UnetJacobianFieldCfg, control_step,
)
from neural_jacobian_field_tpu.jacobian2d.dataset import _DEFAULT_BOUNDS


class SyntheticSquareEnv:
    """The square world from make_synthetic_trajectories, as a steppable env."""

    def __init__(self, hw=64, half=8):
        self.hw, self.half = hw, half
        self.q = np.array([-0.4, 0.3])

    def render(self):
        img = np.full((self.hw, self.hw, 3), 0.15, np.float32)
        cx, cy = self._center()
        img[cy - self.half:cy + self.half, cx - self.half:cx + self.half] = [0.9, 0.4, 0.2]
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


def main():
    ap = argparse.ArgumentParser()
    # the control loop is host-interactive (env.step each iter); CPU avoids
    # per-iteration tunnel round-trips on remote-TPU setups
    ap.add_argument("--tpu", action="store_true", help="run on the TPU")
    args = ap.parse_args()
    if not args.tpu:
        jax.config.update("jax_platforms", "cpu")
    params_file = Path("/tmp/njf_2d_data/params.npz")
    model = UnetJacobianField(cfg=UnetJacobianFieldCfg())
    if params_file.exists():
        loaded = np.load(params_file)
        params = tu.unflatten_dict({tuple(k.split("/")): loaded[k] for k in loaded.files})
        variables = {"params": params}
        print("loaded trained params")
    else:
        env0 = SyntheticSquareEnv()
        variables = model.init(jax.random.PRNGKey(0),
                               jnp.asarray(env0.render())[None], jnp.zeros((1, 2)))
        print("WARNING: no trained params found (run tutorial 1 first); "
              "using random init — control will not converge")

    env = SyntheticSquareEnv()
    target = SyntheticSquareEnv()
    target.q = np.array([0.5, -0.5])
    tx, ty = target._center()

    # command normalization: model was trained on action_scale * dq_normalized
    lo, hi = _DEFAULT_BOUNDS["pusher"]
    for it in range(20):
        obs = jnp.asarray(env.render())[None]
        yx = env.tracked_pixels()
        cx, cy = env._center()
        desired = np.tile([[tx - cx, ty - cy]], (len(yx), 1)).astype(np.float32)
        desired = np.clip(desired, -6, 6)  # local linearization
        u = control_step(model, variables, obs, jnp.asarray(yx),
                         jnp.asarray(desired), damping=1e-3)
        # undo command normalization: u = 4.0 * dq / (hi - lo)
        dq = np.asarray(u) / 4.0 * (hi - lo)
        env.step(np.clip(dq, -0.1, 0.1))
        dist = np.hypot(tx - env._center()[0], ty - env._center()[1])
        print(f"iter {it}: command={np.round(np.asarray(u), 3)} pixel dist={dist:.1f}")
        if dist < 2:
            print("reached target")
            break


if __name__ == "__main__":
    main()
