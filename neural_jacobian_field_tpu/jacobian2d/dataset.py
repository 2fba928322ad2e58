"""2D trajectory datasets (gzip-pickle Trajectory files, NumPy).

Re-implements jacobian/dataset/: `Trajectory{seq_rgb_obs, seq_qpos,
seq_flow_obs}` gzip pickles (types.py:10-16), per-frame random sampling with
qpos min-max normalization and `action_scale * delta-qpos` commands
(pusher_dataset.py:23-134), the planar-hand variant with flow resizing
(planar_hand_dataset.py:24-153), and a synthetic trajectory writer for tests
(replacing the MuJoCo sim the reference generates data with).

Layouts are NHWC: rgb [T, H, W, 3] float in [0,1]; flow [T, H, W, 2].
(The reference stores flow as [T, 2, H, W]; the loader transposes.)
"""

import gzip
import pickle
import random
from dataclasses import dataclass
from pathlib import Path
from typing import Dict, List, Optional

import numpy as np


def load_gzip_file(path):
    """jacobian/utils/io.py load_gzip_file."""
    with gzip.open(path, "rb") as f:
        return pickle.load(f)


def save_gzip_file(path, obj):
    with gzip.open(path, "wb") as f:
        pickle.dump(obj, f)


@dataclass
class Dataset2DCfg:
    """pusher_dataset.py:17-20 / planar_hand_dataset.py."""

    name: str = "pusher"
    root: Path = Path(".")
    command_dim: int = 2
    action_scale: float = 4.0
    # qpos min-max normalization bounds (pusher_dataset.py:30-33)
    min_qpos: Optional[np.ndarray] = None
    max_qpos: Optional[np.ndarray] = None
    # optional target size; flow magnitudes rescale with resolution
    # (planar_hand_dataset.py via raft resize_batched_flow)
    resize_hw: Optional[tuple] = None


_DEFAULT_BOUNDS = {
    "pusher": (np.array([-1.7, -1.09], np.float32), np.array([0.4, 1.0], np.float32)),
    # planar hand: 4 joints in [-1, 1] (planar_hand_dataset.py)
    "planar_hand": (np.full(4, -1.0, np.float32), np.full(4, 1.0, np.float32)),
}


class Dataset2D:
    """Map-style dataset of (frame, command, flow) samples."""

    repeat: int = 100000

    def __init__(self, cfg: Dataset2DCfg, stage: str = "train"):
        self.cfg = cfg
        self.stage = stage
        self.trajectory_paths = sorted(Path(cfg.root, stage).glob("*.pkl"))
        if cfg.min_qpos is None or cfg.max_qpos is None:
            lo, hi = _DEFAULT_BOUNDS.get(cfg.name, (None, None))
            # trim to command_dim so a 1-DoF pusher doesn't broadcast the
            # 2-dim default bounds back into a 2-dim command
            lo = None if lo is None else lo[: cfg.command_dim]
            hi = None if hi is None else hi[: cfg.command_dim]
            self.min_qpos = lo if cfg.min_qpos is None else cfg.min_qpos
            self.max_qpos = hi if cfg.max_qpos is None else cfg.max_qpos
        else:
            self.min_qpos, self.max_qpos = cfg.min_qpos, cfg.max_qpos

    @property
    def num_files(self) -> int:
        return len(self.trajectory_paths)

    def __len__(self) -> int:
        return self.num_files * (self.repeat if self.stage == "train" else 1)

    def _load(self, idx) -> Dict[str, np.ndarray]:
        traj = load_gzip_file(self.trajectory_paths[idx % self.num_files])
        rgb = np.asarray(traj["seq_rgb_obs"], np.float32)
        if rgb.max() > 1.5:  # uint8 storage
            rgb = rgb / 255.0
        flow = np.asarray(traj["seq_flow_obs"], np.float32)
        if flow.ndim == 4 and flow.shape[1] == 2 and flow.shape[-1] != 2:
            flow = flow.transpose(0, 2, 3, 1)  # [T, 2, H, W] -> [T, H, W, 2]
        qpos = np.asarray(traj["seq_qpos"], np.float32)[:, : self.cfg.command_dim]
        qpos = (qpos - self.min_qpos) / (self.max_qpos - self.min_qpos)
        if self.cfg.resize_hw is not None:
            import jax.numpy as jnp

            from ..flow.raft import resize_batched_flow, resize_batched_frames

            th, tw = self.cfg.resize_hw
            rgb = np.asarray(resize_batched_frames(jnp.asarray(rgb), (th, tw)))
            flow = np.asarray(resize_batched_flow(jnp.asarray(flow), (th, tw)))
        return {"rgb": rgb, "flow": flow, "qpos": qpos}

    def __getitem__(self, idx: int) -> Dict[str, np.ndarray]:
        """Training item: one random frame (pusher_dataset.py:65-101)."""
        traj = self._load(idx)
        t = random.randint(0, len(traj["rgb"]) - 2)
        cmd = self.cfg.action_scale * (traj["qpos"][t + 1] - traj["qpos"][t])
        return {
            "input_frame_curr": traj["rgb"][t],
            "input_frame_next": traj["rgb"][t + 1],
            "input_command": cmd.astype(np.float32),
            "trgt_flow_curr": traj["flow"][t],
        }

    def get_val_item(self, idx: int) -> Dict[str, np.ndarray]:
        """Whole-trajectory validation item (pusher_dataset.py:103-134)."""
        traj = self._load(idx)
        cmds = self.cfg.action_scale * (traj["qpos"][1:] - traj["qpos"][:-1])
        return {
            "input_video_sequence": traj["rgb"],
            "input_command_sequence": cmds.astype(np.float32),
            "trgt_flow_sequence": traj["flow"],
        }


def collate_2d(items: List[dict]) -> Dict[str, np.ndarray]:
    return {k: np.stack([it[k] for it in items]) for k in items[0]}


def make_synthetic_trajectories(
    root, num_trajs: int = 4, num_steps: int = 6, height: int = 32,
    width: int = 32, command_dim: int = 2, seed: int = 0, stage: str = "train",
    scene: str = "pusher",
) -> Path:
    """Synthetic 2D data writer — the analog of the MuJoCo data-gen in the
    tutorial notebooks (the sim is a git submodule absent from the mount).

    scene="pusher": a bright square whose position IS the qpos; flow is the
    square's rigid pixel displacement. Ground-truth Jacobian is constant on
    the square (= gain) and zero elsewhere (notebook 1).

    scene="planar_hand": two "fingertip" squares, one driven by q[0:2], the
    other by q[2:4] (command_dim forced to 4) — the block-structured-Jacobian
    analog of the finger scene in notebook 2: each body responds only to its
    own joints."""
    root = Path(root)
    (root / stage).mkdir(parents=True, exist_ok=True)
    rng = np.random.default_rng(seed)
    if scene == "planar_hand":
        command_dim = 4
    half = 4

    def render_square(img, mask_all, q2, color, x_lo, x_hi):
        """One square constrained to the horizontal band [x_lo, x_hi)."""
        cx = int((q2[0] * 0.5 + 0.5) * (x_hi - x_lo - 2 * half)) + x_lo + half
        # command_dim=1 pusher: y reuses q[0] (the square moves diagonally)
        qy = q2[1] if len(q2) > 1 else q2[0]
        cy = int((qy * 0.5 + 0.5) * (height - 2 * half)) + half
        img[cy - half:cy + half, cx - half:cx + half] = color
        m = np.zeros((height, width), bool)
        m[cy - half:cy + half, cx - half:cx + half] = True
        mask_all.append(m)
        return np.array([cx, cy], np.float32)

    def render(q):
        img = np.full((height, width, 3), 0.15, np.float32)
        masks, centers = [], []
        if scene == "planar_hand":
            centers.append(render_square(img, masks, q[0:2], [0.9, 0.4, 0.2],
                                         0, width // 2))
            centers.append(render_square(img, masks, q[2:4], [0.2, 0.5, 0.9],
                                         width // 2, width))
        else:
            centers.append(render_square(img, masks, q[:2], [0.9, 0.4, 0.2],
                                         0, width))
        return img, masks, centers

    for traj_idx in range(num_trajs):
        q = rng.uniform(-0.6, 0.6, command_dim)
        rgbs, flows, qposs = [], [], []
        for _ in range(num_steps):
            img, masks, c0 = render(q)
            q_next = np.clip(q + rng.normal(0, 0.12, command_dim), -0.8, 0.8)
            _, _, c1 = render(q_next)
            flow = np.zeros((height, width, 2), np.float32)
            for m, a, b in zip(masks, c0, c1):
                flow[m] = b - a
            rgbs.append(img)
            flows.append(flow)
            qposs.append(q.copy())
            q = q_next
        save_gzip_file(root / stage / f"{traj_idx:05d}.pkl", {
            "seq_rgb_obs": np.stack(rgbs),
            "seq_qpos": np.stack(qposs).astype(np.float32),
            "seq_flow_obs": np.stack(flows),
        })
    return root
