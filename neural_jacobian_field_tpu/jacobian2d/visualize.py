"""2D pipeline visualization: batched model inference + video grids.

Re-implements the `visualize_model` batch-inference API and sensitivity/flow
video helpers from jacobian/models/model_wrapper_pusher.py:99-297 and
model_wrapper_planar_hand.py:147-432 — the surface the tutorial notebooks use.
"""

from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..inference.render import flow_to_rgb
from .models import compute_sensitivity


def visualize_model(model, variables, video: np.ndarray, commands: np.ndarray,
                    batch_size: int = 12) -> Dict[str, np.ndarray]:
    """Chunked whole-trajectory inference (model_wrapper_pusher.py:99-145).

    video: [T, H, W, 3]; commands: [T-1, C]. Returns dict of stacked
    predictions {"flow" [T-1, H, W, 2], "jacobian" [T-1, H, W, C*S]}.
    """
    frames = jnp.asarray(video[:-1])
    cmds = jnp.asarray(commands)

    @jax.jit
    def run(img, cmd):
        out = model.apply(variables, img, cmd)
        return out.flow, out.jacobian

    flows, jacs = [], []
    for i in range(0, len(frames), batch_size):
        f, j = run(frames[i:i + batch_size], cmds[i:i + batch_size])
        flows.append(np.asarray(f))
        jacs.append(np.asarray(j))
    return {"flow": np.concatenate(flows), "jacobian": np.concatenate(jacs)}


def visualize_sensitivity(jacobian: np.ndarray, palette: Optional[np.ndarray] = None,
                          spatial_dim: int = 2) -> np.ndarray:
    """Per-command sensitivity -> color-mixed uint8 frames
    (model_wrapper_pusher.py:21-47). jacobian: [T, H, W, C*S]."""
    sens = np.asarray(compute_sensitivity(jnp.asarray(jacobian), spatial_dim))
    t, h, w, c = sens.shape
    if palette is None:
        # distinct hues per command channel
        palette = np.stack([
            np.array([1.0, 0.2, 0.2]), np.array([0.2, 1.0, 0.2]),
            np.array([0.2, 0.4, 1.0]), np.array([1.0, 0.8, 0.1]),
            np.array([0.9, 0.2, 0.9]), np.array([0.2, 0.9, 0.9]),
        ][:c]).T  # [3, C]
    mixed = np.einsum("thwc,rc->thwr", sens, palette[:, :c])
    mixed = mixed / (mixed.max(axis=(1, 2, 3), keepdims=True) + 1e-10)
    return ((1.0 - np.clip(mixed, 0, 1)) * 255).astype(np.uint8)


def flow_video(flow: np.ndarray) -> np.ndarray:
    """[T, H, W, 2] -> uint8 [T, H, W, 3] with a shared color scale."""
    max_norm = max(float(np.linalg.norm(flow, axis=-1).max()), 1e-8)
    return np.stack([flow_to_rgb(f, max_norm=max_norm) for f in flow])


def create_video_grid(videos: List[np.ndarray], pad: int = 2) -> np.ndarray:
    """Horizontally tile equally-sized uint8 videos [T, H, W, 3]
    (model_wrapper_pusher.py create_video_grid)."""
    t, h, _, c = videos[0].shape
    spacer = np.full((t, h, pad, c), 255, np.uint8)
    tiles = []
    for i, v in enumerate(videos):
        tiles.append(v)
        if i < len(videos) - 1:
            tiles.append(spacer)
    return np.concatenate(tiles, axis=2)
