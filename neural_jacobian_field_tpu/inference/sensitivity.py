"""Joint-sensitivity visualization of the Jacobian field.

Re-implements the reference's inference/jacobian_color_map.py:13-135:
per-joint sensitivity = ||J_i(x)|| (optionally after transforming J into the
camera frame), min-max normalized per joint, then color-mixed with a
per-robot palette. Pure NumPy/JAX; no cv2 dependency for the core math.
"""

from typing import Dict, List, Optional

import numpy as np

# inference/jacobian_color_map.py:13-50
JACOBIAN_COLORMAP: Dict[str, List[List[float]]] = {
    "model_allegro": [
        [0.0, 0.5, 0.5], [0, 1, 0], [0.8, 0.1, 0.1], [0.8, 0.0, 0.8],
        [0.0, 0.8, 0], [1.0, 0.8, 0], [1, 1, 0], [1, 0.0, 0.0],
    ],
    "model_allegro_transformer": [
        [0.0, 0.5, 0.5], [0, 1, 0], [0.8, 0.1, 0.1], [0.8, 0.0, 0.8],
        [0.0, 0.8, 0], [1.0, 0.8, 0], [1, 1, 0], [1, 0.0, 0.0],
    ],
    "model_toy_arm": [
        [0.5, 0.8, 0.2], [0.9, 0.2, 0.0], [0, 0.8, 0], [1.0, 0.0, 1.0],
        [0, 0, 1], [0.1, 0.9, 0.7],
    ],
    "model_pneumatic_hand_only": [
        [0, 0, 1], [0.9, 0.2, 0.0], [0, 0.9, 0], [1.0, 0.0, 1.0],
        [0.1, 0.9, 0.7], [0.5, 0.8, 0.2],
    ],
}


def compute_joint_sensitivity(
    jacobians: np.ndarray,
    extrinsics: Optional[np.ndarray] = None,
    mode: int = 0,
) -> np.ndarray:
    """[..., H, W, A*3] composited Jacobians -> [..., A, H, W] sensitivity
    in [0, 1] (jacobian_color_map.py:53-90)."""
    j = np.asarray(jacobians)
    *lead, h, w, ad = j.shape
    j = j.reshape(*lead, h, w, ad // 3, 3)
    if extrinsics is not None:
        # homogeneous vector transform into the camera frame
        j_h = np.concatenate([j, np.zeros_like(j[..., :1])], axis=-1)
        ext = np.asarray(extrinsics).reshape(*lead, 1, 1, 1, 4, 4)
        j = np.einsum("...ij,...j->...i", ext, j_h)[..., :3]
    sens = np.linalg.norm(j, axis=-1)  # [..., H, W, A]
    sens = np.moveaxis(sens, -1, -3)  # [..., A, H, W]
    minima = sens.min(axis=(-2, -1), keepdims=True)
    maxima = sens.max(axis=(-2, -1), keepdims=True)
    sens = (sens - minima) / (maxima - minima + 1e-10)
    if mode == 1:
        sens = 1.1 - sens
    return np.clip(sens, 0.0, 1.0)


def visualize_joint_sensitivity(sensitivity: np.ndarray,
                                color_map: np.ndarray) -> np.ndarray:
    """[..., A, H, W] sensitivity + [3, A] palette -> uint8 [..., H, W, 3]
    (jacobian_color_map.py:92-109; output is inverted as in the reference)."""
    mixed = np.einsum("...ahw,ca->...chw", sensitivity, np.asarray(color_map))
    minima = mixed.min(axis=(-2, -1), keepdims=True)
    maxima = mixed.max(axis=(-2, -1), keepdims=True)
    mixed = np.clip((mixed - minima) / (maxima - minima + 1e-10), 0, 1)
    mixed = np.moveaxis(mixed, -3, -1)
    return ((1.0 - mixed) * 255).astype(np.uint8)


def compute_joint_sensitivity_point_cloud(jacobians: np.ndarray) -> np.ndarray:
    """[N, A, 3] per-point Jacobians -> [N, A] norms
    (jacobian_color_map.py:112-135)."""
    return np.linalg.norm(np.asarray(jacobians), axis=-1)
