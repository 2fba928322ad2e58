"""Notebook/inference loaders.

Re-implements inference/loaders.py:51-169: parse a nerfstudio-style camera
json into a camera context, and load a trained model + params from a config
dir + checkpoint path (the reference's hydra-compose + wandb:// download is
replaced by our config loader + orbax restore).
"""

import json
from typing import Dict, Optional, Tuple

import jax.numpy as jnp
import numpy as np

from ..config import get_typed_root_config, load_config
from ..data.conventions import normalize_intrinsics, post_process_camera_to_world
from ..models.model import Model
from ..training.checkpoint import load_params_only


def parse_camera_json(path, downscale: float = 1.0) -> Dict[str, np.ndarray]:
    """nerfstudio camera json -> {c2w [4,4] OpenCV, intrinsics [3,3]
    normalized, height, width} (inference/loaders.py:51-112)."""
    with open(path, encoding="utf-8") as f:
        cam = json.load(f)
    if "camera_path" in cam:  # nerfstudio viewer export
        cam = cam["camera_path"][0]
    c2w = np.asarray(cam["camera_to_world"] if "camera_to_world" in cam
                     else cam["transform_matrix"], dtype=np.float32).reshape(4, 4)
    h = int(cam.get("h", cam.get("height")))
    w = int(cam.get("w", cam.get("width")))
    if "fl_x" in cam:
        fx, fy = float(cam["fl_x"]), float(cam["fl_y"])
        cx, cy = float(cam.get("cx", w / 2)), float(cam.get("cy", h / 2))
    else:  # fov-style export
        fov = float(cam["fov"])
        fx = fy = 0.5 * h / np.tan(0.5 * np.deg2rad(fov))
        cx, cy = w / 2, h / 2
    intr = np.array([[fx, 0, cx], [0, fy, cy], [0, 0, 1]], np.float32) / downscale
    intr[2, 2] = 1.0
    h, w = int(h / downscale), int(w / downscale)
    return {
        "c2w": post_process_camera_to_world(c2w),
        "intrinsics": normalize_intrinsics(intr, h, w),
        "height": h,
        "width": w,
    }


def load_model(config_dir, checkpoint_path: Optional[str] = None,
               overrides=(), compute_dtype=None) -> Tuple[Model, Optional[dict]]:
    """Build the model from the configurations tree (+ CLI-style overrides)
    and optionally restore params (inference/loaders.py:115-169)."""
    cfg = get_typed_root_config(load_config(config_dir, list(overrides)))
    model = Model(cfg=cfg.model, compute_dtype=compute_dtype)
    variables = None
    if checkpoint_path is not None:
        import jax

        # init a template at tiny shapes to get the param tree, then restore
        from ..models.model import (CameraInput, ModelInput, RenderingInput,
                                    RobotInput, StepCtx)

        b = 1
        mi = ModelInput(
            camera_input=CameraInput(
                input_image=jnp.zeros((b, 64, 64, 3)),
                ctxt_extrinsics=jnp.broadcast_to(jnp.eye(4), (b, 4, 4)),
                ctxt_intrinsics=jnp.broadcast_to(jnp.eye(3), (b, 3, 3)),
                trgt_extrinsics=jnp.broadcast_to(jnp.eye(4), (b, 4, 4)),
                trgt_intrinsics=jnp.broadcast_to(jnp.eye(3), (b, 3, 3)),
            ),
            rendering_input=RenderingInput(
                origins=jnp.zeros((b, 4, 3)),
                directions=jnp.broadcast_to(jnp.array([0.0, 0.0, 1.0]), (b, 4, 3)),
                z_near=jnp.full((b,), 0.5), z_far=jnp.full((b,), 10.0),
            ),
            robot_input=RobotInput(robot_action=jnp.zeros((b, cfg.model.action_dim))),
        )
        ctx = StepCtx(key=jax.random.PRNGKey(0), anneal=jnp.asarray(1.0),
                      updated=jnp.asarray(True))
        template = model.init(jax.random.PRNGKey(0), mi, ctx)
        params = load_params_only(checkpoint_path, template["params"])
        variables = dict(template)
        variables["params"] = params
        if "batch_stats" in template:
            # eval-mode BatchNorm reads the running stats; fresh stats cost
            # ~15 dB of render PSNR (training/checkpoint.py::load_batch_stats)
            from ..training.checkpoint import load_batch_stats

            variables["batch_stats"] = load_batch_stats(
                checkpoint_path, template["batch_stats"])
    return model, variables


def resolve_checkpoint(uri: str, download_dir="checkpoints") -> str:
    """Resolve a checkpoint URI (utils/wandb_ckpt.py:49-71): local paths pass
    through; wandb://entity/project/run:vN downloads the artifact when wandb
    is importable and logged in."""
    if not str(uri).startswith("wandb://"):
        return str(uri)
    try:
        import wandb
    except ImportError as e:
        raise RuntimeError(
            "wandb:// checkpoint URIs need the wandb package; in zero-egress "
            "environments pass a local orbax checkpoint directory instead"
        ) from e
    spec = str(uri)[len("wandb://"):]
    run_path, _, version = spec.partition(":")
    version = version or "latest"
    api = wandb.Api()
    artifact = api.artifact(f"{run_path}:{version}")
    return artifact.download(root=download_dir)
