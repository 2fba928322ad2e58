"""2D toy pipeline tests: UNet Jacobian field training end to end on the
synthetic pusher stand-in, sensitivity maps, and least-squares control
(tutorial notebooks 1-3 workflow, SURVEY.md §2.2)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from neural_jacobian_field_tpu.jacobian2d import (
    Dataset2D,
    Dataset2DCfg,
    Train2DCfg,
    TransformerJacobianField,
    TransformerJacobianFieldCfg,
    UNet,
    UnetJacobianField,
    UnetJacobianFieldCfg,
    ViTCfg,
    collate_2d,
    compute_sensitivity,
    control_step,
    create_train_state_2d,
    make_synthetic_trajectories,
    make_train_step_2d,
)

H = W = 32


@pytest.fixture(scope="module")
def traj_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("traj2d")
    make_synthetic_trajectories(root, num_trajs=3, num_steps=5, height=H, width=W)
    return root


def test_unet_shapes():
    net = UNet(out_channels=4, depth=3, start_filts=8)
    x = jnp.zeros((2, H, W, 3))
    variables = net.init(jax.random.PRNGKey(0), x)
    out = net.apply(variables, x)
    assert out.shape == (2, H, W, 4)
    out2, feats = net.apply(variables, x, return_features=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(out2))
    assert feats.shape == (2, H // 4, W // 4, 32)


def test_dataset2d(traj_root):
    ds = Dataset2D(Dataset2DCfg(name="pusher", root=traj_root), "train")
    assert ds.num_files == 3
    item = ds[0]
    assert item["input_frame_curr"].shape == (H, W, 3)
    assert item["trgt_flow_curr"].shape == (H, W, 2)
    assert item["input_command"].shape == (2,)
    val = ds.get_val_item(0)
    assert val["input_video_sequence"].shape == (5, H, W, 3)
    assert val["input_command_sequence"].shape == (4, 2)


def test_unet_jacobian_trains(traj_root):
    """Flow loss must drop by >50% in a few hundred steps on the linear
    synthetic task (tutorial-1 expectation)."""
    ds = Dataset2D(Dataset2DCfg(name="pusher", root=traj_root), "train")
    model = UnetJacobianField(cfg=UnetJacobianFieldCfg(start_filts=8))
    batch = collate_2d([ds[i] for i in range(8)])
    cfg = Train2DCfg(lr=3e-3, warm_up_steps=10)
    state = create_train_state_2d(jax.random.PRNGKey(0), model, batch, cfg)
    step = make_train_step_2d(model, cfg, donate=False)
    losses = []
    for i in range(60):
        state, m = step(state, batch)
        losses.append(float(m["train/loss"]))
    assert np.isfinite(losses).all()
    assert losses[-1] < 0.5 * losses[0], (losses[0], losses[-1])


def test_transformer_jacobian_shapes():
    model = TransformerJacobianField(cfg=TransformerJacobianFieldCfg(
        vit=ViTCfg(patch_size=8, dim=32, depth=1, heads=2, pos_grid=4)))
    x = jnp.zeros((1, H, W, 3))
    cmd = jnp.zeros((1, 2))
    variables = model.init(jax.random.PRNGKey(0), x, cmd)
    out = model.apply(variables, x, cmd)
    assert out.jacobian.shape == (1, H, W, 4)
    assert out.flow.shape == (1, H, W, 2)
    # frozen ViT: stop_gradient => no grads reach dino params
    def loss(p):
        o = model.apply({"params": p}, x + 0.1, cmd + 1.0)
        return jnp.sum(o.flow ** 2)
    g = jax.grad(loss)(variables["params"])
    dino_norm = sum(float(jnp.abs(v).sum()) for v in jax.tree.leaves(g["dino"]))
    dec_norm = sum(float(jnp.abs(v).sum()) for v in jax.tree.leaves(g["decoder"]))
    assert dino_norm == 0.0 and dec_norm > 0.0


def test_sensitivity_2d():
    j = jax.random.normal(jax.random.PRNGKey(0), (2, 8, 8, 4))
    s = compute_sensitivity(j, spatial_dim=2)
    assert s.shape == (2, 8, 8, 2)
    assert float(s.min()) >= 0 and float(s.max()) <= 1


def test_control_step_recovers_command():
    """With a constant ground-truth Jacobian painted into the model's output
    via a linear probe image, lstsq must recover the command that produced
    the desired motion."""
    model = UnetJacobianField(cfg=UnetJacobianFieldCfg(start_filts=8))
    x = jax.random.uniform(jax.random.PRNGKey(1), (1, H, W, 3))
    variables = model.init(jax.random.PRNGKey(0), x, jnp.zeros((1, 2)))
    # desired motion = J(pixels) @ u_true at random tracked pixels
    jac_map = model.apply(variables, x, method=model.compute_jacobian)
    yx = jax.random.randint(jax.random.PRNGKey(2), (20, 2), 2, H - 2)
    flat = jac_map.reshape(1, H * W, 2, 2)[0]
    j = flat[yx[:, 0] * W + yx[:, 1]]  # [N, C, S]
    u_true = jnp.array([0.3, -0.7])
    desired = jnp.einsum("ncs,c->ns", j, u_true)
    u = control_step(model, variables, x, yx, desired, damping=1e-8)
    np.testing.assert_allclose(np.asarray(u), np.asarray(u_true), atol=1e-3)


def test_transformer_jacobian_trains(traj_root):
    """DINO-style 2D model: decoder trains (ViT frozen) and flow loss drops."""
    ds = Dataset2D(Dataset2DCfg(name="pusher", root=traj_root), "train")
    model = TransformerJacobianField(cfg=TransformerJacobianFieldCfg(
        vit=ViTCfg(patch_size=8, dim=32, depth=1, heads=2, pos_grid=4),
        decoder_depth=2))
    batch = collate_2d([ds[i] for i in range(6)])
    cfg = Train2DCfg(lr=3e-3, warm_up_steps=10)
    state = create_train_state_2d(jax.random.PRNGKey(0), model, batch, cfg)
    step = make_train_step_2d(model, cfg, donate=False)
    losses = []
    for _ in range(40):
        state, m = step(state, batch)
        losses.append(float(m["train/loss"]))
    assert np.isfinite(losses).all()
    assert losses[-1] < 0.7 * losses[0]


def test_planar_hand_variant_with_resize(tmp_path):
    """planar_hand dataset: 4-command bounds + resize path (flow magnitudes
    rescale with resolution, planar_hand_dataset.py semantics)."""
    root = tmp_path / "ph"
    make_synthetic_trajectories(root, num_trajs=2, num_steps=4, height=H,
                                width=W, command_dim=4)
    ds = Dataset2D(Dataset2DCfg(name="planar_hand", command_dim=4,
                                root=root, resize_hw=(16, 16)), "train")
    item = ds[0]
    assert item["input_frame_curr"].shape == (16, 16, 3)
    assert item["trgt_flow_curr"].shape == (16, 16, 2)
    assert item["input_command"].shape == (4,)
    # resize halves the flow magnitudes (32 -> 16)
    ds_full = Dataset2D(Dataset2DCfg(name="planar_hand", command_dim=4,
                                     root=root), "train")
    full = ds_full._load(0)["flow"]
    small = ds._load(0)["flow"]
    np.testing.assert_allclose(np.abs(small).max(), np.abs(full).max() / 2,
                               rtol=0.2)
    # trains end to end
    model = UnetJacobianField(cfg=UnetJacobianFieldCfg(command_dim=4, start_filts=8))
    batch = collate_2d([ds[i] for i in range(6)])
    cfg = Train2DCfg(lr=3e-3, warm_up_steps=10)
    state = create_train_state_2d(jax.random.PRNGKey(0), model, batch, cfg)
    step = make_train_step_2d(model, cfg, donate=False)
    l0 = lN = None
    for i in range(30):
        state, m = step(state, batch)
        lN = float(m["train/loss"])
        l0 = l0 if l0 is not None else lN
    assert np.isfinite(lN) and lN < l0


def test_transformer_dino_params_bit_frozen(traj_root):
    """Reference parity: the DINO backbone never enters the optimizer
    (transformer_jacobian.py:55-57). stop_gradient zeroes its grads, and the
    optimizer mask must ALSO exclude it from weight decay — the params must
    be bit-identical after training."""
    import flax.traverse_util as tu

    ds = Dataset2D(Dataset2DCfg(name="pusher", root=traj_root), "train")
    model = TransformerJacobianField(cfg=TransformerJacobianFieldCfg(
        vit=ViTCfg(patch_size=8, dim=32, depth=1, heads=2, pos_grid=4),
        decoder_depth=2))
    batch = collate_2d([ds[i] for i in range(4)])
    cfg = Train2DCfg(lr=3e-3, weight_decay=1e-2, warm_up_steps=2)
    state = create_train_state_2d(jax.random.PRNGKey(0), model, batch, cfg)
    before = tu.flatten_dict(jax.tree.map(np.asarray, state.params))
    step = make_train_step_2d(model, cfg, donate=False)
    for _ in range(5):
        state, _ = step(state, batch)
    after = tu.flatten_dict(jax.tree.map(np.asarray, state.params))
    for k in before:
        path = "/".join(map(str, k))
        if "dino" in path:
            assert np.array_equal(before[k], after[k]), path
    assert any(not np.array_equal(before[k], after[k]) for k in before
               if "decoder" in "/".join(map(str, k)))


def test_planar_hand_synthetic_scene():
    """scene="planar_hand": two bodies, block-structured ground truth — each
    fingertip's flow responds only to its own 2 joints."""
    import tempfile

    with tempfile.TemporaryDirectory() as d:
        root = make_synthetic_trajectories(
            d, num_trajs=2, num_steps=6, height=48, width=48,
            scene="planar_hand")
        ds = Dataset2D(Dataset2DCfg(name="planar_hand", command_dim=4,
                                    root=root), "train")
        item = ds[0]
        assert item["input_command"].shape == (4,)
        # both halves of the image contain a body at some step, and flow is
        # nonzero somewhere on each side across the dataset
        left = right = False
        for i in range(len(ds)):
            f = ds[i]["trgt_flow_curr"]
            left = left or np.abs(f[:, :24]).max() > 0
            right = right or np.abs(f[:, 24:]).max() > 0
        assert left and right


def test_make_synthetic_command_dim_1(tmp_path):
    """Regression: the pusher scene must keep supporting command_dim=1
    (y reuses q[0]); render_square once indexed q2[1] unconditionally."""
    root = make_synthetic_trajectories(tmp_path / "d1", num_trajs=1,
                                       num_steps=3, height=24, width=24,
                                       command_dim=1)
    ds = Dataset2D(Dataset2DCfg(root=root, command_dim=1), stage="train")
    item = ds[0]
    assert item["input_command"].shape == (1,)
    assert np.isfinite(item["trgt_flow_curr"]).all()
