"""Config-system tests: YAML group resolution, dotted overrides, typed
conversion with name-discriminated unions (config/tools.py:16-56 +
train CLI surface README.md:124-133)."""

from pathlib import Path

import pytest

from neural_jacobian_field_tpu.config import (
    get_typed_root_config,
    load_config,
)
from neural_jacobian_field_tpu.models.decoders import (
    ActionDecoderJacobianMlpCfg,
    ActionDecoderJacobianTransformerCfg,
)

CONFIG_DIR = Path(__file__).parent.parent / "configurations"


def test_default_config_resolves():
    cfg = get_typed_root_config(load_config(CONFIG_DIR, []))
    assert cfg.dataset.name == "allegro"
    assert cfg.dataset.mode == "perception"
    assert cfg.model.action_dim == 8
    assert isinstance(cfg.model.action_decoder, ActionDecoderJacobianMlpCfg)
    assert cfg.model.rendering.num_proposal_samples == (256,)
    assert cfg.model.encoder.norm_type == "batch"
    assert cfg.training.data.rays_per_batch == 256
    assert cfg.training.optim.lr == pytest.approx(1e-4)
    assert cfg.checkpoint.every_n_train_steps == 5000


def test_group_override_switches_decoder_union():
    cfg = get_typed_root_config(
        load_config(CONFIG_DIR, ["model=model_allegro_transformer"])
    )
    assert isinstance(cfg.model.action_decoder, ActionDecoderJacobianTransformerCfg)
    assert cfg.model.action_decoder.transformer.attn_depth == 3


def test_dotted_overrides():
    cfg = get_typed_root_config(load_config(CONFIG_DIR, [
        "dataset.mode=action",
        "dataset.root=/tmp/somewhere",
        "training.optim.lr=3e-4",
        "checkpoint.load=checkpoints/perception",
        "model.rendering.num_nerf_samples=64",
        "dataset.action_supervision_type=tracks",
        "training.optim.grad_clip_norm=1.0",
        "training.optim.encoder_lr_scale=0.5",
    ]))
    assert cfg.dataset.mode == "action"
    assert str(cfg.dataset.root) == "/tmp/somewhere"
    assert cfg.training.optim.lr == pytest.approx(3e-4)
    assert cfg.checkpoint.load == "checkpoints/perception"
    assert cfg.model.rendering.num_nerf_samples == 64
    assert cfg.dataset.action_supervision_type == "tracks"
    # r5 stabilizer knobs reach TrainCfg through the CLI (train.py:59-67)
    assert cfg.training.optim.grad_clip_norm == pytest.approx(1.0)
    assert cfg.training.optim.encoder_lr_scale == pytest.approx(0.5)


def test_toy_arm_groups():
    cfg = get_typed_root_config(load_config(CONFIG_DIR, [
        "dataset=dataset_toy_arm", "model=model_toy_arm",
    ]))
    assert cfg.dataset.name == "toy_arm"
    assert cfg.model.action_dim == 6
    assert cfg.dataset.num_total_joints == 6


def test_unknown_key_rejected():
    with pytest.raises(KeyError):
        get_typed_root_config(load_config(CONFIG_DIR, ["dataset.nonexistent=1"]))
