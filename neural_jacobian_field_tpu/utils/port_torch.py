"""Port reference PyTorch checkpoints into this framework's Flax params.

The fidelity-matching tool (SURVEY.md §7 milestone 4): given a reference
Lightning checkpoint (`state_dict` with `model.`-prefixed keys from
neural_jacobian_field/models/model.py), produce the matching Flax param tree
for our Model — PSNR/Jacobian-error parity can then be measured directly.

Name maps (torch -> flax):
  encoder.model.conv1/bn1/layerL.B.*       -> encoder/conv1, bn1, layerL_blockB/*
  decoder.<head>.lin_in|lin_z.N|blocks.N.fc_0|fc_1|lin_out
                                           -> decoder/<head>/lin_in, lin_z_N,
                                              blocks_N_fc_0, blocks_N_fc_1, lin_out
  decoder.color_head.{0,2,4}               -> decoder/color_head/fc{1,2,3}
  decoder.jacobian_index_embedding         -> decoder/jacobian_index_embedding
  decoder.jacobian_query_mlp               -> decoder/jacobian_query_mlp
  decoder.jacobian_attn_decoder.layers.N.{0,1}.{norm,fn.*}
                                           -> decoder/jacobian_attn_decoder/layers_N_*
  proposal_networks.N.density_head.*       -> proposal_networks_N/density_head/*

Layout conversions: torch Linear [out,in] -> flax [in,out] (transpose);
torch Conv [out,in,kh,kw] -> flax [kh,kw,in,out]; BatchNorm running stats go
to the batch_stats collection.
"""

from typing import Dict, Tuple

import numpy as np


def _lin(sd, src, dst, out):
    out[f"{dst}/kernel"] = np.asarray(sd[f"{src}.weight"]).T
    if f"{src}.bias" in sd:
        out[f"{dst}/bias"] = np.asarray(sd[f"{src}.bias"])


def _conv(sd, src, dst, out):
    out[f"{dst}/kernel"] = np.asarray(sd[f"{src}.weight"]).transpose(2, 3, 1, 0)
    if f"{src}.bias" in sd:
        out[f"{dst}/bias"] = np.asarray(sd[f"{src}.bias"])


def _norm(sd, src, dst, params, stats):
    if f"{src}.weight" in sd:
        params[f"{dst}/scale"] = np.asarray(sd[f"{src}.weight"])
        params[f"{dst}/bias"] = np.asarray(sd[f"{src}.bias"])
    if f"{src}.running_mean" in sd:
        stats[f"{dst}/mean"] = np.asarray(sd[f"{src}.running_mean"])
        stats[f"{dst}/var"] = np.asarray(sd[f"{src}.running_var"])


def _resnet_fc(sd, src, dst, out):
    """model_components/resnet_fc.py:97-123 -> models/resnet_fc.py."""
    _lin(sd, f"{src}.lin_in", f"{dst}/lin_in", out)
    _lin(sd, f"{src}.lin_out", f"{dst}/lin_out", out)
    n = 0
    while f"{src}.blocks.{n}.fc_0.weight" in sd:
        _lin(sd, f"{src}.blocks.{n}.fc_0", f"{dst}/blocks_{n}_fc_0", out)
        _lin(sd, f"{src}.blocks.{n}.fc_1", f"{dst}/blocks_{n}_fc_1", out)
        n += 1
    n = 0
    while f"{src}.lin_z.{n}.weight" in sd:
        _lin(sd, f"{src}.lin_z.{n}", f"{dst}/lin_z_{n}", out)
        n += 1


def _encoder(sd, src, dst, params, stats):
    """models/encoder/encoder_resnet.py (torchvision resnet34 layout)."""
    _conv(sd, f"{src}.conv1", f"{dst}/conv1", params)
    _norm(sd, f"{src}.bn1", f"{dst}/bn1", params, stats)
    for layer_idx, num_blocks in ((1, 3), (2, 4), (3, 6), (4, 3)):
        for b in range(num_blocks):
            base = f"{src}.layer{layer_idx}.{b}"
            if f"{base}.conv1.weight" not in sd:
                continue
            d = f"{dst}/layer{layer_idx}_block{b}"
            _conv(sd, f"{base}.conv1", f"{d}/conv1", params)
            _conv(sd, f"{base}.conv2", f"{d}/conv2", params)
            _norm(sd, f"{base}.bn1", f"{d}/bn1", params, stats)
            _norm(sd, f"{base}.bn2", f"{d}/bn2", params, stats)
            if f"{base}.downsample.0.weight" in sd:
                _conv(sd, f"{base}.downsample.0", f"{d}/downsample_conv", params)
                _norm(sd, f"{base}.downsample.1", f"{d}/downsample_norm",
                      params, stats)


def _transformer(sd, src, dst, out):
    """model_components/transformer.py:87-135 (PreNorm-wrapped layers)."""
    i = 0
    while f"{src}.layers.{i}.0.norm.weight" in sd:
        # attention: layers.i.0 = PreNorm(Attention), layers.i.1 = PreNorm(FF)
        out[f"{dst}/layers_{i}_attn_norm/scale"] = np.asarray(
            sd[f"{src}.layers.{i}.0.norm.weight"])
        out[f"{dst}/layers_{i}_attn_norm/bias"] = np.asarray(
            sd[f"{src}.layers.{i}.0.norm.bias"])
        attn = f"{src}.layers.{i}.0.fn"
        if f"{attn}.to_qkv.weight" in sd:
            _lin(sd, f"{attn}.to_qkv", f"{dst}/layers_{i}_attn/to_qkv", out)
        else:
            _lin(sd, f"{attn}.to_q", f"{dst}/layers_{i}_attn/to_q", out)
            _lin(sd, f"{attn}.to_kv", f"{dst}/layers_{i}_attn/to_kv", out)
        if f"{attn}.to_out.0.weight" in sd:
            _lin(sd, f"{attn}.to_out.0", f"{dst}/layers_{i}_attn/to_out", out)
        out[f"{dst}/layers_{i}_ff_norm/scale"] = np.asarray(
            sd[f"{src}.layers.{i}.1.norm.weight"])
        out[f"{dst}/layers_{i}_ff_norm/bias"] = np.asarray(
            sd[f"{src}.layers.{i}.1.norm.bias"])
        ff = f"{src}.layers.{i}.1.fn.net"
        _lin(sd, f"{ff}.0", f"{dst}/layers_{i}_ff/fc1", out)
        _lin(sd, f"{ff}.3", f"{dst}/layers_{i}_ff/fc2", out)
        i += 1


def port_reference_checkpoint(state_dict: Dict[str, "np.ndarray"],
                              strip_prefix: str = "model.") -> Tuple[dict, dict]:
    """torch state_dict -> (params, batch_stats) flat dicts with '/'-joined
    keys. Convert to a flax tree with flax.traverse_util.unflatten_dict(...,
    sep='/')."""
    sd = {
        (k[len(strip_prefix):] if k.startswith(strip_prefix) else k):
            np.asarray(v) for k, v in state_dict.items()
    }
    params: dict = {}
    stats: dict = {}

    _encoder(sd, "encoder.model", "encoder", params, stats)

    # proposal networks
    n = 0
    while any(k.startswith(f"proposal_networks.{n}.") for k in sd):
        _resnet_fc(sd, f"proposal_networks.{n}.density_head",
                   f"proposal_networks_{n}/density_head", params)
        n += 1

    # decoder heads
    _resnet_fc(sd, "decoder.density_head", "decoder/density_head", params)
    for head in ("jacobian_head", "jacobian_head_arm", "flow_head", "flow_head_arm"):
        if f"decoder.{head}.lin_in.weight" in sd:
            _resnet_fc(sd, f"decoder.{head}", f"decoder/{head}", params)
    if "decoder.jacobian_head.weight" in sd:  # transformer variant: plain Linear
        _lin(sd, "decoder.jacobian_head", "decoder/jacobian_head", params)
    if "decoder.jacobian_index_embedding" in sd:
        params["decoder/jacobian_index_embedding"] = np.asarray(
            sd["decoder.jacobian_index_embedding"])
        _lin(sd, "decoder.jacobian_query_mlp", "decoder/jacobian_query_mlp", params)
        _transformer(sd, "decoder.jacobian_attn_decoder",
                     "decoder/jacobian_attn_decoder", params)
    # color head: Sequential(Linear, ReLU, Linear, ReLU, Linear, Sigmoid)
    for torch_idx, flax_name in ((0, "fc1"), (2, "fc2"), (4, "fc3")):
        if f"decoder.color_head.{torch_idx}.weight" in sd:
            _lin(sd, f"decoder.color_head.{torch_idx}",
                 f"decoder/color_head/{flax_name}", params)
    return params, stats


def load_reference_checkpoint(path, template_params, template_stats=None):
    """Load a torch .ckpt/.pt file and merge into template trees
    (shape-tolerant, model_wrapper.py:553-573 semantics)."""
    import flax.traverse_util as tu
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    sd = ckpt.get("state_dict", ckpt)
    sd = {k: v.numpy() for k, v in sd.items() if hasattr(v, "numpy")}
    params_flat, stats_flat = port_reference_checkpoint(sd)

    out_p = dict(tu.flatten_dict(template_params, sep="/"))
    matched, skipped = 0, []
    for k, v in params_flat.items():
        if k in out_p and out_p[k].shape == v.shape:
            out_p[k] = v.astype(np.float32)
            matched += 1
        else:
            skipped.append(k)
    params = tu.unflatten_dict(out_p, sep="/")
    stats = template_stats
    if template_stats is not None:
        out_s = dict(tu.flatten_dict(template_stats, sep="/"))
        for k, v in stats_flat.items():
            if k in out_s and out_s[k].shape == v.shape:
                out_s[k] = v.astype(np.float32)
        stats = tu.unflatten_dict(out_s, sep="/")
    print(f"ported {matched} tensors; skipped {len(skipped)}")
    if skipped:
        print("  e.g.", skipped[:5])
    return params, stats
