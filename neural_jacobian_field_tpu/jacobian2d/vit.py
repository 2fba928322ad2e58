"""ViT-S/14 feature extractor (DINOv2 architecture, Flax).

Replaces the reference's `torch.hub.load("facebookresearch/dinov2",
"dinov2_vits14")` (jacobian/models/jacobian_models/transformer_jacobian.py:54)
with a native Flax ViT: patch embed (14x14 conv), cls token, learned pos
embeddings (bilinearly interpolated to the input grid), 12 pre-norm blocks
(dim 384, 6 heads, mlp x4, LayerScale), final norm. `get_intermediate_layers`
semantics: returns patch tokens (cls dropped).

Weights: `load_torch_dinov2_state_dict` ports an offline torch checkpoint
(torch.hub cache file) into the Flax params; with no checkpoint the model is
a randomly-initialized trainable ViT (documented fallback — zero-egress
environments can't pull hub weights).
"""

from dataclasses import dataclass
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn


@dataclass(frozen=True)
class ViTCfg:
    patch_size: int = 14
    dim: int = 384
    depth: int = 12
    heads: int = 6
    mlp_ratio: float = 4.0
    pos_grid: int = 37  # DINOv2 518/14 training grid
    layerscale_init: float = 1e-5


class _Block(nn.Module):
    cfg: ViTCfg
    compute_dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x):
        cfg, dt = self.cfg, self.compute_dtype
        h = nn.LayerNorm(dtype=dt, name="norm1")(x)
        head_dim = cfg.dim // cfg.heads
        qkv = nn.Dense(cfg.dim * 3, dtype=dt, name="qkv")(h)
        q, k, v = jnp.split(qkv, 3, axis=-1)

        def heads(t):
            return t.reshape(*t.shape[:-1], cfg.heads, head_dim).swapaxes(-3, -2)

        q, k, v = map(heads, (q, k, v))
        logits = jnp.einsum("...hqd,...hkd->...hqk", q, k) * head_dim**-0.5
        if dt is not None:  # f32 softmax under bf16; identity in f32/f64
            logits = logits.astype(jnp.float32)
        attn = jax.nn.softmax(logits, axis=-1).astype(q.dtype)
        o = jnp.einsum("...hqk,...hkd->...hqd", attn, v)
        o = o.swapaxes(-3, -2).reshape(*x.shape[:-1], cfg.dim)
        o = nn.Dense(cfg.dim, dtype=dt, name="attn_proj")(o)
        ls1 = self.param("ls1", nn.initializers.constant(cfg.layerscale_init), (cfg.dim,))
        x = x + o * ls1

        h = nn.LayerNorm(dtype=dt, name="norm2")(x)
        h = nn.Dense(int(cfg.dim * cfg.mlp_ratio), dtype=dt, name="mlp_fc1")(h)
        # exact erf GELU: torch nn.GELU() default (DINOv2 Mlp); flax's
        # approximate=True tanh form diverges ~1e-3 — a real-weight parity gap
        h = nn.gelu(h, approximate=False)
        h = nn.Dense(cfg.dim, dtype=dt, name="mlp_fc2")(h)
        ls2 = self.param("ls2", nn.initializers.constant(cfg.layerscale_init), (cfg.dim,))
        return x + h * ls2


class ViTS14(nn.Module):
    """__call__([B, H, W, 3]) -> patch tokens [B, H/14 * W/14, 384]."""

    cfg: ViTCfg = ViTCfg()
    compute_dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        cfg, dt = self.cfg, self.compute_dtype
        b, h, w, _ = x.shape
        gh, gw = h // cfg.patch_size, w // cfg.patch_size
        x = nn.Conv(cfg.dim, (cfg.patch_size, cfg.patch_size),
                    strides=(cfg.patch_size, cfg.patch_size), dtype=dt,
                    name="patch_embed")(x)
        x = x.reshape(b, gh * gw, cfg.dim)

        cls = self.param("cls_token", nn.initializers.normal(0.02), (1, 1, cfg.dim))
        pos = self.param("pos_embed", nn.initializers.normal(0.02),
                         (1, cfg.pos_grid * cfg.pos_grid + 1, cfg.dim))
        # interpolate patch pos-embeddings to the input grid
        patch_pos = pos[:, 1:].reshape(1, cfg.pos_grid, cfg.pos_grid, cfg.dim)
        patch_pos = jax.image.resize(patch_pos, (1, gh, gw, cfg.dim), "linear")
        x = x + patch_pos.reshape(1, gh * gw, cfg.dim)
        cls_tok = jnp.broadcast_to(cls + pos[:, :1], (b, 1, cfg.dim)).astype(x.dtype)
        x = jnp.concatenate([cls_tok, x], axis=1)

        for i in range(cfg.depth):
            x = _Block(cfg=cfg, compute_dtype=dt, name=f"block_{i}")(x)
        x = nn.LayerNorm(dtype=dt, name="norm")(x)
        out = x[:, 1:]  # drop cls (get_intermediate_layers)
        # f32 pin only under a reduced compute dtype (no f64-golden downcast)
        return out.astype(jnp.float32) if dt is not None else out


def load_torch_dinov2_state_dict(params, state_dict, unused_out: list = None) -> dict:
    """Port a torch DINOv2 ViT-S/14 state_dict (e.g. from the torch.hub
    cache) into ViTS14 Flax params. Returns new params dict.

    Leftover checkpoint tensors (beyond `mask_token`, which
    get_intermediate_layers never uses) are appended to `unused_out` if
    given, else printed — the structural-completeness check for the port.
    """
    import flax.traverse_util as tu

    flat = dict(tu.flatten_dict(params, sep="/"))
    used = {"mask_token"}

    def t(name):
        used.add(name)
        return np.asarray(state_dict[name])

    out = dict(flat)
    out["patch_embed/kernel"] = t("patch_embed.proj.weight").transpose(2, 3, 1, 0)
    out["patch_embed/bias"] = t("patch_embed.proj.bias")
    out["cls_token"] = t("cls_token")
    out["pos_embed"] = t("pos_embed")
    out["norm/scale"] = t("norm.weight")
    out["norm/bias"] = t("norm.bias")
    depth = len([k for k in state_dict if k.endswith("ls1.gamma")]) or 12
    for i in range(depth):
        p, q = f"block_{i}", f"blocks.{i}"
        out[f"{p}/norm1/scale"] = t(f"{q}.norm1.weight")
        out[f"{p}/norm1/bias"] = t(f"{q}.norm1.bias")
        out[f"{p}/qkv/kernel"] = t(f"{q}.attn.qkv.weight").T
        out[f"{p}/qkv/bias"] = t(f"{q}.attn.qkv.bias")
        out[f"{p}/attn_proj/kernel"] = t(f"{q}.attn.proj.weight").T
        out[f"{p}/attn_proj/bias"] = t(f"{q}.attn.proj.bias")
        out[f"{p}/ls1"] = t(f"{q}.ls1.gamma")
        out[f"{p}/norm2/scale"] = t(f"{q}.norm2.weight")
        out[f"{p}/norm2/bias"] = t(f"{q}.norm2.bias")
        out[f"{p}/mlp_fc1/kernel"] = t(f"{q}.mlp.fc1.weight").T
        out[f"{p}/mlp_fc1/bias"] = t(f"{q}.mlp.fc1.bias")
        out[f"{p}/mlp_fc2/kernel"] = t(f"{q}.mlp.fc2.weight").T
        out[f"{p}/mlp_fc2/bias"] = t(f"{q}.mlp.fc2.bias")
        out[f"{p}/ls2"] = t(f"{q}.ls2.gamma")
    leftovers = sorted(k for k in state_dict if k not in used)
    if unused_out is not None:
        unused_out.extend(leftovers)
    elif leftovers:
        print(f"load_torch_dinov2_state_dict: {len(leftovers)} unported "
              f"checkpoint tensors: {leftovers[:8]}"
              f"{'...' if len(leftovers) > 8 else ''}")
    return tu.unflatten_dict(out, sep="/")
