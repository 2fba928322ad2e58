"""Turnkey pretrained-weight ingestion: ONE command from a torch weight file
to ported Flax params + a machine-readable parity report + a quality eval.

    python tools/ingest_weights.py <checkpoint.pth> [--kind auto] \
        [--out /path/ported.msgpack] [--eval] [--action-dim 8] \
        [--decoder jacobian_mlp]

Kinds (auto-detected from the state_dict key signature):
  raft       princeton-vl raft-things.pth or torchvision Raft_Large_Weights
             re-saved as a plain state_dict
             (reference raft_wrapper/raft.py:77-94)
  dinov2     torch.hub dinov2_vits14 state_dict
             (reference jacobian/models/jacobian_models/transformer_jacobian.py:54)
  reference  a reference-repo Lightning checkpoint ("model."-prefixed keys
             from neural_jacobian_field/models/model.py; reference
             train.py:55-58 warm-start surface)

Output: a flax-serialization msgpack at --out (default: <ckpt>.flax.msgpack)
holding {"params": ..., "batch_stats": ...}, plus one JSON parity-report
line on stdout:

  {"kind", "consumed", "unused", "overwritten", "total_leaves",
   "skipped" (reference kind), "eval": {...}}

The report is the structural half of parity (every checkpoint tensor
consumed, every Flax leaf overwritten); the numeric half auto-upgrades via
tests/test_pretrained_ports.py when reference-output fixtures are dropped
next to the checkpoint. --eval runs the kind's quality smoke:
  raft       flow on a deterministic 3-px-shift pair -> median flow vector
  dinov2     patch-token stats on a deterministic image
  reference  a 64x64 eval-mode render -> finite + rgb range sanity

Exercised in CI against fabricated checkpoints (tests/test_ingest_cli.py),
so the path is proven end to end before any real file exists.
"""

import argparse
import json
import sys
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


def load_state_dict(path: str) -> dict:
    import torch

    try:
        obj = torch.load(path, map_location="cpu", weights_only=True)
    except Exception:
        obj = torch.load(path, map_location="cpu", weights_only=False)
    sd = obj.get("state_dict", obj) if isinstance(obj, dict) else obj
    return {k: (v.numpy() if hasattr(v, "numpy") else np.asarray(v))
            for k, v in sd.items()}


def detect_kind(sd: dict) -> str:
    keys = set(sd)
    if any(k.startswith(("update_block.", "module.update_block.")) for k in keys):
        return "raft"
    if "patch_embed.proj.weight" in keys and "cls_token" in keys:
        return "dinov2"
    if any(k.startswith(("model.encoder.", "encoder.model.")) for k in keys):
        return "reference"
    raise SystemExit(
        "cannot auto-detect checkpoint kind from its keys; pass --kind "
        "(saw e.g. " + ", ".join(sorted(keys)[:5]) + ")")


def _count_overwritten(init_params, ported_params):
    import flax.traverse_util as tu
    import jax

    a = tu.flatten_dict(jax.tree.map(np.asarray, init_params), sep="/")
    b = tu.flatten_dict(jax.tree.map(np.asarray, ported_params), sep="/")
    over = sum(1 for k in a if not np.array_equal(a[k], b[k]))
    return over, len(a)


def _fixture_pair(h=96, w=128):
    """Same deterministic pair as tests/test_pretrained_ports.py."""
    import jax.numpy as jnp

    rng = np.random.default_rng(7)
    base = rng.uniform(0, 1, (h + 8, w + 8, 3)).astype(np.float32)
    return (jnp.asarray(base[4:4 + h, 4:4 + w])[None],
            jnp.asarray(base[4:4 + h, 7:7 + w])[None])


def ingest_raft(sd, run_eval, num_iters=12):
    import jax
    from neural_jacobian_field_tpu.flow import RAFT
    from neural_jacobian_field_tpu.flow.raft import load_torch_raft_state_dict

    raft = RAFT(num_iters=num_iters)
    a, b = _fixture_pair()
    variables = raft.init(jax.random.PRNGKey(0), a, b)
    unused = []
    params = load_torch_raft_state_dict(variables["params"], sd,
                                        unused_out=unused)
    over, total = _count_overwritten(variables["params"], params)
    report = {"consumed": len(sd) - len(unused), "unused": len(unused),
              "overwritten": over, "total_leaves": total}
    if unused:
        report["unused_keys"] = unused[:10]
    if run_eval:
        flow = np.asarray(raft.apply({"params": params}, a, b))
        med = np.median(flow.reshape(-1, 2), axis=0)
        report["eval"] = {"finite": bool(np.isfinite(flow).all()),
                          "median_flow_px": [round(float(m), 3) for m in med],
                          "expected_if_pretrained": [3.0, 0.0]}
    return {"params": params}, report


def ingest_dinov2(sd, run_eval):
    import jax
    from neural_jacobian_field_tpu.jacobian2d.vit import (
        ViTS14, load_torch_dinov2_state_dict,
    )

    vit = ViTS14()
    img, _ = _fixture_pair(h=14 * 4, w=14 * 4)
    variables = vit.init(jax.random.PRNGKey(0), img)
    unused = []
    params = load_torch_dinov2_state_dict(variables["params"], sd,
                                          unused_out=unused)
    over, total = _count_overwritten(variables["params"], params)
    report = {"consumed": len(sd) - len(unused), "unused": len(unused),
              "overwritten": over, "total_leaves": total}
    if unused:
        report["unused_keys"] = unused[:10]
    if run_eval:
        feats = np.asarray(vit.apply({"params": params}, img))
        report["eval"] = {"finite": bool(np.isfinite(feats).all()),
                          "tokens": list(feats.shape),
                          "feat_std": round(float(feats.std()), 4)}
    return {"params": params}, report


def ingest_reference(sd, run_eval, action_dim, decoder):
    import flax.traverse_util as tu
    import jax
    import jax.numpy as jnp
    from neural_jacobian_field_tpu.models.model import (
        Model, RenderingCfg, make_model_cfg)
    from neural_jacobian_field_tpu.models.encoder_resnet import EncoderResnetCfg
    from neural_jacobian_field_tpu.training import (
        TrainCfg, create_train_state)
    from neural_jacobian_field_tpu.utils.port_torch import (
        port_reference_checkpoint)

    # exact-mode bit-path template (pixel_aligned_features.py:11-35): the
    # numerics the reference checkpoint was trained under
    model = Model(cfg=make_model_cfg(
        decoder, action_dim=action_dim,
        rendering=RenderingCfg(pixel_feature_mode="exact"),
        encoder=EncoderResnetCfg(norm_type="batch", feature_layout="concat"),
    ))
    # template init needs a dummy batch; import the bench builder (it has no
    # side effects beyond constructing arrays)
    sys.path.insert(0, str(REPO))
    import bench

    raw = bench._raw_batch(jax.random.PRNGKey(0), batch=1, hw=(64, 64))
    state = create_train_state(
        jax.random.PRNGKey(0), model, raw,
        TrainCfg(mode="perception", rays_per_batch=32))

    params_flat, stats_flat = port_reference_checkpoint(sd)
    tmpl_p = dict(tu.flatten_dict(
        jax.tree.map(np.asarray, state.params), sep="/"))
    matched, skipped = 0, []
    for k, v in params_flat.items():
        if k in tmpl_p and tmpl_p[k].shape == v.shape:
            tmpl_p[k] = v.astype(np.float32)
            matched += 1
        else:
            skipped.append(k)
    params = tu.unflatten_dict(tmpl_p, sep="/")
    stats = None
    if state.batch_stats is not None:
        tmpl_s = dict(tu.flatten_dict(
            jax.tree.map(np.asarray, state.batch_stats), sep="/"))
        for k, v in stats_flat.items():
            if k in tmpl_s and tmpl_s[k].shape == v.shape:
                tmpl_s[k] = v.astype(np.float32)
        stats = tu.unflatten_dict(tmpl_s, sep="/")
    report = {"consumed": matched, "unused": len(skipped),
              "overwritten": matched, "total_leaves": len(tmpl_p)}
    if skipped:
        report["unused_keys"] = skipped[:10]
    if run_eval:
        from neural_jacobian_field_tpu.inference import render_camera
        from neural_jacobian_field_tpu.training import prepare_training_batch

        variables = {"params": params}
        if stats is not None:
            variables["batch_stats"] = stats
        mi, _ = prepare_training_batch(jax.random.PRNGKey(1), raw, 32)
        out = render_camera(model, variables, mi.camera_input,
                            mi.robot_input, z_near=0.5, z_far=10.0,
                            height=64, width=64, patch_size=1024,
                            key=jax.random.PRNGKey(2))
        rgb = np.asarray(out.rgb)
        report["eval"] = {"finite": bool(np.isfinite(rgb).all()),
                          "rgb_range": [round(float(rgb.min()), 4),
                                        round(float(rgb.max()), 4)]}
    out_tree = {"params": params}
    if stats is not None:
        out_tree["batch_stats"] = stats
    return out_tree, report


def main():
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("checkpoint")
    ap.add_argument("--kind", default="auto",
                    choices=("auto", "raft", "dinov2", "reference"))
    ap.add_argument("--out", default=None,
                    help="output msgpack path (default <ckpt>.flax.msgpack)")
    ap.add_argument("--eval", action="store_true",
                    help="run the kind's quality smoke eval")
    ap.add_argument("--action-dim", type=int, default=8)
    ap.add_argument("--decoder", default="jacobian_mlp")
    ap.add_argument("--raft-iters", type=int, default=12,
                    help="GRU iterations for the raft --eval smoke")
    args = ap.parse_args()

    import jax

    jax.config.update("jax_compilation_cache_dir",
                      str(Path.home() / ".cache" / "njf_jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    sd = load_state_dict(args.checkpoint)
    kind = detect_kind(sd) if args.kind == "auto" else args.kind

    if kind == "raft":
        tree, report = ingest_raft(sd, args.eval, num_iters=args.raft_iters)
    elif kind == "dinov2":
        tree, report = ingest_dinov2(sd, args.eval)
    else:
        tree, report = ingest_reference(sd, args.eval, args.action_dim,
                                        args.decoder)

    out = args.out or (args.checkpoint + ".flax.msgpack")
    from flax import serialization

    Path(out).write_bytes(serialization.to_bytes(tree))
    report = {"kind": kind, "out": out, **report}
    print(json.dumps(report))
    return 0


if __name__ == "__main__":
    sys.exit(main())
