"""Turnkey weight-ingestion CLI (VERDICT r4 item 8): prove the ONE documented
command — weight file -> ported params -> parity report -> quality eval —
end to end against fabricated checkpoints, so the path is turnkey before any
real weight file exists. Real-file numeric parity auto-upgrades via
tests/test_pretrained_ports.py the day fixtures are dropped.

Reference counterparts: raft_wrapper/raft.py:81 (pretrained RAFT),
transformer_jacobian.py:54 (hub DINOv2), train.py:55-58 (Lightning ckpt
warm start)."""

import json
import os
import subprocess
import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
CLI = os.path.join(REPO, "tools", "ingest_weights.py")


def _run_cli(*args):
    env = dict(os.environ)
    env.setdefault("JAX_PLATFORMS", "cpu")
    # 1800s: the raft --eval smoke cold-compiles the full RAFT forward on
    # CPU (~7 min alone, longer when the 1-core box is shared); warm-cache
    # runs take <1 min.
    p = subprocess.run([sys.executable, CLI, *args], capture_output=True,
                       text=True, timeout=1800, env=env, cwd=REPO)
    assert p.returncode == 0, f"stdout:\n{p.stdout}\nstderr:\n{p.stderr[-3000:]}"
    # the report is the last JSON line on stdout
    lines = [l for l in p.stdout.splitlines() if l.startswith("{")]
    assert lines, f"no report line in stdout:\n{p.stdout}"
    return json.loads(lines[-1])


def _load_tree(path):
    from flax import serialization

    return serialization.msgpack_restore(open(path, "rb").read())


def test_ingest_raft_fabricated(tmp_path):
    from tests.test_pretrained_ports import fabricate_raft_state_dict

    sd = fabricate_raft_state_dict()
    ckpt = tmp_path / "raft-things.pth"
    torch.save({k: torch.from_numpy(np.asarray(v).copy()) for k, v in sd.items()},
               ckpt)
    out = tmp_path / "raft.msgpack"
    report = _run_cli(str(ckpt), "--out", str(out), "--eval",
                      "--raft-iters", "2")
    assert report["kind"] == "raft"
    assert report["unused"] == 0
    assert report["overwritten"] == report["total_leaves"]
    assert report["eval"]["finite"]
    tree = _load_tree(out)
    assert "params" in tree


def test_ingest_dinov2_fabricated(tmp_path):
    from tests.test_pretrained_ports import fabricate_dinov2_state_dict

    sd = fabricate_dinov2_state_dict()
    ckpt = tmp_path / "dinov2_vits14.pth"
    torch.save({k: torch.from_numpy(np.asarray(v).copy()) for k, v in sd.items()},
               ckpt)
    out = tmp_path / "dinov2.msgpack"
    report = _run_cli(str(ckpt), "--out", str(out), "--eval")
    assert report["kind"] == "dinov2"
    assert report["unused"] == 0
    assert report["overwritten"] == report["total_leaves"]
    assert report["eval"]["finite"]


def test_ingest_reference_fabricated(tmp_path):
    """Fabricate a reference Lightning checkpoint shaped exactly like the
    CLI's template (exact-mode jacobian_mlp, batch norm, concat layout) and
    assert the CLI ports every encoder/decoder/proposal tensor."""
    import jax
    jax.config.update("jax_platforms", "cpu")
    import flax.traverse_util as tu

    from neural_jacobian_field_tpu.models.encoder_resnet import EncoderResnetCfg
    from neural_jacobian_field_tpu.models.model import (
        Model, RenderingCfg, make_model_cfg)
    from neural_jacobian_field_tpu.training import TrainCfg, create_train_state
    from tests.test_port import fabricate_state_dict

    sys.path.insert(0, REPO)
    import bench

    model = Model(cfg=make_model_cfg(
        "jacobian_mlp", action_dim=8,
        rendering=RenderingCfg(pixel_feature_mode="exact"),
        encoder=EncoderResnetCfg(norm_type="batch", feature_layout="concat"),
    ))
    raw = bench._raw_batch(jax.random.PRNGKey(0), batch=1, hw=(64, 64))
    state = create_train_state(jax.random.PRNGKey(0), model, raw,
                               TrainCfg(mode="perception", rays_per_batch=32))
    params_flat = {k: np.asarray(v) for k, v in
                   tu.flatten_dict(state.params, sep="/").items()}
    stats_flat = {k: np.asarray(v) for k, v in
                  tu.flatten_dict(state.batch_stats, sep="/").items()}
    rng = np.random.default_rng(5)
    randomized = {k: (0.05 * rng.normal(size=v.shape)).astype(np.float32)
                  for k, v in params_flat.items()}
    sd = fabricate_state_dict(randomized, stats_flat)
    ckpt = tmp_path / "epoch=99.ckpt"
    torch.save({"state_dict": {k: torch.from_numpy(np.asarray(v).copy())
                               for k, v in sd.items()}}, ckpt)

    out = tmp_path / "ref.msgpack"
    report = _run_cli(str(ckpt), "--out", str(out))
    assert report["kind"] == "reference"
    assert report["unused"] == 0, report.get("unused_keys")
    # every fabricated tensor landed (embedding tables + kernels + biases)
    assert report["consumed"] == len(randomized)
    tree = _load_tree(out)
    got = tu.flatten_dict(tree["params"], sep="/")
    changed = sum(not np.allclose(np.asarray(got[k]), params_flat[k])
                  for k in params_flat)
    assert changed > len(params_flat) * 0.9
    assert "batch_stats" in tree
