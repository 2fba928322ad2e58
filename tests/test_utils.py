"""Utility tests: sanity metrics, metrics logger JSONL stream, device
prefetcher ordering/liveness (utils/logging.py, parallel/mesh.py)."""

import json

import jax
import jax.numpy as jnp
import numpy as np

from neural_jacobian_field_tpu.parallel import DevicePrefetcher, make_mesh
from neural_jacobian_field_tpu.utils import MetricsLogger, get_sanity_metrics, psnr


def test_get_sanity_metrics():
    tree = {
        "a": jnp.array([1.0, 2.0, -3.0]),
        "nested": {"b": jnp.zeros((2, 2))},
        "ints": jnp.array([1, 2]),  # skipped (not float)
        "none": None,
    }
    m = get_sanity_metrics(tree)
    keys = set(m)
    assert any(k.endswith("a_min") for k in keys)
    assert any(k.endswith("a_max") for k in keys)
    assert any("b_min" in k for k in keys)
    assert not any("ints" in k for k in keys)
    a_min = next(v for k, v in m.items() if k.endswith("a_min"))
    assert a_min == -3.0


def test_metrics_logger_jsonl(tmp_path):
    logger = MetricsLogger(log_dir=tmp_path, print_every=10**9)
    logger.log(1, {"loss/total": 0.5})
    logger.log(2, {"loss/total": jnp.asarray(0.25)})
    logger.close()
    lines = [json.loads(l) for l in (tmp_path / "metrics.jsonl").read_text().splitlines()]
    assert lines[0]["step"] == 1 and lines[0]["loss/total"] == 0.5
    assert lines[1]["loss/total"] == 0.25


def test_psnr():
    x = jnp.zeros((4, 4, 3))
    assert float(psnr(x, x)) > 100  # identical -> clamped-high
    y = jnp.full((4, 4, 3), 0.1)
    np.testing.assert_allclose(float(psnr(x, y)), 20.0, atol=1e-4)


def test_device_prefetcher_order_and_errors():
    mesh = make_mesh()

    def gen():
        for i in range(5):
            yield {"x": np.full((8, 2), i, np.float32)}

    pf = DevicePrefetcher(iter(gen()), mesh, depth=2)
    values = [int(next(pf)["x"][0, 0]) for _ in range(5)]
    assert values == [0, 1, 2, 3, 4]

    def bad():
        yield {"x": np.zeros((8, 2), np.float32)}
        raise RuntimeError("loader exploded")

    pf2 = DevicePrefetcher(iter(bad()), mesh, depth=2)
    next(pf2)
    try:
        next(pf2)
        assert False, "expected the loader error to surface"
    except RuntimeError as e:
        assert "exploded" in str(e)


def test_sanity_metrics_traced_in_jit():
    from neural_jacobian_field_tpu.utils import get_sanity_metrics_traced

    @jax.jit
    def f(x):
        return get_sanity_metrics_traced({"a": x, "ints": jnp.array([1, 2])})

    out = f(jnp.array([3.0, -1.0]))
    assert float(out["a_min"]) == -1.0 and float(out["a_max"]) == 3.0
    assert not any("ints" in k for k in out)


def test_wandb_artifact_checkpoints(tmp_path, monkeypatch):
    """Space-efficient artifact rotation + offline sync triggers
    (reference utils/wandb_logger.py:26-189 semantics): each checkpoint logs
    a 'latest' artifact, the SUPERSEDED version gets a TTL, and offline mode
    drops a wandb-osh trigger file pointing at the run dir."""
    import sys
    import types

    from neural_jacobian_field_tpu.utils.logging import WandbArtifactCheckpoints

    logged = []

    class FakeArtifact:
        def __init__(self, name, type, metadata=None):
            self.name, self.type, self.metadata = name, type, metadata
            self.dirs, self.ttl, self.saved, self.waited = [], None, False, False

        def add_dir(self, d):
            self.dirs.append(d)

        def wait(self):
            self.waited = True

        def save(self):
            self.saved = True

    fake_wandb = types.ModuleType("wandb")
    fake_wandb.Artifact = FakeArtifact
    monkeypatch.setitem(sys.modules, "wandb", fake_wandb)

    class FakeRun:
        id = "abc123"
        dir = str(tmp_path / "wandb" / "run-1" / "files")

        def log_artifact(self, artifact, aliases=None):
            logged.append((artifact, tuple(aliases)))

    ckpt_dir = tmp_path / "ckpt" / "5000"
    ckpt_dir.mkdir(parents=True)
    comm = tmp_path / "osh"
    hook = WandbArtifactCheckpoints(FakeRun(), expiration_days=5, offline=True,
                                    min_sync_interval=0.0,
                                    communication_dir=comm)
    hook.on_checkpoint(ckpt_dir, step=5000)
    assert logged[-1][1] == ("latest",)
    assert logged[-1][0].name == "model-abc123"
    assert logged[-1][0].metadata["step"] == 5000
    first = logged[-1][0]

    hook.on_checkpoint(ckpt_dir, step=10000, best=True)
    assert logged[-1][1] == ("latest", "best")
    # the superseded artifact got the 5-day TTL and was re-saved
    assert first.waited and first.saved
    assert first.ttl is not None and first.ttl.days == 5
    # offline: wandb-osh trigger files written, content -> run dir parent
    triggers = list(comm.glob("*.command"))
    assert triggers
    assert "run-1" in triggers[0].read_text()
