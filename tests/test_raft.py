"""RAFT port tests: shapes, padder round-trip, zero-motion sanity, video
chunking, flow resize magnitude scaling (raft_wrapper/raft.py semantics)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from neural_jacobian_field_tpu.flow import (
    RAFT,
    InputPadder,
    compute_video_flow,
    resize_batched_flow,
)


@pytest.fixture(scope="module")
def raft_setup():
    raft = RAFT(num_iters=2)
    img = jax.random.uniform(jax.random.PRNGKey(0), (1, 32, 40, 3))
    variables = raft.init(jax.random.PRNGKey(1), img, img)
    return raft, variables


def test_raft_shapes(raft_setup):
    raft, variables = raft_setup
    a = jax.random.uniform(jax.random.PRNGKey(2), (2, 32, 40, 3))
    b = jax.random.uniform(jax.random.PRNGKey(3), (2, 32, 40, 3))
    flow = raft.apply(variables, a, b)
    assert flow.shape == (2, 32, 40, 2)
    assert np.isfinite(np.asarray(flow)).all()
    low = raft.apply(variables, a, b, return_low_res=True)
    assert low.shape == (2, 4, 5, 2)


def test_input_padder():
    p = InputPadder((1, 30, 37, 3))
    x = jnp.ones((1, 30, 37, 3))
    padded = p.pad(x)
    assert padded.shape[1] % 8 == 0 and padded.shape[2] % 8 == 0
    flow = jnp.ones((1, padded.shape[1], padded.shape[2], 2))
    assert p.unpad(flow).shape == (1, 30, 37, 2)


def test_video_flow_chunking(raft_setup):
    raft, variables = raft_setup
    video = jax.random.uniform(jax.random.PRNGKey(4), (5, 32, 40, 3))
    fwd = compute_video_flow(raft, variables, video, chunk=2)
    assert fwd.shape == (4, 32, 40, 2)
    bwd = compute_video_flow(raft, variables, video, chunk=3, backward=True)
    assert bwd.shape == (4, 32, 40, 2)


def test_resize_flow_scales_magnitude():
    flow = jnp.ones((1, 8, 8, 2))
    out = resize_batched_flow(flow, (16, 24))
    assert out.shape == (1, 16, 24, 2)
    np.testing.assert_allclose(np.asarray(out[..., 0]), 3.0, atol=1e-5)  # x by 24/8
    np.testing.assert_allclose(np.asarray(out[..., 1]), 2.0, atol=1e-5)  # y by 16/8
