"""K1 design microbenchmarks — pixel-aligned gather/scatter on the real chip.

Round-1 established (benchmarks/RESULTS.md): the 4-corner 512-ch gather runs
at ~52 GB/s effective (~20 ns/row) whether indices are sorted or random, and
the backward scatter-add is slower still. This script measures the two facts
that decide the round-2 kernel design:

  1. WIDTH SCALING: is the XLA gather/scatter cost per-ROW (flat in width) or
     per-BYTE?  Per-row => narrowing the rows buys nothing; per-byte =>
     splitting the feature pyramid into native-resolution levels (64..256 ch)
     is a direct win.
  2. ONE-HOT MXU GATHER: for pyramid levels whose full map fits in VMEM
     (layer2: 60x80x128, layer3: 30x40x256 at 480x640 input), a gather can be
     a dense one-hot matmul (zero random HBM access). Measure the pure-XLA
     blocked einsum version against the equivalent XLA gather.

All timings: chained jitted calls, ending in a device_get data pull (the only
reliable sync on this transport — see RESULTS.md methodology).
"""

import functools
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

B = 7                      # batch (reference config)
POINTS = 65536             # rays*samples per image per level (256*256)
HF, WF = 240, 320          # conv1-resolution feature map at 480x640 input


def timed(fn, args, k=8, sync=lambda out: out):
    """fn must be jitted and return something reducible; chains k calls by
    perturbing an input with the previous (scalar) output so calls serialize."""
    out = fn(*args)
    np.asarray(jax.device_get(sync(out)))  # compile + real sync
    t0 = time.perf_counter()
    for i in range(k):
        out = fn(*args)
    np.asarray(jax.device_get(sync(out)))
    return (time.perf_counter() - t0) / k


def emit(name, ms, note=""):
    print(json.dumps({"bench": name, "ms": round(ms * 1e3, 2), "note": note}),
          flush=True)


# ---------------------------------------------------------------- width scaling
def bench_gather_width():
    key = jax.random.PRNGKey(0)
    n = B * POINTS
    for width in (64, 128, 256, 512):
        feat = jax.random.normal(key, (B, HF * WF, width), jnp.bfloat16)
        idx = jax.random.randint(jax.random.PRNGKey(1), (B, POINTS, 4), 0, HF * WF)

        @jax.jit
        def run(feat, idx):
            # 4-corner gather consumed in-program (sum) — round-1's floor setup
            parts = [
                jnp.take_along_axis(feat, idx[..., c : c + 1], axis=1)
                for c in range(4)
            ]
            return sum(jnp.sum(p.astype(jnp.float32)) for p in parts)

        ms = timed(run, (feat, idx))
        gb = n * 4 * width * 2 / 1e9
        emit(f"xla_gather_w{width}", ms,
             f"{n*4/1e6:.1f}M rows, {gb:.2f} GB, {gb/ms:.0f} GB/s")


def bench_gather_packed2():
    """2-corner packed: rows [y, x0:x0+2] fetched as one 2W-wide row (halves
    row count, doubles row width)."""
    key = jax.random.PRNGKey(0)
    n = B * POINTS
    for width in (128, 512):
        feat = jax.random.normal(key, (B, HF * WF // 2, 2 * width), jnp.bfloat16)
        idx = jax.random.randint(jax.random.PRNGKey(1), (B, POINTS, 2), 0, HF * WF // 2)

        @jax.jit
        def run(feat, idx):
            parts = [
                jnp.take_along_axis(feat, idx[..., c : c + 1], axis=1)
                for c in range(2)
            ]
            return sum(jnp.sum(p.astype(jnp.float32)) for p in parts)

        ms = timed(run, (feat, idx))
        gb = n * 2 * 2 * width * 2 / 1e9
        emit(f"xla_gather_packed2_w{width}", ms,
             f"{n*2/1e6:.1f}M rows of {2*width*2}B, {gb/ms:.0f} GB/s")


def bench_scatter_width():
    key = jax.random.PRNGKey(0)
    n = B * POINTS
    for width in (64, 128, 256, 512):
        vals = jax.random.normal(key, (B, POINTS * 4, width), jnp.bfloat16)
        idx = jax.random.randint(jax.random.PRNGKey(1), (B, POINTS * 4), 0, HF * WF)

        @jax.jit
        def run(vals, idx):
            out = jnp.zeros((B, HF * WF, width), jnp.bfloat16)
            out = out.at[
                jnp.arange(B)[:, None], idx
            ].add(vals)
            return jnp.sum(out.astype(jnp.float32))

        ms = timed(run, (vals, idx))
        gb = n * 4 * width * 2 / 1e9
        emit(f"xla_scatter_w{width}", ms,
             f"{n*4/1e6:.1f}M rows, {gb:.2f} GB (write side), {gb/ms:.0f} GB/s")


# ------------------------------------------------------------- one-hot gather
def onehot_gather_xla(feat_flat, idx, w4, block=2048):
    """feat_flat [B, K, C]; idx [B, N, 4] texel ids; w4 [B, N, 4] bilinear
    weights. Returns [B, N, C] == sum_c w4[..,c] * feat[idx[..,c]] via blocked
    one-hot matmuls (K small)."""
    Bc, K, C = feat_flat.shape
    N = idx.shape[1]
    nblk = N // block
    idx_b = idx.reshape(Bc, nblk, block, 4)
    w_b = w4.reshape(Bc, nblk, block, 4)

    def per_block(i_blk, w_blk):
        # one-hot accumulate 4 corners: [block, K]
        cols = jax.lax.broadcasted_iota(jnp.int32, (block, K), 1)
        oh = jnp.zeros((block, K), jnp.bfloat16)
        for c in range(4):
            oh = oh + jnp.where(cols == i_blk[:, c : c + 1],
                                w_blk[:, c : c + 1], 0.0).astype(jnp.bfloat16)
        return oh

    def per_image(feat_i, idx_i, w_i):
        def body(carry, blk):
            i_blk, w_blk = blk
            oh = per_block(i_blk, w_blk)
            out = jnp.dot(oh, feat_i, preferred_element_type=jnp.float32)
            return carry, out.astype(jnp.bfloat16)

        _, outs = jax.lax.scan(body, 0, (idx_i, w_i))
        return outs.reshape(N, feat_i.shape[-1])

    return jax.vmap(per_image)(feat_flat, idx_b, w_b)


def bench_onehot():
    key = jax.random.PRNGKey(0)
    cases = [
        ("layer3", 30 * 40, 1280, 256),   # K texels, padded K, channels
        ("layer2", 60 * 80, 4864, 128),
    ]
    for name, k_real, k_pad, ch in cases:
        feat = jax.random.normal(key, (B, k_pad, ch), jnp.bfloat16)
        idx = jax.random.randint(jax.random.PRNGKey(1), (B, POINTS, 4), 0, k_real)
        w4 = jax.random.uniform(jax.random.PRNGKey(2), (B, POINTS, 4))

        run_oh = jax.jit(functools.partial(onehot_gather_xla))

        @jax.jit
        def run_sum(feat, idx, w4):
            return jnp.sum(onehot_gather_xla(feat, idx, w4).astype(jnp.float32))

        ms = timed(run_sum, (feat, idx, w4))
        flops = B * POINTS * k_pad * ch * 2
        emit(f"onehot_xla_{name}", ms, f"{flops/1e9:.0f} GFLOP, "
             f"{flops/ms/1e12:.1f} TFLOP/s effective")

        # XLA-gather equivalent at the same width for comparison
        @jax.jit
        def run_g(feat, idx, w4):
            parts = sum(
                jnp.take_along_axis(feat, idx[..., c : c + 1], axis=1)
                * w4[..., c : c + 1].astype(jnp.bfloat16)
                for c in range(4)
            )
            return jnp.sum(parts.astype(jnp.float32))

        ms_g = timed(run_g, (feat, idx, w4))
        emit(f"xla_gather_{name}", ms_g, f"{B*POINTS*4/1e6:.1f}M rows of {ch*2}B")


# ------------------------------------------------------------ narrow reorders
def bench_narrow_gather():
    """Cost of permuting narrow per-point rows (the sort-based design's tax)."""
    key = jax.random.PRNGKey(0)
    n = B * POINTS
    for width, dt in ((1, jnp.float32), (8, jnp.float32), (16, jnp.float32)):
        src = jax.random.normal(key, (n, width), dt)
        idx = jax.random.permutation(jax.random.PRNGKey(1), n)

        @jax.jit
        def run(src, idx):
            return jnp.sum(jnp.take(src, idx, axis=0))

        ms = timed(run, (src, idx))
        emit(f"narrow_gather_w{width}f32", ms, f"{n/1e6:.2f}M rows")


def bench_sort():
    key = jax.random.PRNGKey(0)
    n = B * POINTS
    keys = jax.random.randint(key, (n,), 0, 1 << 20)

    @jax.jit
    def run(keys):
        order = jnp.argsort(keys)
        return jnp.sum(order)

    ms = timed(run, (keys,))
    emit("argsort_458k_int32", ms)


if __name__ == "__main__":
    jax.config.update("jax_compilation_cache_dir",
                      str(Path.home() / ".cache" / "njf_jax_cache"))
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    benches = {
        "gather_width": bench_gather_width,
        "gather_packed2": bench_gather_packed2,
        "scatter_width": bench_scatter_width,
        "onehot": bench_onehot,
        "narrow": bench_narrow_gather,
        "sort": bench_sort,
    }
    for name, fn in benches.items():
        if which in ("all", name):
            fn()
