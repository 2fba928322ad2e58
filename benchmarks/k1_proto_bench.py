"""Prototype check for the K1 primitives: correctness vs the naive bilinear
path and on-chip timings at reference shapes (7 images x 65536 points/level).
"""
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

from neural_jacobian_field_tpu.ops.grid_sample import grid_sample_bilinear
from neural_jacobian_field_tpu.ops import pixel_gather as pg

B, N = 7, 65536


def sync(x):
    return np.asarray(jax.device_get(x)).ravel()[:1]


def timeit(fn, args, k=8):
    out = fn(*args)
    sync(jax.tree.leaves(out)[0])
    t0 = time.perf_counter()
    for _ in range(k):
        out = fn(*args)
    sync(jax.tree.leaves(out)[0])
    return (time.perf_counter() - t0) / k * 1e3


def main():
    key = jax.random.PRNGKey(0)
    hf, wf = 240, 320
    fine = jax.random.normal(key, (B, hf, wf, 128), jnp.bfloat16)
    mid = jax.random.normal(key, (B, 60, 80, 128), jnp.bfloat16)
    coarse = jax.random.normal(key, (B, 30, 40, 256), jnp.bfloat16)
    fx = jax.random.uniform(jax.random.PRNGKey(1), (B, N), minval=-3, maxval=wf + 2.0)
    fy = jax.random.uniform(jax.random.PRNGKey(2), (B, N), minval=-3, maxval=hf + 2.0)

    # ---- correctness: pyramid fine gather == grid_sample on the fine map
    pyr = pg.pack_pyramid(pg.FeaturePyramid(fine=fine, mid=mid, coarse=coarse))

    @jax.jit
    def pyr_gather(pyr, fx, fy):
        return pg.pyramid_pixel_features(pyr, fx, fy)

    @jax.jit
    def pyr_gather_sum(pyr, fx, fy):
        o = pg.pyramid_pixel_features(pyr, fx, fy)
        return jnp.sum(o * o)

    out = pyr_gather(pyr, fx, fy)

    coords = jnp.stack([fx / (wf - 1) * 2 - 1, fy / (hf - 1) * 2 - 1], axis=-1)
    ref_fine = grid_sample_bilinear(fine, coords)
    err_fine = jnp.max(jnp.abs(out[..., :128] - ref_fine))
    # mid/coarse vs direct bilinear at native res
    mx, my = (fx + 0.5) / 4 - 0.5, (fy + 0.5) / 4 - 0.5
    cm = jnp.stack([mx / 79 * 2 - 1, my / 59 * 2 - 1], axis=-1)
    ref_mid = grid_sample_bilinear(mid, jnp.clip(cm, -1, 1))
    err_mid = jnp.max(jnp.abs(out[..., 128:256] - ref_mid))
    cx, cyy = (fx + 0.5) / 8 - 0.5, (fy + 0.5) / 8 - 0.5
    cc = jnp.stack([cx / 39 * 2 - 1, cyy / 29 * 2 - 1], axis=-1)
    ref_coarse = grid_sample_bilinear(coarse, jnp.clip(cc, -1, 1))
    err_coarse = jnp.max(jnp.abs(out[..., 256:] - ref_coarse))
    print("max err fine/mid/coarse:", float(err_fine), float(err_mid), float(err_coarse))

    # ---- fwd timing (gather only, packing excluded — once per step)
    print("pyramid fwd ms:", timeit(pyr_gather_sum, (pyr, fx, fy)))

    @jax.jit
    def pack_only(fine, mid, coarse):
        p = pg.pack_pyramid(pg.FeaturePyramid(fine=fine, mid=mid, coarse=coarse))
        return jnp.sum(p.fine2[0, 0].astype(jnp.float32)) + jnp.sum(p.mid2[0, 0].astype(jnp.float32))

    print("pack ms:", timeit(pack_only, (fine, mid, coarse)))

    # ---- fwd+bwd timing: grads flow to the raw maps through pack + gathers
    @jax.jit
    def loss_grad(fine, mid, coarse, fx, fy):
        def loss(fine, mid, coarse):
            pyr = pg.pack_pyramid(pg.FeaturePyramid(fine=fine, mid=mid, coarse=coarse))
            o = pg.pyramid_pixel_features(pyr, fx, fy)
            return jnp.sum(o * o)

        g = jax.grad(loss, argnums=(0, 1, 2))(fine, mid, coarse)
        return sum(jnp.sum(x.astype(jnp.float32) ** 2) for x in g)

    print("pyramid fwd+bwd ms:", timeit(loss_grad, (fine, mid, coarse, fx, fy)))

    # ---- old path at the same workload: 512-ch concat map, 4-corner gather
    concat = jax.random.normal(key, (B, hf, wf, 512), jnp.bfloat16)

    @jax.jit
    def old_fwd(concat, coords):
        return jnp.sum(grid_sample_bilinear(concat, coords) ** 2)

    print("old concat fwd ms:", timeit(old_fwd, (concat, coords)))

    @jax.jit
    def old_grad(concat, coords):
        gg = jax.grad(lambda f: jnp.sum(grid_sample_bilinear(f, coords) ** 2))(concat)
        return jnp.sum(gg.astype(jnp.float32) ** 2)

    print("old concat fwd+bwd ms:", timeit(old_grad, (concat, coords)))


if __name__ == "__main__":
    jax.config.update("jax_compilation_cache_dir",
                      str(Path.home() / ".cache" / "njf_jax_cache"))
    main()
