"""Pallas TPU kernels for the volume-rendering hot path (SURVEY.md §7).

  K1   one-hot MXU gather/scatter (onehot_gather.py; exact-mode coarse level)
  K5   fused PDF resample         (pdf_resample.py; rendering.use_pallas_pdf)
  K6   fused 2x2 pack             (pack2x2.py; always on TPU)
  K7   fused ResnetFC trunk fwd+bwd (field_mlp_train.py;
       rendering.use_fused_trunk) — supersedes the round-1 forward-only K2.
  K4 (SH-deg-4 encoding) stays a closed-form XLA expression
  (ops/encodings.py) — it fuses into neighbouring elementwise work and a
  kernel would only add dispatch overhead. K3 (fused composite) was built,
  wired into the render path, and MEASURED 6% slower than XLA's own fusion
  of the same chain (benchmarks/RESULTS.md r2), then deleted — dead kernels
  are negative value.

Every kernel has a jitted-XLA reference implementation and ships with parity
tests (tests/test_pallas.py, interpret mode on CPU).
"""

from .pdf_resample import fused_sample_pdf

from .field_mlp_train import fused_resnet_fc_train
from .pack2x2 import pack_2x2_flat

__all__ = ["fused_resnet_fc_train", "fused_sample_pdf", "pack_2x2_flat"]
