"""Pallas TPU kernels for the volume-rendering hot path (SURVEY.md §7 K1-K5).

Every kernel has a jitted-XLA reference implementation in ops/ and ships with
parity tests (tests/test_pallas.py, interpret mode on CPU). Kernels are
opt-in via the `use_pallas=...` flags on their call sites.
"""

from .composite import fused_composite
from .field_mlp import fused_resnet_fc
from .pdf_resample import fused_sample_pdf

__all__ = ["fused_composite", "fused_resnet_fc", "fused_sample_pdf"]
