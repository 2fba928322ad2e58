"""Test harness: run everything on a virtual 8-device CPU mesh.

This is the TPU-native analog of a fake backend (SURVEY.md §4): sharding and
collective behavior are validated on `--xla_force_host_platform_device_count=8`
without real chips. Must set env vars before jax initializes.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_enable_x64", False)
# Persistent compilation cache: CPU compiles of the full model dominate test
# wall-clock; cache them across runs.
jax.config.update("jax_compilation_cache_dir", "/tmp/njf_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
