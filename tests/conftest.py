"""Test harness: run everything on a virtual 8-device CPU mesh.

This is the TPU-native analog of a fake backend (SURVEY.md §4): sharding and
collective behavior are validated on 8 virtual CPU devices without real
chips.

NOTE: in this environment the PJRT plugin ("axon") registers at `import jax`,
so OS-env overrides (JAX_PLATFORMS / XLA_FLAGS) set after interpreter start
are ignored. The reliable mechanism is jax.config, applied before the first
backend use.
"""

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)
jax.config.update("jax_enable_x64", False)
# Persistent compilation cache: compiles of the full model dominate test
# wall-clock; cache them across runs.
jax.config.update("jax_compilation_cache_dir", "/tmp/njf_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
