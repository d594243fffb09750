"""Test harness configuration.

Tests run on CPU with x64 enabled and a faked 8-device mesh
(SURVEY.md §4.4: `--xla_force_host_platform_device_count=8` is the
standard JAX trick for exercising sharding without a pod).  The real-TPU
path is exercised by `bench.py` / `__graft_entry__.py` instead.
"""

import os

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "")
    + " --xla_force_host_platform_device_count=8"
)

import jax  # noqa: E402

# NOTE: this environment pins JAX_PLATFORMS=axon (TPU tunnel) via
# sitecustomize; the env var cannot be overridden from here, but the
# config knob can.  Tests must run on (8 faked) CPU devices.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
# XLA-CPU compiles are ~1 s each in this environment; cache them across
# test runs.
jax.config.update("jax_compilation_cache_dir", "/tmp/obca_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
