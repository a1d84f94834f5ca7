"""Test config.

Tests run on the ambient backend (the axon TPU plugin force-selects itself via
jax.config at registration, so JAX_PLATFORMS has no effect here) — giving real
TPU coverage of the pallas kernels. Multi-device sharding tests
(test_sharding.py) run in a subprocess that switches jax to the CPU platform
with an 8-device virtual mesh (xla_force_host_platform_device_count), per the
SURVEY.md §4 test strategy.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_default_matmul_precision", "highest")
# Persistent compile cache — this host has a single CPU core and pays ~10s+
# per XLA compile; caching across pytest runs keeps the suite usable.
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
