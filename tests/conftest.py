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

# Fast CPU tier (VERDICT r3 item #7): SD3_TPU_TESTS_CPU=1 switches the whole
# suite to the CPU platform (8 virtual devices) BEFORE first backend use —
# pallas kernels auto-run in interpret mode off-TPU (ops/*:_use_interpret),
# so the logic surface runs in minutes with no remote compile service.
# The env var must be handled here: the axon plugin pins the platform at
# first backend touch, so JAX_PLATFORMS in the environment is ignored.
if os.environ.get("SD3_TPU_TESTS_CPU"):
    jax.config.update("jax_platforms", "cpu")

jax.config.update("jax_default_matmul_precision", "highest")
# Persistent compile cache — this host has a single CPU core and pays ~10s+
# per XLA compile; caching across pytest runs keeps the suite usable.
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

import pytest  # noqa: E402


@pytest.fixture(autouse=True, scope="session")
def _cpu_tier_single_device_mesh():
    """On the CPU tier the 8 virtual devices exist for the SUBPROCESS mesh
    tests (test_sharding/test_multihost); the in-process Trainer tests were
    written against the ambient single TPU chip, and their tiny batches (2)
    don't divide a dp×fsdp=8 default mesh. Pin make_mesh's default device
    list to one device so those tests keep their single-chip semantics;
    tests that want a real mesh pass `devices=`/run in subprocesses."""
    if not os.environ.get("SD3_TPU_TESTS_CPU"):
        yield
        return
    from sd3_tpu.parallel import mesh as mesh_mod
    from sd3_tpu.training import trainer as trainer_mod
    orig = mesh_mod.make_mesh

    def one_device_default(cfg=None, devices=None):
        if devices is None:
            devices = jax.devices()[:1]
        return orig(cfg, devices)

    mesh_mod.make_mesh = one_device_default
    trainer_mod.make_mesh = one_device_default  # imported by name there
    yield
    mesh_mod.make_mesh = orig
    trainer_mod.make_mesh = orig
