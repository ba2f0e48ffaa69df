"""Test config: force the real CPU backend with 8 virtual devices.

The container's sitecustomize registers the `axon` TPU-tunnel platform and
sets JAX_PLATFORMS=axon; tests must run on host CPU (fast, deterministic,
8-device mesh for sharding tests), so we override the platform before any
backend initialization.
"""

import os

# Must happen before first jax backend use (conftest imports run before tests).
# TTPU_TEST_PLATFORM=tpu leaves the real backend attached so kernel tests can
# run COMPILED on hardware (e.g. `TTPU_TEST_PLATFORM=tpu pytest tests/ops`).
_ON_TPU = os.environ.get("TTPU_TEST_PLATFORM", "cpu") != "cpu"
if not _ON_TPU:
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
    os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

if not _ON_TPU:
    jax.config.update("jax_platforms", "cpu")
# Persistent compilation cache: identical tiny-model graphs recur massively
# across the suite (and across pytest-xdist workers); caching them cuts
# wall-clock several-fold.
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_test_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.2)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

import pytest  # noqa: E402


@pytest.fixture(scope="session")
def cpu_devices():
    devs = jax.devices()
    assert devs[0].platform == "cpu", f"tests must run on CPU, got {devs[0].platform}"
    return devs


@pytest.fixture()
def tmp_model_dir(tmp_path):
    return str(tmp_path)
