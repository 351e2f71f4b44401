"""Test config: run on CPU with 8 virtual devices so mesh/sharding tests work
without TPU hardware (SURVEY.md §4: JAX makes multi-device testing cheap via
--xla_force_host_platform_device_count)."""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = flags + " --xla_force_host_platform_device_count=8"

import jax  # noqa: E402

# The axon TPU plugin's sitecustomize forces jax_platforms="axon,cpu" at
# registration time, overriding the env var — force CPU back for tests.
jax.config.update("jax_platforms", "cpu")

jax.config.update("jax_enable_x64", False)
# The CPU backend's default matmul precision goes through a low-precision
# oneDNN path (~1e-1 abs error on fp32 GEMMs); parity tests need real fp32.
jax.config.update("jax_default_matmul_precision", "highest")

import gc  # noqa: E402

import pytest  # noqa: E402


@pytest.fixture(autouse=True, scope="module")
def _bound_compiled_programs():
    """Drop compiled executables at module boundaries.

    With the full suite in one process, XLA's CPU compiler deadlocked
    after ~15 CPU-minutes of accumulated executables (observed 2026-08-17:
    the main thread parked inside backend_compile for spec_step while
    every XLA worker thread sat in futex_wait; reproducible only with
    near-full-suite state, not by any module pair). Clearing the jit
    cache between modules keeps the live-executable count bounded;
    intra-module caching — the reuse that actually matters for test
    time — is unaffected."""
    yield
    gc.collect()
    jax.clear_caches()
