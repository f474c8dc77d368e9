"""Repo-root pytest config: pin the CPU backend with a faked 8-device mesh
for EVERY collected file — including ``--doctest-modules`` runs over
``ezpz_tpu/`` (the host's sitecustomize force-selects a remote-tunnel TPU
plugin and ignores ``JAX_PLATFORMS``, so doctests would otherwise compile
through the tunnel at ~100x the wall time). ``tests/conftest.py`` applies
the same settings; both are idempotent."""

import os

os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import ezpz_tpu

# EZPZ_TPU_NO_CACHE=1 opts out of the persistent compilation cache: long
# fuzzing runs compile hundreds of distinct throwaway topologies, and
# jax's cache writer (zstandard serialization in put_executable_and_time)
# has segfaulted intermittently under that many-compile stress on this
# image. Normal suite runs keep the cache (it cuts wall time ~2x).
if os.environ.get("EZPZ_TPU_NO_CACHE", "") in ("", "0"):
    ezpz_tpu.enable_compilation_cache(
        os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache")
    )


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "slow: long-running integration test (multi-process spawns)"
    )


# Full-suite runs accumulate thousands of live compiled executables; on this
# image jaxlib's XLA:CPU AOT loader has segfaulted deterministically late in
# the run (inside compilation_cache get_executable_and_time ->
# backend.deserialize_executable) once that population is large enough.
# Dropping the in-process executable cache every N tests caps the live count;
# re-compiles after a drop are near-free disk hits on the persistent cache.
_CLEAR_EVERY = int(os.environ.get("EZPZ_TPU_CLEAR_CACHES_EVERY", "40"))
_test_counter = {"n": 0}


def pytest_runtest_teardown(item, nextitem):
    if _CLEAR_EVERY <= 0:
        return
    _test_counter["n"] += 1
    if _test_counter["n"] % _CLEAR_EVERY == 0:
        jax.clear_caches()
