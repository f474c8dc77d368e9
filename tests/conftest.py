"""Test configuration: run on CPU with a virtual 8-device mesh.

The host's sitecustomize registers a remote-tunnel TPU PJRT plugin and
force-selects it via jax.config, so the env var alone is not enough — we
must override the config before any backend initializes.
"""

import os

os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

# Persistent compilation cache: repeated suite runs skip recompiling the
# (identical) jitted solvers, cutting wall time substantially.
# EZPZ_TPU_NO_CACHE=1 opts out (see the repo-root conftest.py: jax's cache
# writer has segfaulted under long fuzzing's many-compile stress).
import ezpz_tpu

if os.environ.get("EZPZ_TPU_NO_CACHE", "") in ("", "0"):
    ezpz_tpu.enable_compilation_cache(
        os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                     ".jax_cache")
    )
