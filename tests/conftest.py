"""Test config: run everything on a virtual 8-device CPU mesh.

Multi-chip sharding paths are validated on fake CPU devices (the SURVEY §4
test strategy): XLA_FLAGS host-platform device count must be set before
jax initializes.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
prev = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in prev:
    os.environ["XLA_FLAGS"] = (
        prev + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# The axon TPU plugin overrides JAX_PLATFORMS at registration; the config
# update after import is authoritative.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)

# Persistent compilation cache: /tmp survives across rounds on this box, so
# repeat suite runs skip recompiling the big train-step/SPMD programs (the
# bulk of the 1-core suite's wall time). Entries are keyed on jaxlib +
# backend + compile options, so stale hits are structurally impossible.
try:
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
except Exception:  # pragma: no cover - cache is best-effort
    pass

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
