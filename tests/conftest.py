"""Test harness config: run everything on a virtual 8-device CPU mesh so
mesh/shard_map/halo logic is exercised without TPU hardware
(SURVEY.md section 4 item 3).

Note: this environment's sitecustomize force-registers the axon TPU plugin
and overrides JAX_PLATFORMS, so the env var alone is NOT enough — we must
also update jax.config after import, before any backend is touched.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

# single-core box: persistent compile cache makes test reruns ~free
jax.config.update("jax_compilation_cache_dir", "/tmp/bgt_jax_test_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import pytest  # noqa: E402


@pytest.fixture(autouse=True)
def _reset_perf_gates():
    """parse_config installs kernel-routing gates globally (perf_gates.py);
    keep tests isolated from each other's parses."""
    yield
    from biasgan_tpu import perf_gates

    perf_gates.reset()
