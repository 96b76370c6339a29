"""
Test configuration: run everything on a virtual 8-device CPU mesh so sharding
tests work without TPU hardware. Must set env vars before jax is imported.
"""
import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

# force CPU even when a site-customized accelerator plugin registered itself
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)
jax.config.update("jax_compilation_cache_dir", "/tmp/tds_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def pytest_collection_modifyitems(config, items):
    """Skip depends_on_tpu tests unless explicitly enabled: the suite runs
    on a forced-CPU virtual mesh (env above), so hardware tests must run in
    a subprocess against the real backend -- set TDS_TPU_TESTS=1 on a
    machine with TPU access to enable them."""
    import pytest
    if os.environ.get("TDS_TPU_TESTS") == "1":
        return
    skip = pytest.mark.skip(reason="TPU hardware test (set TDS_TPU_TESTS=1)")
    for item in items:
        if "depends_on_tpu" in item.keywords:
            item.add_marker(skip)
