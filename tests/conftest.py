"""Test configuration: run the suite on a virtual 8-device CPU mesh.

Multi-chip sharding logic is validated the TPU-idiomatic way (SURVEY.md §4): XLA's
host platform is forced to expose 8 virtual CPU devices so every
``jax.sharding.Mesh`` test executes the real SPMD partitioning without hardware.

The environment pins ``JAX_PLATFORMS=axon`` (the tunneled TPU) via sitecustomize;
tests must NOT run over the tunnel (each dispatch pays network latency), so we
hard-override to cpu here, both in the env and in jax's config.
"""
import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)


# ---------------------------------------------------------------------------
# `-m quick`: a sub-2-minute core subset for tight iteration loops (the full
# suite is ~25 min, dominated by interpret-mode serving/parallelism tests).
# Modules below cover the quant math, reference parity, calibration, and the
# GEMM/KV-layout kernel numerics; plus a couple of named fast decode tests.
# ---------------------------------------------------------------------------
import pytest  # noqa: E402

_QUICK_MODULES = {
    "test_quant_core",
    "test_reference_parity",
    "test_calib",
    "test_ops_reference",
    "test_pallas_gemm",
}
_QUICK_TESTS = {
    "test_kernel_layout_roundtrip_and_reference_conversion",
    "test_flush_crossing_page_boundary",
}
_QUICK_EXCLUDE = {  # slow outliers inside quick modules
    "test_kblk_deep_k_path",
    "test_fused_qkv_gemm_matches_unfused",
}


def pytest_collection_modifyitems(config, items):
    for item in items:
        mod = item.module.__name__.rsplit(".", 1)[-1]
        name = item.name.split("[")[0]
        if name in _QUICK_EXCLUDE:
            continue
        if mod in _QUICK_MODULES or name in _QUICK_TESTS:
            item.add_marker(pytest.mark.quick)


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_between_modules():
    """Drop compiled executables at module boundaries.

    The XLA CPU client segfaults inside compile after ~180 tests in one
    process (r4: test_serving_lora.py; r5: the DP x TP engine compile at
    suite position 180 — both pass in a fresh process).  The crash tracks
    cumulative live compilation state, so free it per module; this also
    caps the suite's memory high-water mark."""
    yield
    import jax

    jax.clear_caches()
