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
