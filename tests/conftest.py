"""Test configuration: run the suite on an 8-device virtual CPU mesh.

The container's sitecustomize pre-imports jax and registers the single-chip
axon TPU backend; backends initialize lazily, so switching the platform and
forcing 8 host devices here (before any backend use) gives every test a
deterministic float64 CPU mesh.  Set ``TT_SKETCH_TPU_TEST_TPU=1`` to run on
the real chip instead (sharding tests then skip if fewer than 2 devices).
"""
import os

import jax

if not os.environ.get("TT_SKETCH_TPU_TEST_TPU"):
    jax.config.update("jax_platforms", "cpu")
    flags = os.environ.get("XLA_FLAGS", "")
    if "--xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8"
        ).strip()

jax.config.update("jax_enable_x64", True)
