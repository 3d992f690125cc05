"""Test env: CPU backend with 8 virtual devices for mesh/sharding tests.

The ambient environment pins JAX_PLATFORMS=axon (TPU tunnel) via
sitecustomize, which also imports jax at interpreter start — so env vars are
too late; we override through jax.config before any backend initializes.
"""
import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
