"""Run any framework module on the CPU backend.

The ambient environment registers the axon TPU backend at interpreter start
(sitecustomize) and pins JAX_PLATFORMS=axon, so the env-var route to CPU is
closed; like tests/conftest.py, this flips the platform through jax.config
before any backend initializes. Used by pipeline smoke runs
(`RUNNER="python scripts/cpu_run.py" STEPS=50 bash scripts/pipelines/...`)
and anywhere a second process needs compute while the TPU is busy.

Usage: python scripts/cpu_run.py <module> [args...]
Optional: CPU_DEVICES=8 for a virtual multi-device mesh.
"""
import os
import runpy
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

n = os.environ.get("CPU_DEVICES")
if n:
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + f" --xla_force_host_platform_device_count={n}"
        ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

module = sys.argv[1]
sys.argv = [module] + sys.argv[2:]
runpy.run_module(module, run_name="__main__", alter_sys=True)
