"""Test harness: CPU backend with 8 virtual devices.

Correctness tests never need the real TPU (BASELINE config 1 is explicitly
CPU-runnable); multi-chip sharding tests run on a virtual 8-device CPU mesh.

Note: this environment pre-imports jax at interpreter startup (PYTHONPATH
sitecustomize) with JAX_PLATFORMS pointing at the tunneled TPU, so setting
env vars alone is too late — we must also update jax.config before the
backend initializes.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)
