"""Test configuration: run JAX on a virtual 8-device CPU mesh.

Real TPU hardware is a single chip in this environment; sharding tests use
XLA's host-platform device splitting so multi-chip SPMD code paths compile
and execute everywhere.
"""

import os

# Force-override: the ambient environment pins JAX_PLATFORMS to the real
# TPU tunnel (and a sitecustomize rewrites it to "axon,cpu" at interpreter
# start), so the env var alone is not enough — set the config directly.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import stoat_tpu.jaxconfig  # noqa: E402,F401  (enable x64 before any jax use)
