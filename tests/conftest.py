"""Test configuration: run on a virtual 8-device CPU mesh with float64
available, so multi-chip sharding logic is exercised without TPU hardware
and solver/spline oracles can be checked at tight tolerance."""

import os

# Force CPU: the surrounding environment may pin JAX_PLATFORMS to a TPU
# backend (e.g. axon), which would route every tiny test compile through the
# device tunnel.  Tests exercise numerics + sharding on the host mesh.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_enable_x64", True)
