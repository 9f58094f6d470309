"""Test configuration: force an 8-virtual-device CPU backend.

Multi-chip sharding tests run on a virtual CPU mesh (the standard JAX
fake-multi-device trick); the environment variables must be set before JAX
initializes its backends, hence this conftest.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

# jax may already be imported by a pytest plugin with JAX_PLATFORMS from the
# outer environment (e.g. a TPU backend); override through the config too.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
