"""Test config: run on CPU with 8 virtual devices for sharding tests.

Must set env vars before the first `import jax` anywhere in the test
process, which pytest guarantees by importing conftest first.
"""

import os

# Force CPU: the session may export JAX_PLATFORMS=axon (tunneled TPU), but
# unit tests must be fast, deterministic and able to fake an 8-device mesh.
os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
  os.environ["XLA_FLAGS"] = (
      _flags + " --xla_force_host_platform_device_count=8").strip()

# The environment pre-imports jax and programmatically selects the 'axon'
# (TPU tunnel) platform, overriding JAX_PLATFORMS — override it back.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
