"""Test configuration: run everything on a virtual 8-device CPU mesh.

Multi-chip sharding is validated without TPU hardware via
``--xla_force_host_platform_device_count`` (the driver separately dry-runs the
multi-chip path; see ``__graft_entry__.py``).
"""
import os

# Force CPU: the session env pins JAX_PLATFORMS=axon (the TPU tunnel), which
# tests must never use — it is slow to connect and contended.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

# The axon plugin ignores the env var; the config update is what sticks.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
