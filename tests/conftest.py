"""Test harness configuration.

Tests run on a simulated 8-device CPU mesh so pjit/collective paths are
exercised honestly without TPU hardware (the driver separately dry-runs the
multi-chip path). Must set env vars before jax import.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = flags + " --xla_force_host_platform_device_count=8"
