"""Test harness configuration.

Tests run on a simulated 8-device CPU mesh so pjit/collective paths are
exercised honestly without TPU hardware (the driver separately dry-runs the
multi-chip path on the real platform).

The environment pins JAX_PLATFORMS=axon (the TPU tunnel); plain env-var
overrides are ignored, so we force the CPU platform through jax.config
before any backend initialization.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = flags + " --xla_force_host_platform_device_count=8"
os.environ["JAX_PLATFORMS"] = "cpu"

import jax

jax.config.update("jax_platforms", "cpu")
