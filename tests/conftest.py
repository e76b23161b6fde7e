"""Test harness: force an 8-device virtual CPU mesh before jax initializes.

This is the JAX-native fake-backend trick the torch reference lacks
(SURVEY.md §4): multi-chip sharding code is exercised on N virtual CPU
devices via --xla_force_host_platform_device_count.

Note: this image registers an `axon` TPU-tunnel PJRT plugin from
sitecustomize and pins JAX_PLATFORMS=axon, so plain env overrides are not
enough — we must force the platform through jax.config before any backend
initializes (XLA_FLAGS still has to be in the env at backend-init time).
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
  os.environ["XLA_FLAGS"] = (
      flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)

assert len(jax.devices()) == 8, jax.devices()
