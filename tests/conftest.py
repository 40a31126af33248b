"""Test config: run on a virtual 8-device CPU mesh so sharding tests work
anywhere (the reference has no test suite at all; SURVEY.md section 4 defines
the pyramid this suite implements)."""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

# The axon TPU plugin ignores the JAX_PLATFORMS env var; jax.config wins.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)
