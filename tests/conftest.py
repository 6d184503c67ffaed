"""Test harness setup: run JAX on CPU with 8 virtual devices so multi-chip
sharding paths compile and execute without TPU hardware (SURVEY.md §4).

Note: this environment pre-imports jax with a TPU platform via
sitecustomize, so env vars alone are too late — the platform must be
switched through jax.config before the first backend initialisation.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)
