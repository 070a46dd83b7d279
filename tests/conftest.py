"""Test harness config: force CPU with 8 virtual devices (SURVEY.md §5).

This environment's sitecustomize registers a TPU-tunnel ("axon") PJRT plugin
at interpreter startup and pins ``jax_platforms`` via jax.config — which
overrides the JAX_PLATFORMS env var. So tests must (a) set the XLA flag for 8
virtual CPU devices before backends initialize and (b) force the platform
back to cpu through jax.config, not the environment.
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
