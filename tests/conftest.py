"""Test configuration: run on a virtual 8-device CPU mesh.

The standard JAX fake-backend trick (SURVEY.md §4): multi-chip sharding code
paths are exercised on host CPU with `--xla_force_host_platform_device_count`.
Must run before jax is imported anywhere.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"  # force: the shell presets axon (TPU)
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

# The container's sitecustomize force-registers the axon TPU plugin and sets
# jax_platforms=axon; override it before any backend is initialised.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)
jax.config.update("jax_default_matmul_precision", "highest")
