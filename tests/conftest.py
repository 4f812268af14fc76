"""Test configuration.

Tests run on a virtual 8-device CPU mesh so multi-chip sharding paths are
exercised without TPU hardware (see SURVEY.md §4.3).

Note: this image's sitecustomize imports jax and registers a TPU-tunnel
backend before conftest runs, so setting ``JAX_PLATFORMS`` via ``os.environ``
here is too late — the config must be updated through the jax API instead
(backends have not been initialised yet at conftest time, so this is safe).
"""
import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)
