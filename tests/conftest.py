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

# Persistent compilation cache (VERDICT r3 item 3): the fast suite is
# compile-bound (~10 min cold), and most programs recur run-to-run.  Caching
# compiled executables on disk cuts repeat runs to the execution time.
# Override the location with STORAGE_TPU_TEST_CACHE_DIR; set it empty to
# disable (e.g. when bisecting a suspected stale-cache miscompile).
_cache_dir = os.environ.get(
    "STORAGE_TPU_TEST_CACHE_DIR",
    os.path.join(os.path.dirname(__file__), os.pardir, ".jax_test_cache"),
)
if _cache_dir:
    jax.config.update("jax_compilation_cache_dir", os.path.abspath(_cache_dir))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    # XLA:CPU's AOT loader logs a (harmless, multi-KB) machine-feature
    # mismatch error for EVERY cache hit on this image — drown it out or the
    # suite output becomes unreadable.  Only while the cache is enabled.
    os.environ.setdefault("TF_CPP_MIN_LOG_LEVEL", "3")
