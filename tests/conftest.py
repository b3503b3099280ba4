"""Test configuration: force the CPU backend with 8 virtual devices so
multi-chip sharding (parallel/) is exercised without TPU hardware —
the analog of the reference testing cluster paths via loopback mtssrv
(src/mitsuba/mtssrv.cpp:202).

NOTE: the JAX_PLATFORMS env var is overridden by the environment's PJRT
bootstrap (sitecustomize registers the TPU plugin); jax.config.update is
the reliable way to pin the platform.
"""
import os

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache_mitsuba_tpu")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "float32")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
