"""Test harness: run everything on a virtual 8-device CPU mesh.

The container's sitecustomize registers the axon (remote TPU) PJRT plugin
and forces jax_platforms="axon,cpu" via jax.config at interpreter start,
so an env var is not enough — we must override through jax.config before
any backend is initialized. Multi-device tests rely on
--xla_force_host_platform_device_count (SURVEY.md §4).
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
# Persistent compile cache: pipelines are rebuilt per test, and each
# instance's jit wrappers would recompile identical programs (~10 s per
# program on CPU) without it. Must be jax.config.update, not the env var
# (sitecustomize initializes JAX config first).
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_cpu")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
