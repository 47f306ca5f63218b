"""Test config: force CPU platform with 8 virtual devices so pjit/mesh tests
run without TPU hardware (SURVEY.md §4 'Distributed without a cluster')."""

import os

# Hard override: the axon sitecustomize force-registers the TPU backend and
# sets JAX_PLATFORMS=axon; tests must run on the virtual-device CPU mesh.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402  (import after env is set)

jax.config.update("jax_platform_name", "cpu")
# authoritative: prevent backends() from creating the remote-TPU (axon)
# client at all — the suite is CPU-only and must not depend on (or queue
# behind) the tunnel's client slots
jax.config.update("jax_platforms", "cpu")

# Persistent compile cache: the 640px golden-parity tests compile v8x-sized
# fp64 programs (~5-10 min each on this 1-core host) — cache them across
# pytest runs. Only programs that took >5s to compile are stored.
_CACHE = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                      ".jax_cache")
jax.config.update("jax_compilation_cache_dir", _CACHE)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
