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
