"""Test configuration: force JAX onto a virtual 8-device CPU mesh so
multi-chip sharding tests run without TPU hardware."""

import os

# The container's sitecustomize registers the 'axon' TPU backend whenever
# PALLAS_AXON_POOL_IPS is set and pins JAX_PLATFORMS=axon; tests must run on
# a virtual 8-device CPU mesh, so drop both before jax is imported.
os.environ.pop("PALLAS_AXON_POOL_IPS", None)
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
