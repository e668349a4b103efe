"""Test configuration: force JAX onto a virtual 8-device CPU mesh so
multi-chip sharding tests run without TPU hardware.

The container's sitecustomize (axon relay) imports jax and pins the 'axon'
TPU backend at interpreter start — BEFORE this file runs — so mutating
os.environ here is too late. jax.config.update is authoritative at backend
init time (backends initialize lazily at first device use), so we set the
platform through the config API instead.
"""

import os
import sys

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    flags = (flags + " --xla_force_host_platform_device_count=8").strip()
if "xla_cpu_collective_timeout_seconds" not in flags:
    # 8 virtual devices time-share the host CPUs; under load the default
    # collective-rendezvous timeout can fire and ABORT the process
    # ("Exiting to ensure a consistent program state")
    flags = (flags + " --xla_cpu_collective_timeout_seconds=1200").strip()
os.environ["XLA_FLAGS"] = flags

import jax

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
# test-local helper modules (fixtures.py, torch_ref_model.py)
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
