"""Test configuration: force CPU backend with 8 virtual devices.

JAX CPU is the fake-TPU for tests (SURVEY.md par.4); multi-chip sharding
tests use the 8 virtual devices.
"""
import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
