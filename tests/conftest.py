"""Test configuration: force the CPU backend with 8 virtual devices.

JAX CPU is the fake-TPU for tests (SURVEY.md §4); multi-chip sharding tests
use the 8 virtual devices. NOTE: this environment's JAX build ignores the
JAX_PLATFORMS env var (an `axon` TPU-tunnel platform is pre-registered and
op-by-op dispatch through it costs ~1s/op) — `jax.config.update` is the only
reliable way to pin the CPU backend, and it must run before any backend use.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
