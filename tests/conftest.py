"""Test env: force CPU with 8 virtual devices so multi-chip sharding paths are
testable without a TPU slice (SURVEY.md §4 item 5). Must run before jax imports."""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()
