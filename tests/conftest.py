"""Test env: force CPU with 8 virtual devices so multi-chip sharding paths are
testable without a TPU slice (SURVEY.md §4 item 5).

The container's sitecustomize pre-imports jax and registers the axon TPU
plugin, so env-var tricks are too late; ``jax.config.update`` still works
because backend initialization is lazy. XLA_FLAGS must be appended before the
first ``jax.devices()`` call."""

import os

import jax

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()
jax.config.update("jax_platforms", "cpu")
