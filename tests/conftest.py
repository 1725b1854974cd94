"""Test configuration: force an 8-device virtual CPU mesh.

Multi-chip hardware is unavailable here (one physical TPU v5e chip);
sharding logic is validated on virtual CPU devices per SURVEY.md §4.
These env vars must be set before jax is first imported anywhere.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "--xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()
