"""Test configuration: force an 8-device virtual CPU mesh.

Multi-chip hardware is unavailable here (one physical TPU v5e chip);
sharding logic is validated on virtual CPU devices per SURVEY.md §4.

Note: this environment's sitecustomize registers the `axon` TPU PJRT
plugin at interpreter startup and jax captures JAX_PLATFORMS from the
host env before conftest runs, so setting os.environ alone is NOT
enough — jax.config.update must override it before any backend is
initialized.

Set CONVNET_TEST_TPU=1 (`make test-tpu`) to leave the platform alone
and run the hardware-eligible subset against the real chip instead —
that is how the Pallas kernels (LRN, dropout) get validated compiled
rather than interpreted.
"""

import os

if os.environ.get("CONVNET_TEST_TPU", "") != "1":
    _flags = os.environ.get("XLA_FLAGS", "")
    if "--xla_force_host_platform_device_count" not in _flags:
        os.environ["XLA_FLAGS"] = (
            _flags + " --xla_force_host_platform_device_count=8"
        ).strip()
    os.environ["JAX_PLATFORMS"] = "cpu"

    import jax  # noqa: E402

    jax.config.update("jax_platforms", "cpu")
else:
    from convnet_tpu.trainer import enable_compilation_cache

    enable_compilation_cache()
