"""Shared Pallas-mode helpers.

Every Pallas op in this package runs interpret-mode on the CPU backend
(so the full test suite exercises kernel NUMERICS without TPU hardware)
and compiled Mosaic on TPU. Interpret mode, however, enforces none of
Mosaic's lowering rules — block-shape divisibility, VMEM limits — which
let two real lowering bugs reach the chip A/B queue (rounds 3 and 4).

`CONVNET_PALLAS_COMPILED=1` forces interpret=False even on CPU. Combined
with JAX's cross-platform lowering
(`jit(f).trace(...).lower(lowering_platforms=("tpu",))`), this lets the
CPU suite statically validate every kernel's Mosaic block plan with no
chip: tests/test_mosaic_lowering.py lowers the hot configs this way.
(It validates the Python-side Mosaic lowering only — the backend
compiler can still reject a kernel, which needs `make test-tpu`.)
"""

import os

import jax


def pallas_interpret() -> bool:
    """True when Pallas calls should run in interpret mode (CPU tests),
    unless CONVNET_PALLAS_COMPILED=1 forces real Mosaic lowering (used
    by the cross-platform lowering legality tests)."""
    if os.environ.get("CONVNET_PALLAS_COMPILED", "0") == "1":
        return False
    return jax.default_backend() == "cpu"
