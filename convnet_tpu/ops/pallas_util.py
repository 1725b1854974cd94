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


def mesh_dp(mesh) -> int:
    """Size of the mesh's data axis (1 for no mesh)."""
    return 1 if mesh is None else mesh.shape.get("data", 1)


def shmap(fn, mesh, in_specs, out_specs):
    """shard_map with replication checking off.

    Every Pallas kernel in this package is batch-parallel (the LRN
    window spans channels only; the jitter/s2d relayout is per-image),
    so a non-trivial mesh runs them per-shard under shard_map over the
    "data" axis — this is how the multi-chip path keeps the single-chip
    kernels (the reference ran identical kernels on every GPU of its
    model split, src/multigpu_convnet.cc [U]). Checking is off because
    pallas_call carries no sharding/vma rule; callers stack or psum any
    cross-shard reductions themselves (see the LRN bias gradient)."""
    try:
        return jax.shard_map(
            fn, mesh=mesh, in_specs=in_specs, out_specs=out_specs,
            check_vma=False,
        )
    except (TypeError, AttributeError):  # older jax: no jax.shard_map / check_rep spelling
        from jax.experimental.shard_map import shard_map as _shard_map

        return _shard_map(
            fn, mesh=mesh, in_specs=in_specs, out_specs=out_specs,
            check_rep=False,
        )
