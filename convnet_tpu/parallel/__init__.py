"""Parallelism over a TPU device mesh.

Reference counterpart: MultiGPUConvNet (src/multigpu_convnet.cc [U]) —
model-split layers pinned to GPU ids with cudaMemcpy at boundaries.
TPU-native replacement: a `jax.sharding.Mesh` with a `data` axis (batch
sharding; XLA all-reduces gradients over ICI) and a `model` axis (unit/
channel sharding of the big FC edges; XLA inserts the boundary
collectives GSPMD-style). No hand-written communication: shardings are
declared, collectives are compiler-inserted.
"""

from convnet_tpu.parallel.mesh import (  # noqa: F401
    make_mesh,
    batch_sharding,
    param_shardings,
    state_shardings,
)
