"""TPU-native op library.

The reference's math backends — cudamat GEMM/elementwise
(cudamat/cudamat.cu [U]), the cuda-convnet conv/pool/LRN kernels
(cudamat/cudamat_conv*.cu [U]) and the eigenmat CPU mirror
(eigenmat/ [U]) — collapse into this package: XLA primitives on the
MXU for conv/GEMM/pool, a fused Pallas kernel (with custom VJP) for
cross-map response normalization, and jax.numpy for elementwise work.
Gradient kernels (convDown/convOutp, MaxPoolUndo, ResponseNormUndo)
come from JAX autodiff of the forward primitives — the hand-written
backward passes survive only as numerics parity targets in tests.
"""

from convnet_tpu.ops.activations import apply_activation  # noqa: F401
from convnet_tpu.ops.conv import conv2d, conv_onetoone, ceil_mode_padding  # noqa: F401
from convnet_tpu.ops.pool import maxpool2d  # noqa: F401
from convnet_tpu.ops.lrn import response_norm_cross_map  # noqa: F401
from convnet_tpu.ops.local import local_conv2d  # noqa: F401
from convnet_tpu.ops.resample import upsample, downsample, rgb_to_yuv  # noqa: F401
from convnet_tpu.ops import losses  # noqa: F401
