"""Resampling and colorspace edges.

Reference counterparts: UpsampleEdge / DownsampleEdge
(src/upsample_edge.*, src/downsample_edge.* [U]) and RGBToYUVEdge
(src/rgb_to_yuv_edge.* [U]). Upsample replicates each pixel factor^2
times; downsample averages factor x factor blocks (mutually transposed
up to the 1/factor^2 scale, matching the reference pair).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from convnet_tpu.ops.pool import avgpool2d


def upsample(x: jax.Array, factor: int) -> jax.Array:
    """Nearest-neighbor replication. x: (B, H, W, C) -> (B, H*f, W*f, C)."""
    return jnp.repeat(jnp.repeat(x, factor, axis=1), factor, axis=2)


def downsample(x: jax.Array, factor: int) -> jax.Array:
    """Block average. x: (B, H, W, C) -> (B, H/f, W/f, C)."""
    return avgpool2d(x, kernel=factor, stride=factor)


# ITU-R BT.601 full-range RGB -> YUV (the CImg convention the reference's
# image path uses [U]). numpy (not jnp): a module-level device array would
# initialize the backend at import time.
_RGB2YUV = np.array(
    [
        [0.299, -0.14713, 0.615],
        [0.587, -0.28886, -0.51499],
        [0.114, 0.436, -0.10001],
    ],
    dtype=np.float32,
)


def rgb_to_yuv(x: jax.Array) -> jax.Array:
    """x: (B, H, W, 3) RGB -> YUV."""
    return jnp.einsum(
        "bhwc,cd->bhwd", x.astype(jnp.float32), jnp.asarray(_RGB2YUV)
    ).astype(x.dtype)
