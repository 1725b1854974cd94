"""Layer nonlinearities (reference: Layer::ApplyActivation, src/layer.cc [U]).

Derivatives (reference: ApplyDerivativeOfActivation) come from JAX
autodiff; these functions only define the forward map. All are
elementwise VPU work that XLA fuses into the neighboring matmul/conv.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from convnet_tpu.graph import ACT


def apply_activation(x: jax.Array, activation: int) -> jax.Array:
    if activation == ACT.LINEAR:
        return x
    if activation == ACT.LOGISTIC:
        return jax.nn.sigmoid(x)
    if activation == ACT.RECTIFIED_LINEAR:
        return jnp.maximum(x, 0)
    if activation == ACT.SOFTMAX:
        # Channel softmax (stable). Output layers also keep their logits for
        # the loss — see convnet_tpu.model.
        return jax.nn.softmax(x, axis=-1)
    if activation == ACT.TANH:
        return jnp.tanh(x)
    raise ValueError(f"unknown activation {activation}")
