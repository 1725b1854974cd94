"""Output-layer losses and error metrics.

Reference counterpart: Layer::ComputeDeriv + error accumulation in the
output layers (src/layer.cc [U]). The reference computes the loss
*derivative* directly (e.g. softmax CE deriv = probs - target); the
rebuild defines scalar losses and lets JAX autodiff produce exactly
those derivatives — tests assert the equivalence.

All losses take pre-activation logits (numerically stable log-softmax /
log-sigmoid forms) and int or float targets, and return the *sum* over
the batch; the trainer divides by batch size, matching the reference's
scale-by-1/batch in UpdateWeights [U].
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from convnet_tpu.graph import LOSS


def softmax_cross_entropy(logits: jax.Array, labels: jax.Array) -> jax.Array:
    """logits: (B, K); labels: (B,) int class ids -> scalar sum of CE."""
    logp = jax.nn.log_softmax(logits, axis=-1)
    picked = jnp.take_along_axis(logp, labels[:, None].astype(jnp.int32), axis=-1)
    return -jnp.sum(picked)


def binary_cross_entropy(logits: jax.Array, targets: jax.Array) -> jax.Array:
    """logits: (B, K); targets in [0,1] -> scalar sum of per-unit BCE."""
    # log(sigmoid(x)) = -softplus(-x); log(1-sigmoid(x)) = -softplus(x)
    return jnp.sum(
        targets * jax.nn.softplus(-logits) + (1.0 - targets) * jax.nn.softplus(logits)
    )


def squared_error(pred: jax.Array, targets: jax.Array) -> jax.Array:
    """0.5 * sum of squared differences (reference SQUARED_ERROR [U])."""
    return 0.5 * jnp.sum((pred - targets) ** 2)


def compute_loss(loss_function: int, logits: jax.Array, target: jax.Array) -> jax.Array:
    if loss_function == LOSS.CROSS_ENTROPY_MULTINOMIAL:
        return softmax_cross_entropy(logits, target)
    if loss_function == LOSS.CROSS_ENTROPY_BINARY:
        return binary_cross_entropy(logits, target)
    if loss_function == LOSS.SQUARED_ERROR:
        return squared_error(logits, target)
    raise ValueError(f"unsupported loss function {loss_function}")


def classification_errors(logits: jax.Array, labels: jax.Array) -> jax.Array:
    """Number of top-1 mistakes in the batch (reference's error metric [U])."""
    pred = jnp.argmax(logits, axis=-1)
    return jnp.sum(pred != labels.astype(pred.dtype))
