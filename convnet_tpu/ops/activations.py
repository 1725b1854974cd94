"""Layer nonlinearities (reference: Layer::ApplyActivation, src/layer.cc [U]).

Derivatives (reference: ApplyDerivativeOfActivation) follow the
reference's convention of differentiating THROUGH THE OUTPUT where
possible: cuda-convnet's RECTIFIED_LINEAR deriv is `g * (y > 0)` and
LOGISTIC is `g * y * (1 - y)` — both functions of the activation
output alone. Matching that here (custom VJPs) is also the
memory-optimal choice on TPU: `jnp.maximum(x, 0)`'s autodiff VJP
residual is the PRE-activation x, while every downstream consumer
(the next edge's weight gradient) saves the output y — so XLA
materialized BOTH full-size tensors per ReLU layer (measured ~3 ms/
step on AlexNet batch 1024). With the output-based VJP the residual
IS y and only one tensor exists.
"""

from __future__ import annotations


import jax
import jax.numpy as jnp

from convnet_tpu.graph import ACT


@jax.custom_vjp
def relu(x: jax.Array) -> jax.Array:
    return jnp.maximum(x, 0)


def _relu_fwd(x):
    y = jnp.maximum(x, 0)
    return y, y


def _relu_bwd(y, g):
    # reference semantics (deriv_of_activation, src/layer.cc [U]):
    # mask by the OUTPUT; at the kink (x == 0) the subgradient is 0,
    # matching cuda-convnet (jnp.maximum's autodiff passes g there)
    return (jnp.where(y > 0, g, jnp.zeros_like(g)),)


relu.defvjp(_relu_fwd, _relu_bwd)


@jax.custom_vjp
def sigmoid(x: jax.Array) -> jax.Array:
    return jax.nn.sigmoid(x)


def _sigmoid_fwd(x):
    y = jax.nn.sigmoid(x)
    return y, y


def _sigmoid_bwd(y, g):
    # reference: g * y * (1 - y) — output-based, same residual economy
    return (g * y * (1.0 - y),)


sigmoid.defvjp(_sigmoid_fwd, _sigmoid_bwd)


@jax.custom_vjp
def tanh(x: jax.Array) -> jax.Array:
    return jnp.tanh(x)


def _tanh_fwd(x):
    y = jnp.tanh(x)
    return y, y


def _tanh_bwd(y, g):
    return (g * (1.0 - y * y),)


tanh.defvjp(_tanh_fwd, _tanh_bwd)


def apply_activation(x: jax.Array, activation: int) -> jax.Array:
    if activation == ACT.LINEAR:
        return x
    if activation == ACT.LOGISTIC:
        return sigmoid(x)
    if activation == ACT.RECTIFIED_LINEAR:
        return relu(x)
    if activation == ACT.SOFTMAX:
        # Channel softmax (stable). Output layers also keep their logits for
        # the loss — see convnet_tpu.model.
        return jax.nn.softmax(x, axis=-1)
    if activation == ACT.TANH:
        return tanh(x)
    raise ValueError(f"unknown activation {activation}")
