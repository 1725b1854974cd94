"""Per-edge SGD with momentum, L2 decay, and LR/momentum schedules.

Reference counterpart: EdgeWithWeight::UpdateWeights
(src/edge_with_weight.cc [U]) — cuda-convnet-style update, one
hyperparameter set per edge (weights and biases separately)::

    eps(t) = schedule(base_epsilon, t)
    mom(t) = initial + (final - initial) * min(1, t / transition)
    inc   <- mom(t) * inc - eps(t) * (grad + l2_decay * w)
    w     <- w + inc

The whole update is traced into the jit'd train step; schedules use
`jnp` math on the step counter so no recompilation happens per step.
Deliberately not optax: the reference's per-edge hyperparameters,
max-norm constraint, and start_optimization_after gating map more
directly onto an explicit pytree transform.
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp

from convnet_tpu.graph import DECAY, Graph, OptimSpec
from convnet_tpu.model import Params


def epsilon_at(spec: OptimSpec, t: jax.Array) -> jax.Array:
    ts = float(spec.epsilon_decay_timescale)
    base = spec.base_epsilon
    if spec.epsilon_decay == DECAY.NONE:
        return jnp.asarray(base, jnp.float32)
    if spec.epsilon_decay == DECAY.INVERSE_T:
        return base / (1.0 + t / ts)
    if spec.epsilon_decay == DECAY.EXPONENTIAL:
        return base * jnp.power(0.5, t / ts)
    if spec.epsilon_decay == DECAY.LINEAR:
        return base * jnp.maximum(0.0, 1.0 - t / ts)
    raise ValueError(f"unknown epsilon decay {spec.epsilon_decay}")


def momentum_at(spec: OptimSpec, t: jax.Array) -> jax.Array:
    ts = float(spec.momentum_transition_timescale)
    frac = jnp.minimum(1.0, t / ts)
    return spec.initial_momentum + (spec.final_momentum - spec.initial_momentum) * frac


def init_momentum(params: Params) -> Params:
    return jax.tree.map(jnp.zeros_like, params)


def _update_leaf(spec: OptimSpec, w, m, g, t):
    g = g + spec.l2_decay * w
    if spec.gradient_clip > 0.0:
        norm = jnp.sqrt(jnp.sum(g * g))
        g = g * jnp.minimum(1.0, spec.gradient_clip / (norm + 1e-12))
    inc = momentum_at(spec, t) * m - epsilon_at(spec, t) * g
    new_w = w + inc
    if spec.weight_norm_limit > 0.0 and w.ndim >= 2:
        # Max-norm constraint on each output unit's incoming weight vector
        # (dropout-paper regularizer; last axis indexes output units).
        axes = tuple(range(w.ndim - 1))
        norms = jnp.sqrt(jnp.sum(new_w * new_w, axis=axes, keepdims=True))
        new_w = new_w * jnp.minimum(1.0, spec.weight_norm_limit / (norms + 1e-12))
    if spec.start_optimization_after > 0:
        frozen = t < spec.start_optimization_after
        new_w = jnp.where(frozen, w, new_w)
        inc = jnp.where(frozen, m, inc)
    return new_w, inc


def apply_updates(
    graph: Graph, params: Params, moms: Params, grads: Params, step: jax.Array
) -> Tuple[Params, Params]:
    """One SGD step over every weighted edge. `step` is a traced int32."""
    t = step.astype(jnp.float32)
    new_params: Dict = {}
    new_moms: Dict = {}
    for e in graph.weighted_edges:
        p, m, g = params[e.name], moms[e.name], grads[e.name]
        nw, nmw = _update_leaf(e.weight_optimizer, p["w"], m["w"], g["w"], t)
        nb, nmb = _update_leaf(e.bias_optimizer, p["b"], m["b"], g["b"], t)
        new_params[e.name] = {"w": nw, "b": nb}
        new_moms[e.name] = {"w": nmw, "b": nmb}
    return new_params, new_moms
