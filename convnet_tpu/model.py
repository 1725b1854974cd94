"""Model builder: Graph IR -> pure functions.

Reference counterpart: ConvNet::{BuildNet, AllocateMemory, Fprop}
(src/convnet.cc [U]). Where the reference walks a mutable C++ object
DAG calling Edge::ComputeUp per step, the rebuild *compiles* the graph
once into a pure ``apply(params, batch)`` closure that XLA traces and
fuses end-to-end; Bprop (Edge::ComputeDown + weight grads [U]) is
``jax.grad`` of the loss.

Params pytree layout::

    params = {edge_name: {"w": ..., "b": ...}, ...}   # weighted edges only

All layer states are NHWC ``(B, H, W, C)``; FC outputs are
``(B, 1, 1, units)``. Mixed precision: params live in float32; when
``graph.compute_dtype == "bfloat16"`` the conv/matmul operands are cast
to bfloat16 with float32 MXU accumulation.
"""

from __future__ import annotations

import math
from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from convnet_tpu.graph import ACT, ET, INIT, LOSS, EdgeSpec, Graph
from convnet_tpu.ops import losses as losses_ops
from convnet_tpu.ops.activations import apply_activation
from convnet_tpu.ops.conv import conv2d, conv_onetoone, fc
from convnet_tpu.ops.dropout import dropout as dropout_op
from convnet_tpu.ops.fused_pool_lrn import (
    fusion_applicable,
    lrn_maxpool,
    lrn_maxpool_bias,
    pool_lrn_fusion_wanted,
)
from convnet_tpu.ops.local import local_conv2d, local_weight_shape
from convnet_tpu.ops.lrn import (
    lrn_bias_fusion_wanted,
    response_norm_cross_map,
    response_norm_cross_map_bias,
)
from convnet_tpu.ops.pool import maxpool2d
from convnet_tpu.ops.resample import downsample, rgb_to_yuv, upsample

Params = Dict[str, Dict[str, jax.Array]]


# ---------------------------------------------------------------------------
# Parameter initialization (reference: EdgeWithWeight init modes [U])
# ---------------------------------------------------------------------------


def _weight_shape(graph: Graph, e: EdgeSpec) -> Tuple[int, ...]:
    src_h, src_w, src_c = graph.shapes[e.source]
    dst_h, dst_w, dst_c = graph.shapes[e.dest]
    if e.edge_type == ET.FC:
        return (src_h * src_w * src_c, dst_c)
    if e.edge_type == ET.CONV:
        # grouped conv (num_groups > 1): per-group input channels, HWIO
        return (e.kernel_size, e.kernel_size, src_c // e.num_groups, dst_c)
    if e.edge_type == ET.CONV_ONETOONE:
        return (src_c, dst_c)
    if e.edge_type == ET.LOCAL:
        return local_weight_shape(dst_h, dst_w, e.kernel_size, src_c, dst_c)
    raise ValueError(f"edge {e.name} has no weights")


def _bias_shape(graph: Graph, e: EdgeSpec) -> Tuple[int, ...]:
    dst_h, dst_w, dst_c = graph.shapes[e.dest]
    if e.edge_type in (ET.CONV, ET.LOCAL) and not e.shared_bias:
        return (dst_h, dst_w, dst_c)
    return (dst_c,)


def param_shapes(graph: Graph) -> Dict[str, Dict[str, Tuple[int, ...]]]:
    """{edge: {"w": shape, "b": shape}} — feeds checkpoint.load's
    layout auto-detection (transposed/flattened upstream variants)."""
    return {
        e.name: {"w": _weight_shape(graph, e), "b": _bias_shape(graph, e)}
        for e in graph.weighted_edges
    }


def _fan_in(shape: Tuple[int, ...]) -> int:
    # all weight layouts here contract over every dim except the last
    return int(np.prod(shape[:-1]))


def _init_weight(rng: jax.Array, e: EdgeSpec, shape) -> jax.Array:
    kind = e.initialization
    scale = e.init_wt
    if kind == INIT.CONSTANT:
        return jnp.full(shape, scale, jnp.float32)
    if kind == INIT.DENSE_GAUSSIAN:
        return scale * jax.random.normal(rng, shape, jnp.float32)
    if kind == INIT.DENSE_GAUSSIAN_SQRT_FAN_IN:
        return (scale / math.sqrt(_fan_in(shape))) * jax.random.normal(rng, shape, jnp.float32)
    if kind == INIT.DENSE_UNIFORM:
        return jax.random.uniform(rng, shape, jnp.float32, -scale, scale)
    if kind == INIT.DENSE_UNIFORM_SQRT_FAN_IN:
        lim = scale / math.sqrt(_fan_in(shape))
        return jax.random.uniform(rng, shape, jnp.float32, -lim, lim)
    if kind == INIT.SPARSE_GAUSSIAN:
        # Sparse init (Martens-style): ~sqrt(fan_in) nonzero inputs per unit.
        k1, k2 = jax.random.split(rng)
        w = scale * jax.random.normal(k1, shape, jnp.float32)
        keep_p = 1.0 / math.sqrt(_fan_in(shape))
        mask = jax.random.bernoulli(k2, keep_p, shape)
        return jnp.where(mask, w, 0.0)
    if kind == INIT.PRETRAINED:
        # resolved by the trainer via checkpoint loading; gaussian placeholder
        return scale * jax.random.normal(rng, shape, jnp.float32)
    raise ValueError(f"unknown initialization {kind}")


def init_params(graph: Graph, seed: Optional[int] = None) -> Params:
    """Allocate and initialize all weighted-edge parameters."""
    root = jax.random.PRNGKey(graph.seed if seed is None else seed)
    params: Params = {}
    for i, e in enumerate(graph.weighted_edges):
        rng = jax.random.fold_in(root, i)
        params[e.name] = {
            "w": _init_weight(rng, e, _weight_shape(graph, e)),
            "b": jnp.full(_bias_shape(graph, e), e.init_bias, jnp.float32),
        }
    # PRETRAINED edges are overwritten from their HDF5 checkpoint.
    pretrained = [e for e in graph.weighted_edges if e.initialization == INIT.PRETRAINED]
    if pretrained:
        from convnet_tpu import checkpoint as ckpt

        for e in pretrained:
            if not e.pretrained_model:
                raise ValueError(f"edge {e.name}: PRETRAINED init without pretrained_model")
            loaded = ckpt.load_edge(
                e.pretrained_model,
                e.pretrained_edge_name or e.name,
                expected_shape=_weight_shape(graph, e),
            )
            params[e.name] = {k: jnp.asarray(v) for k, v in loaded.items()}
    return params


# ---------------------------------------------------------------------------
# Forward
# ---------------------------------------------------------------------------


def _edge_fprop(
    graph: Graph, e: EdgeSpec, p: Optional[Dict], x: jax.Array, cdt,
    fuse_relu: bool = False,
    defer_bias: bool = False,
    bias=None,
    mesh=None,
):
    t = e.edge_type
    # weighted edges return compute_dtype when set (pure-bf16 chain: the
    # epilogue and next edge consume it, cotangents stay bf16 too); the
    # bias is cast to match so the add never silently upcasts the tensor
    if t == ET.FC:
        z = fc(x, p["w"], compute_dtype=cdt)
        z = z + p["b"].astype(z.dtype)
        return z[:, None, None, :]
    if t == ET.CONV:
        z = conv2d(
            x, p["w"], e.stride, e.padding, compute_dtype=cdt,
            groups=e.num_groups,
        )
        if defer_bias:
            # bias applied (and differentiated) by the consuming
            # bias-fused response-norm edge — see apply_fn
            return z
        return z + p["b"].astype(z.dtype)
    if t == ET.CONV_ONETOONE:
        z = conv_onetoone(x, p["w"], compute_dtype=cdt)
        return z + p["b"].astype(z.dtype)
    if t == ET.LOCAL:
        z = local_conv2d(x, p["w"], e.stride, e.padding, e.kernel_size, compute_dtype=cdt)
        return z + p["b"].astype(z.dtype)
    if t == ET.MAXPOOL:
        return maxpool2d(x, e.kernel_size, e.stride, e.padding, mesh=mesh)
    if t == ET.RESPONSE_NORM:
        # the Pallas LRN kernels run under any RESOLVED mesh: ops/lrn.py
        # shard_maps them over the "data" axis (the op is batch-parallel),
        # so multi-chip runs keep the single-chip fast path — the
        # reference's model split ran identical kernels on every GPU
        # (src/multigpu_convnet.cc [U])
        if bias is not None:
            # the producing conv's deferred bias: added in-kernel, and
            # its gradient comes out of the backward kernel's per-tile
            # sums instead of an XLA re-read of dz (ops/lrn.py)
            return response_norm_cross_map_bias(
                x,
                bias,
                e.add_scale,
                e.pow_scale,
                e.frac_of_filters_response_norm,
                e.response_norm_blocked,
                backend="auto",
                fuse_relu=fuse_relu,
                mesh=mesh,
            )
        return response_norm_cross_map(
            x,
            e.add_scale,
            e.pow_scale,
            e.frac_of_filters_response_norm,
            e.response_norm_blocked,
            backend="auto",
            fuse_relu=fuse_relu,
            mesh=mesh,
        )
    if t == ET.UPSAMPLE:
        return upsample(x, e.sample_factor)
    if t == ET.DOWNSAMPLE:
        return downsample(x, e.sample_factor)
    if t == ET.RGBTOYUV:
        return rgb_to_yuv(x)
    raise ValueError(f"unknown edge type {t}")


def apply_fn(
    graph: Graph,
    params: Params,
    batch: Dict[str, jax.Array],
    *,
    train: bool = False,
    dropout_rng: Optional[jax.Array] = None,
    return_layers: Optional[List[str]] = None,
    mesh=None,
) -> Dict[str, jax.Array]:
    """Run fprop. `batch` maps each input layer's data_field to a
    (B, H, W, C) array. Returns {layer_name: activation} for
    `return_layers` (default: all layers) plus "<name>:preact" for
    output layers (the logits the losses consume). mesh: the RESOLVED
    device mesh (None single-device) — the Pallas LRN/bias-fusion paths
    shard_map over its "data" axis so sharded runs keep the kernels."""
    cdt = jnp.bfloat16 if graph.compute_dtype == "bfloat16" else None
    # storage dtype: activations (the backward pass's residuals) kept in
    # bf16 halve HBM residual traffic; f32 by default. When compute_dtype
    # is bf16 but activation_dtype isn't, the edge outputs (bf16) are
    # upcast at the layer boundary so downstream layers see f32 — the
    # fully fused bf16 chain needs both knobs on (the bench configs do).
    adt = jnp.bfloat16 if graph.activation_dtype == "bfloat16" else None
    store_dt = adt if adt is not None else (jnp.float32 if cdt is not None else None)
    acts: Dict[str, jax.Array] = {}
    preacts: Dict[str, jax.Array] = {}  # pre-ReLU values for LRN fusion
    out: Dict[str, jax.Array] = {}
    want = set(return_layers) if return_layers is not None else None

    for l in graph.input_layers:
        if l.data_field not in batch:
            raise ValueError(
                f"input layer {l.name!r} expects data field {l.data_field!r} "
                f"but the batch has {sorted(batch)} — check the data config's "
                "layer_name / the layer's data_field"
            )
        x = batch[l.data_field]
        from convnet_tpu.ops.conv import S2DInput

        if not isinstance(x, S2DInput) and x.ndim != 4:
            raise ValueError(f"input {l.name}: expected NHWC, got shape {x.shape}")
        acts[l.name] = x

    # LRN->maxpool backward fusion (opt-in, see ops/fused_pool_lrn.py):
    # an LRN layer whose sole consumer is a maxpool is not materialized
    # here; the pool's edge emits lrn_maxpool over the LRN's input, whose
    # custom VJP runs pool-undo + LRN-backward as ONE Pallas pass.
    # FROZEN single-device-only (round-5 disposition, docs/performance.md):
    # measured -4.4 ms as-built, so it gets no shard_map wiring — a mesh
    # keeps the unfused chain.
    fuse_pool_lrn = train and pool_lrn_fusion_wanted() and mesh is None
    deferred_lrn: Dict[str, Tuple[EdgeSpec, jax.Array, bool]] = {}

    # Bias deferral (opt-in, see ops/lrn.py response_norm_cross_map_bias):
    # a conv layer whose preact feeds exactly one response-norm edge has
    # its bias added INSIDE the LRN kernel (or the fused pool+LRN kernel
    # when that path is active), whose backward then emits the bias
    # gradient from in-VMEM tile sums — without this XLA re-reads the
    # full dz from HBM just to sum it (1.3 ms/step on AlexNet @1024).
    # Static plan: layer name -> its single incoming conv edge. Under a
    # mesh the bias-fused kernels run per-shard via shard_map (ops/lrn.py),
    # so the deferral stays on.
    defer_bias: Dict[str, EdgeSpec] = {}
    if lrn_bias_fusion_wanted():
        for name in graph.topo_layer_order():
            l = graph.layer(name)
            inc = graph.incoming(name)
            cons = [e2 for e2 in graph.edges if e2.source == name]
            if (
                not l.is_input
                and not l.is_output
                and l.activation == ACT.RECTIFIED_LINEAR
                and l.dropprob == 0.0
                and len(inc) == 1
                and inc[0].edge_type == ET.CONV
                and len(cons) == 1
                and cons[0].edge_type == ET.RESPONSE_NORM
            ):
                defer_bias[name] = inc[0]
    pending_bias: Dict[str, jax.Array] = {}

    drop_i = 0
    for name in graph.topo_layer_order():
        l = graph.layer(name)
        if not l.is_input:
            inc = graph.incoming(name)
            consumers = [e2 for e2 in graph.edges if e2.source == name]
            if (
                fuse_pool_lrn
                and len(inc) == 1
                and inc[0].edge_type == ET.RESPONSE_NORM
                and l.activation == ACT.LINEAR
                and l.dropprob == 0.0
                and not l.is_output
                and len(consumers) == 1
                and consumers[0].edge_type == ET.MAXPOOL
                and want is not None
                and name not in want
                and fusion_applicable(
                    acts[inc[0].source].shape, consumers[0].padding
                )
            ):
                e = inc[0]
                frelu = e.source in preacts
                deferred_lrn[name] = (
                    e, preacts[e.source] if frelu else acts[e.source], frelu
                )
                drop_i += 1
                continue
            z = None
            for e in graph.incoming(name):
                if e.source in deferred_lrn:
                    le, x_src, frelu = deferred_lrn[e.source]
                    lb = pending_bias.get(le.source)
                    if lb is not None:
                        contrib = lrn_maxpool_bias(
                            x_src,
                            lb,
                            le.add_scale,
                            le.pow_scale,
                            le.frac_of_filters_response_norm,
                            le.response_norm_blocked,
                            e.kernel_size,
                            e.stride,
                            e.padding,
                            frelu,
                        )
                    else:
                        contrib = lrn_maxpool(
                            x_src,
                            le.add_scale,
                            le.pow_scale,
                            le.frac_of_filters_response_norm,
                            le.response_norm_blocked,
                            e.kernel_size,
                            e.stride,
                            e.padding,
                            frelu,
                        )
                    z = contrib if z is None else z + contrib
                    continue
                p = params.get(e.name)
                if p is None and e.has_weights:
                    raise ValueError(
                        f"no parameters for edge {e.name!r} — checkpoint/params "
                        f"provide {sorted(params)} (wrong checkpoint for this model?)"
                    )
                # ReLU+LRN fusion: feed the response-norm edge the
                # source's PRE-activation and apply the ReLU inside the
                # kernel — the relu output then never materializes in
                # HBM (its VJP residual is the conv output that already
                # exists). See response_norm_cross_map(fuse_relu=...).
                x_in = acts[e.source]
                fuse = (
                    e.edge_type == ET.RESPONSE_NORM
                    and e.source in preacts
                )
                if fuse:
                    x_in = preacts[e.source]
                dbias = name in defer_bias and e.name == defer_bias[name].name
                lrn_bias = pending_bias.get(e.source) if fuse else None
                if graph.remat and train and e.has_weights:
                    # rematerialize: recompute this edge's output in the
                    # backward pass instead of storing it (Model.remat;
                    # trades FLOPs for HBM on big models/batches)
                    fprop = jax.checkpoint(
                        lambda pp, xx, _e=e, _d=dbias: _edge_fprop(
                            graph, _e, pp, xx, cdt, defer_bias=_d, mesh=mesh
                        )
                    )
                    contrib = fprop(p, x_in)
                else:
                    contrib = _edge_fprop(
                        graph, e, p, x_in, cdt, fuse_relu=fuse,
                        defer_bias=dbias, bias=lrn_bias, mesh=mesh,
                    )
                if dbias:
                    pending_bias[name] = p["b"]
                z = contrib if z is None else z + contrib
            if l.is_output:
                # losses and output activations run in >= f32
                # (softmax/log stability; extract-CLI feature parity;
                # promote — never downcast the x64 grad-check path)
                z = z.astype(jnp.promote_types(z.dtype, jnp.float32))
                out[f"{name}:preact"] = z.reshape(z.shape[0], -1)
            if name in pending_bias:
                # preact stores the bias-less conv output; the consuming
                # bias-fused LRN edge adds it in-kernel. This activation
                # (bias re-added here) is dead code when the LRN is the
                # sole consumer — XLA eliminates it.
                a = apply_activation(
                    z + pending_bias[name].astype(z.dtype), l.activation
                )
            else:
                a = apply_activation(z, l.activation)
            if (
                l.activation == ACT.RECTIFIED_LINEAR
                and not l.is_output
                and l.dropprob == 0.0
            ):
                preacts[name] = z
            if train and l.dropprob > 0.0:
                if dropout_rng is None:
                    raise ValueError("train=True with dropout needs dropout_rng")
                # inverted dropout; hardware-PRNG kernel on TPU with a
                # mask-recompute VJP (zero residual) — ops/dropout.py
                a = dropout_op(a, l.dropprob, jax.random.fold_in(dropout_rng, drop_i))
            drop_i += 1
            acts[name] = a.astype(store_dt) if store_dt is not None else a
        if want is None or name in want:
            out[name] = acts[name]
    return out


def loss_fn(
    graph: Graph,
    params: Params,
    batch: Dict[str, jax.Array],
    *,
    train: bool = True,
    dropout_rng: Optional[jax.Array] = None,
    mesh=None,
):
    """Mean loss over the batch + aux metrics.

    Targets live in `batch` keyed by each output layer's data_field
    (e.g. "labels"). Returns (loss, {"errors": n_mistakes, ...}).
    """
    outs = apply_fn(
        graph, params, batch, train=train, dropout_rng=dropout_rng,
        return_layers=[], mesh=mesh,
    )
    total = 0.0
    metrics: Dict[str, jax.Array] = {}
    batch_size = None
    for l in graph.output_layers:
        logits = outs[f"{l.name}:preact"]
        batch_size = logits.shape[0]
        if l.data_field not in batch:
            raise ValueError(
                f"output layer {l.name!r} expects target field {l.data_field!r} "
                f"but the batch has {sorted(batch)} — check the data config's "
                "layer_name / the layer's data_field"
            )
        target = batch[l.data_field]
        if l.loss_function == LOSS.CROSS_ENTROPY_MULTINOMIAL:
            target = target.reshape(-1)
        else:
            target = target.reshape(target.shape[0], -1)
        total = total + losses_ops.compute_loss(l.loss_function, logits, target)
        if l.loss_function == LOSS.CROSS_ENTROPY_MULTINOMIAL:
            metrics[f"{l.name}/errors"] = losses_ops.classification_errors(
                logits, target
            )
    loss = total / batch_size
    metrics["loss"] = loss
    return loss, metrics
