"""Mesh construction and sharding rules.

The reference's only parallelism is intra-node model-split: layers
pinned to gpu_ids, activations memcpy'd across device boundaries
(src/multigpu_convnet.cc [U]). Here that seam becomes declared
shardings over a Mesh:

- axis "data": batch dimension of every activation; gradient psum over
  ICI is inserted by XLA because params are replicated along it.
- axis "model": output-unit dimension of large FC weights (Megatron
  column-parallel analog of the reference's layer pinning) AND the
  output-channel dimension of large CONV/LOCAL edges — AlexNet's
  two-tower split (src/multigpu_convnet.cc layer pinning [U]) is
  literally a channel-halving of conv2-5, so channel-sharding the conv
  weights reproduces the reference's model split without replicating
  conv FLOPs across the model axis. XLA propagates the shardings and
  inserts all-gather/reduce-scatter at the boundaries (e.g. before the
  cross-map LRN, whose window spans all channels).

Small edges stay replicated (collective overhead would dominate), as
does any edge whose output dimension doesn't divide the model axis.
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from convnet_tpu.graph import ET, Graph

#: Only FC weight matrices at least this many output units get
#: model-sharded; smaller ones are replicated (collective overhead
#: would dominate).
MIN_MODEL_SHARD_UNITS = 512

#: CONV / CONV_ONETOONE edges with at least this many output channels
#: shard those channels over the model axis (the reference's two-tower
#: conv split); below it the boundary collectives cost more than the
#: replicated FLOPs.
MIN_MODEL_SHARD_CONV_CHANNELS = 64


def make_mesh(
    data: int = 1, model: int = 1, devices: Optional[list] = None
) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    need = data * model
    if len(devices) < need:
        raise ValueError(
            f"mesh {data}x{model} needs {need} devices, have {len(devices)}"
        )
    dev_array = np.array(devices[:need]).reshape(data, model)
    return Mesh(dev_array, ("data", "model"))


def mesh_for_graph(graph: Graph, devices: Optional[list] = None) -> Optional[Mesh]:
    """Mesh from the model's `parallel {}` block; None for single-device.

    If the requested mesh is larger than the available device count, it
    is clamped (so a pbtxt written for a v5e-8 still runs on one chip).
    """
    devices = devices if devices is not None else jax.devices()
    data, model = graph.parallel_data, graph.parallel_model
    while data * model > len(devices) and data > 1:
        data //= 2
    while data * model > len(devices) and model > 1:
        model //= 2
    if (data, model) != (graph.parallel_data, graph.parallel_model):
        import warnings

        warnings.warn(
            f"model requests a {graph.parallel_data}x{graph.parallel_model} "
            f"mesh but only {len(devices)} device(s) are available — "
            f"clamped to {data}x{model}",
            stacklevel=2,
        )
    if data * model == 1:
        return None
    return make_mesh(data, model, devices)


def batch_sharding(mesh: Mesh, stacked: bool = False) -> NamedSharding:
    """Batch rows over the data axis; `stacked` shifts past the leading
    steps axis of an unrolled (multi-step-per-launch) batch stack."""
    return NamedSharding(mesh, P(None, "data") if stacked else P("data"))


def _edge_pspec(graph: Graph, edge_name: str, leaf: str, n_model: int = 1) -> P:
    e = graph.edge(edge_name)
    dst_c = graph.shapes[e.dest][2]
    if n_model > 1 and dst_c % n_model:
        return P()  # output dim doesn't divide the model axis
    if e.edge_type == ET.FC and dst_c >= MIN_MODEL_SHARD_UNITS:
        # column-parallel: shard output units
        return P(None, "model") if leaf == "w" else P("model")
    if e.edge_type == ET.LOCAL and dst_c >= MIN_MODEL_SHARD_CONV_CHANNELS:
        # untied weights are the big tensors (one filter per site:
        # oh*ow*k^2*Cin*Cout) — shard the output-channel axis; the
        # per-site bias (oh, ow, Cout) shards on its last axis too
        if leaf == "w":
            return P(None, None, None, "model")
        return P(None, None, "model") if not e.shared_bias else P("model")
    if e.edge_type == ET.CONV and dst_c >= MIN_MODEL_SHARD_CONV_CHANNELS:
        # output-channel split = the reference's two-tower conv pinning:
        # each model shard computes its own channel slice of the conv
        # (1/n of the FLOPs), XLA gathers at channel-global consumers.
        # Grouped convs shard only when the contiguous channel split
        # aligns with tower boundaries (n | g or g | n), so no shard
        # straddles a partial group — GSPMD's grouped-conv partitioning
        # stays in its well-supported regime; otherwise replicate.
        g = e.num_groups
        if g > 1 and (n_model % g) and (g % n_model):
            return P()
        if leaf == "w":
            return P(None, None, None, "model")
        return P("model") if e.shared_bias else P(None, None, "model")
    if e.edge_type == ET.CONV_ONETOONE and dst_c >= MIN_MODEL_SHARD_CONV_CHANNELS:
        return P(None, "model") if leaf == "w" else P("model")
    return P()  # replicated


def param_shardings(graph: Graph, mesh: Mesh) -> Dict:
    """NamedSharding pytree matching the params pytree."""
    n_model = mesh.shape.get("model", 1)
    out = {}
    for e in graph.weighted_edges:
        out[e.name] = {
            "w": NamedSharding(mesh, _edge_pspec(graph, e.name, "w", n_model)),
            "b": NamedSharding(mesh, _edge_pspec(graph, e.name, "b", n_model)),
        }
    return out


def state_shardings(graph: Graph, mesh: Mesh) -> Dict:
    """Shardings for the full TrainState pytree (params + momentum mirrors
    + replicated scalars)."""
    ps = param_shardings(graph, mesh)
    rep = NamedSharding(mesh, P())
    return {"params": ps, "moms": ps, "step": rep, "rng": rep}
