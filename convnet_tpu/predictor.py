"""Ahead-of-time-compiled inference: the serving-side convenience over
the same compiled forward the extract CLI uses.

Reference counterpart: the fprop-only path of ConvNet used by
extract_representation (src/extract_representation.cc [U]); this class
packages it for production serving: fixed batch size, AOT compile at
construction (jit lower+compile so the first request pays nothing),
center-crop preprocessing, partial-batch padding.
"""

from __future__ import annotations

from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from convnet_tpu import checkpoint as ckpt
from convnet_tpu.graph import Graph
from convnet_tpu.trainer import JitterMap, make_forward


class Predictor:
    """Compiled fixed-batch forward pass over chosen layers.

    Inputs are expected at the model's (cropped) image size; when a
    jitter map is given its mean/scale normalization is applied but the
    compiled shape is the crop size — resize/crop larger sources on the
    client (or go through the extract CLI, which handles raw sizes)."""

    def __init__(
        self,
        graph: Graph,
        params: Dict,
        layers: Optional[List[str]] = None,
        batch_size: int = 128,
        jitter: Optional[JitterMap] = None,
    ):
        self.graph = graph
        self.batch_size = batch_size
        self.layers = layers or [l.name for l in graph.output_layers]
        for name in self.layers:
            graph.layer(name)  # validate early
        self.params = jax.tree.map(jnp.asarray, params)
        self._fwd = make_forward(graph, self.layers, jitter)
        # AOT compile now so serving latency is flat from request one
        self._jitter = jitter
        example = self._example_batch()
        self._compiled = self._fwd.lower(self.params, example).compile()

    @classmethod
    def from_checkpoint(
        cls, graph: Graph, path: str, layers=None, batch_size: int = 128, jitter=None
    ) -> "Predictor":
        from convnet_tpu.model import param_shapes

        params, _, _ = ckpt.load(path, expected_shapes=param_shapes(graph))
        return cls(graph, params, layers, batch_size, jitter)

    def _example_batch(self):
        out = {}
        for l in self.graph.input_layers:
            h, w, c = self.graph.shapes[l.name]
            if self._jitter and l.data_field in self._jitter:
                spec = self._jitter[l.data_field][0]
                # raw (pre-crop) size is whatever the caller ships; the
                # compiled shape fixes it to the crop size + margin-free
                h = w = spec.image_size
            out[l.data_field] = jnp.zeros((self.batch_size, h, w, c), jnp.float32)
        return out

    def __call__(self, batch: Dict[str, np.ndarray]) -> Dict[str, np.ndarray]:
        """Run one batch. Inputs smaller than batch_size are padded (by
        repeating the last row) and outputs trimmed."""
        n = next(iter(batch.values())).shape[0]
        if n > self.batch_size:
            raise ValueError(f"batch of {n} exceeds compiled batch_size {self.batch_size}")
        padded = {}
        for k, v in batch.items():
            v = np.asarray(v, np.float32)
            if n < self.batch_size:
                pad = np.repeat(v[-1:], self.batch_size - n, axis=0)
                v = np.concatenate([v, pad], axis=0)
            padded[k] = v
        out = jax.device_get(self._compiled(self.params, padded))
        return {k: np.asarray(v)[:n] for k, v in out.items()}

    def predict_labels(self, batch: Dict[str, np.ndarray]) -> np.ndarray:
        """Top-1 class ids from the first output layer."""
        out_layer = self.graph.output_layers[0].name
        acts = self(batch)[out_layer]
        return np.argmax(acts.reshape(acts.shape[0], -1), axis=-1)
