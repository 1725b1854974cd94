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

    With a jitter map the compiled program runs the model's own eval
    prologue — center crop from `raw_size` (default: the crop size
    itself) plus mean/scale normalization — so clients can ship raw
    pre-crop images exactly as the reference's serving path accepted
    them (src/extract_representation.cc [U]). `input_dtype=np.uint8`
    compiles the uint8 fast path (4x less host->device traffic): with
    a jitter map the crop runs on uint8 and normalization happens on
    device; without one the program still takes uint8 over the wire
    and widens to float on device (no normalization — the bytes are
    used as-is, matching what the f32 path would see for 0..255
    inputs)."""

    def __init__(
        self,
        graph: Graph,
        params: Dict,
        layers: Optional[List[str]] = None,
        batch_size: int = 128,
        jitter: Optional[JitterMap] = None,
        raw_size: Optional[int] = None,
        input_dtype=np.float32,
    ):
        self.graph = graph
        self.batch_size = batch_size
        self.layers = layers or [l.name for l in graph.output_layers]
        for name in self.layers:
            graph.layer(name)  # validate early
        if raw_size is not None:
            if jitter is None:
                raise ValueError("raw_size needs a jitter map (it defines the crop)")
            crop = max(spec.image_size for spec, _, _ in jitter.values())
            if raw_size < crop:
                raise ValueError(f"raw_size {raw_size} < crop size {crop}")
        self.params = jax.tree.map(jnp.asarray, params)
        self._jitter = jitter
        self._raw_size = raw_size
        self._input_dtype = np.dtype(input_dtype)
        base_fwd = make_forward(graph, self.layers, jitter)
        jittered = frozenset(jitter or ())

        # Per-field wire dtype: with a jitter map, only its (image)
        # fields take input_dtype — auxiliary inputs outside the map
        # keep float32, so a uint8-compiled multi-input Predictor does
        # not silently wrap float/int aux features through uint8. With
        # no jitter map at all, input_dtype was requested for the whole
        # model (the no-prologue uint8 wire format) and applies to
        # every field.
        self._wire_dtype = {
            l.data_field: (
                self._input_dtype
                if (not jitter or l.data_field in jittered)
                else np.dtype(np.float32)
            )
            for l in graph.input_layers
        }

        def fwd(params, batch):
            batch = {
                k: v if k in jittered else jnp.asarray(v, jnp.float32)
                for k, v in batch.items()
            }
            return base_fwd(params, batch)

        # AOT compile now so serving latency is flat from request one
        example = self._example_batch()
        self._compiled = jax.jit(fwd).lower(self.params, example).compile()

    @classmethod
    def from_checkpoint(
        cls,
        graph: Graph,
        path: str,
        layers=None,
        batch_size: int = 128,
        jitter=None,
        raw_size=None,
        input_dtype=np.float32,
    ) -> "Predictor":
        from convnet_tpu.model import param_shapes

        params, _, _ = ckpt.load(path, expected_shapes=param_shapes(graph))
        return cls(graph, params, layers, batch_size, jitter, raw_size, input_dtype)

    def _example_batch(self):
        out = {}
        for l in self.graph.input_layers:
            h, w, c = self.graph.shapes[l.name]
            if self._jitter and l.data_field in self._jitter:
                spec = self._jitter[l.data_field][0]
                h = w = self._raw_size or spec.image_size
            out[l.data_field] = jnp.zeros(
                (self.batch_size, h, w, c), self._wire_dtype[l.data_field]
            )
        return out

    def __call__(self, batch: Dict[str, np.ndarray]) -> Dict[str, np.ndarray]:
        """Run one batch. Inputs smaller than batch_size are padded (by
        repeating the last row) and outputs trimmed."""
        n = next(iter(batch.values())).shape[0]
        if n > self.batch_size:
            raise ValueError(f"batch of {n} exceeds compiled batch_size {self.batch_size}")
        padded = {}
        for k, v in batch.items():
            want = self._wire_dtype.get(k, self._input_dtype)
            v = np.asarray(v)
            if want == np.uint8 and v.dtype != np.uint8:
                # np.uint8 casting silently WRAPS out-of-range values
                # (300 -> 44, -1.0 -> 255): a client shipping already-
                # normalized floats or wide integers to a uint8-compiled
                # Predictor would get corrupted pixels, so fail loudly
                if np.issubdtype(v.dtype, np.floating) or (
                    v.size and (v.min() < 0 or v.max() > 255)
                ):
                    raise TypeError(
                        f"input {k!r}: this Predictor was compiled for uint8 "
                        f"inputs but got {v.dtype} with values outside 0..255; "
                        "pass raw 0..255 images (or build the Predictor with "
                        "input_dtype=float32)"
                    )
            v = np.asarray(v, want)
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
