"""convnet_tpu — a TPU-native rebuild of TorontoDeepLearning/convnet.

A standalone toolkit for training and running convolutional networks,
driven by the reference's protobuf text (`.pbtxt`) model format, built
TPU-first on JAX/XLA/Pallas:

- the Layer/Edge C++ object graph (reference: src/layer.cc, src/edge.cc
  [U]) becomes a compiler: pbtxt -> immutable graph IR -> a pure
  ``apply(params, batch)`` function jit-compiled by XLA;
- cuda-convnet kernels (convUp/Down/Outp, maxpool+undo, cross-map
  response norm — reference: cudamat/cudamat_conv*.cu [U]) become
  `lax.conv_general_dilated` / `lax.reduce_window` on the MXU plus a
  fused Pallas response-norm kernel with a custom VJP;
- the multi-GPU model-split path (reference: src/multigpu_convnet.cc
  [U]) becomes sharding over a `jax.sharding.Mesh` with ICI collectives;
- the HDF5/JPEG data layer with jitter augmentation (reference:
  src/datahandler.cc [U]) becomes a host prefetch pipeline feeding a
  fused on-device augmentation prologue.

`[U]` citations refer to the upstream repo layout; the reference mount
was empty at build time (see SURVEY.md provenance note).
"""

__version__ = "0.1.0"

from convnet_tpu.config import read_model, read_dataset_config, parse_model  # noqa: F401
from convnet_tpu.graph import Graph, LayerSpec, EdgeSpec, build_graph  # noqa: F401


def __getattr__(name):
    # Lazy exports that pull in jax (keep bare `import convnet_tpu` light
    # for config-only consumers like the dataset tools).
    if name == "Trainer":
        from convnet_tpu.trainer import Trainer

        return Trainer
    if name == "Predictor":
        from convnet_tpu.predictor import Predictor

        return Predictor
    if name == "DataHandler":
        from convnet_tpu.data.datahandler import DataHandler

        return DataHandler
    if name == "models":
        import convnet_tpu.models as models

        return models
    raise AttributeError(f"module 'convnet_tpu' has no attribute {name!r}")
