"""Typed constructors over the examples/ pbtxt zoo."""

from __future__ import annotations

import os
from typing import Dict, Optional

from convnet_tpu import config
from convnet_tpu.graph import Graph, build_graph

_EXAMPLES = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    "examples",
)


def from_pbtxt(
    path: str, input_image_sizes: Optional[Dict[str, int]] = None
) -> Graph:
    """Compile any model pbtxt into a Graph."""
    return build_graph(config.read_model(path), input_image_sizes)


def _example(rel: str, image_size: Optional[int] = None) -> Graph:
    sizes = {"input": image_size} if image_size else None
    return from_pbtxt(os.path.join(_EXAMPLES, rel), sizes)


def mnist_lenet(image_size: Optional[int] = None) -> Graph:
    """MNIST LeNet-class convnet (BASELINE configs[0])."""
    return _example("mnist/mnist_lenet.pbtxt", image_size)


def cifar10(image_size: Optional[int] = None) -> Graph:
    """CIFAR-10 conv/maxpool/LRN/dropout net (BASELINE configs[1])."""
    return _example("cifar10/cifar10_conv.pbtxt", image_size)


def cifar10_local(image_size: Optional[int] = None) -> Graph:
    """CIFAR-10 variant with locally connected (untied) late layers —
    the cuda-convnet conv-local architecture family [U]."""
    return _example("cifar10/cifar10_local.pbtxt", image_size)


def alexnet(image_size: Optional[int] = None) -> Graph:
    """Classic ImageNet AlexNet (BASELINE configs[2], headline bench)."""
    return _example("imagenet/alexnet.pbtxt", image_size)


def alexnet_local(image_size: Optional[int] = None) -> Graph:
    """AlexNet with an untied-weight LOCAL conv4 (local-edge parity)."""
    return _example("imagenet/alexnet_local.pbtxt", image_size)


def alexnet_2tower(image_size: Optional[int] = None) -> Graph:
    """Original two-tower AlexNet (Krizhevsky 2012): conv2/4/5 split into
    two channel towers — the topology the reference's multi-GPU model
    split trained (src/multigpu_convnet.cc [U]), expressed as grouped
    convolutions (num_groups: 2) over a model-axis mesh."""
    return _example("imagenet/alexnet_2tower.pbtxt", image_size)
