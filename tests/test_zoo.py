"""Model zoo constructors compile and have the documented geometry."""

import pytest

from convnet_tpu import models


@pytest.mark.parametrize(
    "ctor", [models.mnist_lenet, models.cifar10, models.cifar10_local,
             models.alexnet, models.alexnet_local],
)
def test_zoo_builds(ctor):
    g = ctor()
    assert g.input_layers and g.output_layers


def test_cifar_local_geometry():
    g = models.cifar10_local()
    assert g.shapes["pool2"] == (8, 8, 64)
    assert g.shapes["local3"] == (8, 8, 64)
    assert g.shapes["local4"] == (8, 8, 32)


def test_alexnet_resizable():
    g = models.alexnet(image_size=67)
    assert g.shapes["pool5"] == (1, 1, 256)
