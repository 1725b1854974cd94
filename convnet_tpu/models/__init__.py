"""Model zoo.

Reference counterpart: examples/ pbtxts (CIFAR-10 nets, ImageNet
AlexNet-class nets, MNIST-class net [U][B]). Each constructor compiles
the corresponding examples/ pbtxt — the pbtxt stays the source of truth
(the reference's hard API surface) and these are typed conveniences over
it.
"""

from convnet_tpu.models.zoo import (  # noqa: F401
    alexnet,
    alexnet_2tower,
    alexnet_local,
    cifar10,
    cifar10_local,
    mnist_lenet,
    from_pbtxt,
)
