"""Command-line entry points.

Reference counterparts: src/train_convnet.cc, src/extract_representation.cc,
src/grad_check.cc [U]. Same surfaces: train takes a model pbtxt +
train/val data pbtxts; extract dumps chosen layers' activations to
HDF5; grad_check finite-differences every weighted edge.
"""
