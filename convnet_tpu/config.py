"""Protobuf-text (.pbtxt) configuration loading.

Reference counterpart: `ReadPbtxt*` helpers in src/util.cc [U] — the
reference parses model / optimizer / data configs from protobuf text
files; this module does the same via google.protobuf.text_format so the
reference's model files parse unchanged.
"""

from __future__ import annotations

import os

from google.protobuf import text_format

from convnet_tpu.proto import convnet_config_pb2 as pb


def _read_pbtxt(path: str, message):
    if not os.path.exists(path):
        raise FileNotFoundError(f"pbtxt not found: {path}")
    with open(path, "r") as f:
        text_format.Parse(f.read(), message)
    return message


def parse_model(text: str) -> pb.Model:
    """Parse a model pbtxt string into a config.Model proto."""
    return text_format.Parse(text, pb.Model())


def read_model(path: str) -> pb.Model:
    """Load a model .pbtxt (reference: ReadModel / ReadPbtxt<Model> [U])."""
    return _read_pbtxt(path, pb.Model())


def read_dataset_config(path: str) -> pb.DatasetConfig:
    """Load a data .pbtxt (reference: ReadDataConfig [U])."""
    return _read_pbtxt(path, pb.DatasetConfig())


def parse_dataset_config(text: str) -> pb.DatasetConfig:
    return text_format.Parse(text, pb.DatasetConfig())


def read_feature_extractor_config(path: str) -> pb.FeatureExtractorConfig:
    return _read_pbtxt(path, pb.FeatureExtractorConfig())


def model_to_text(model: pb.Model) -> str:
    return text_format.MessageToString(model)
