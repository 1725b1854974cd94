"""Generated protobuf schema for convnet_tpu.

`convnet_config_pb2` is generated from `convnet_config.proto` with
`protoc --python_out=.` and checked in so no build step is needed at
import time. Regenerate with `make proto` at the repo root after
editing the .proto.
"""

from convnet_tpu.proto import convnet_config_pb2  # noqa: F401
