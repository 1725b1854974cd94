"""Data pipeline.

Reference counterpart: the DataHandler subsystem (src/datahandler.cc,
src/image_iterators.cc, src/datawriter.cc [U]): named streams over
HDF5 / raw-image datasets, chunked reads with a prefetch thread, and
jitter augmentation. TPU-first split:

- host side (this package): iterators + shuffle buffer + prefetch
  thread produce raw uint8/float batches (convnet_tpu.data.datahandler);
  an optional C++ threaded JPEG decoder accelerates IMAGE_RAW streams
  (convnet_tpu.data.native over native/dataloader.cc);
- device side: crop / flip / mean-subtract run as a fused prologue
  *inside* the jit'd train step (convnet_tpu.data.jitter), so the host
  ships small uint8 tensors and augmentation rides the VPU, overlapped
  with compute via async dispatch double-buffering.
"""

from convnet_tpu.data.jitter import JitterSpec, jitter_batch  # noqa: F401
from convnet_tpu.data.datahandler import DataHandler  # noqa: F401
from convnet_tpu.data.datawriter import DataWriter  # noqa: F401
