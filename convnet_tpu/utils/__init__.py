"""Utilities: timers, profiling hooks, logging.

Reference counterpart: src/util.{cc,h} [U] — wall-clock timers and
stdout stats. The rebuild adds `jax.profiler` trace capture
(tensorboard-readable) as the modern equivalent of the reference's
interval timing printfs.
"""

from convnet_tpu.utils.timers import Timer, profile_trace  # noqa: F401
