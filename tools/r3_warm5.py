"""Chipless AOT pre-warm of the BENCH_UNROLL step programs (lax.scan
device loop) at bench geometry, for the unroll A/B in chip batch 5.
Warms unroll in {4, 8} x pool+LRN fusion {off, on}, all with the
explicit s2d wgrad (the expected winner; re-warm if the A/B disagrees).
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from convnet_tpu.trainer import enable_compilation_cache

enable_compilation_cache()
from convnet_tpu import config
from convnet_tpu.data.jitter import JitterSpec
from convnet_tpu.graph import build_graph
from convnet_tpu.trainer import init_state, make_train_step

here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
model = config.read_model(os.path.join(here, "examples/imagenet/alexnet.pbtxt"))
model.parallel.data = 1
model.parallel.model = 1
graph = build_graph(model, {"input": 224})
B = 1024
jitter = {
    "input": (
        JitterSpec(image_size=224, can_translate=True, can_flip=True, scale=1 / 255),
        np.full((3,), 0.45, np.float32),
        None,
    )
}
state = jax.eval_shape(lambda: init_state(graph))
os.environ["CONVNET_S2D_WGRAD"] = "explicit"
for unroll in (4, 8):
    for fused in ("0", "1"):
        os.environ["CONVNET_POOL_LRN_FUSED"] = fused
        jax.clear_caches()
        step = make_train_step(graph, jitter, unroll=unroll)
        data = {
            "input": jax.ShapeDtypeStruct((unroll, B, 256, 256, 3), jnp.uint8),
            "labels": jax.ShapeDtypeStruct((unroll, B), jnp.int32),
        }
        t0 = time.perf_counter()
        step.lower(state, data).compile()
        print(
            f"unroll={unroll} fused={fused} compiled in "
            f"{time.perf_counter()-t0:.0f}s",
            flush=True,
        )
print("WARM5 COMPLETE", flush=True)
