"""Chipless AOT pre-warm of the four round-3 A/B train-step variants
(pool+LRN fusion x s2d wgrad form) at batch 1024, so tools/r3_chip3.py
pays zero compile time inside its chip claim. Compiles ride the HTTP
AOT helper and land in /tmp/convnet_tpu_xla_cache."""
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
data = {
    "input": jax.ShapeDtypeStruct((B, 256, 256, 3), jnp.uint8),
    "labels": jax.ShapeDtypeStruct((B,), jnp.int32),
}
state = jax.eval_shape(lambda: init_state(graph))
for fused in ("0", "1"):
    for wgrad in ("conv", "explicit"):
        os.environ["CONVNET_POOL_LRN_FUSED"] = fused
        os.environ["CONVNET_S2D_WGRAD"] = wgrad
        jax.clear_caches()
        step = make_train_step(graph, jitter)
        t0 = time.perf_counter()
        step.lower(state, data).compile()
        print(
            f"fused={fused} wgrad={wgrad} compiled in "
            f"{time.perf_counter()-t0:.0f}s",
            flush=True,
        )
print("WARM3 COMPLETE", flush=True)
