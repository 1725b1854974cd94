"""Dump every layer's activations for a fixed input to HDF5.

The BASELINE numerics bar is "activations match the CUDA reference
within 1e-4". The reference mount is empty this round (SURVEY.md
provenance note), so cross-implementation comparison isn't possible
yet; this tool freezes our side of that comparison: run it on a model +
checkpoint + seeded synthetic (or real HDF5) input, keep the dump, and
diff against the reference's activations whenever a populated mount or
upstream build is available.

Usage:
    python tools/dump_activations.py MODEL.pbtxt OUT.h5 \
        [--checkpoint C.h5] [--batch-size 4] [--seed 0] [--image-size N]
"""

from __future__ import annotations

import argparse

import h5py
import numpy as np


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("model")
    p.add_argument("output")
    p.add_argument("--checkpoint", default=None)
    p.add_argument("--batch-size", type=int, default=4)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--image-size", type=int, default=None)
    args = p.parse_args(argv)

    import jax

    from convnet_tpu import checkpoint as ckpt
    from convnet_tpu import config, model as model_lib
    from convnet_tpu.cli.grad_check import synth_batch
    from convnet_tpu.graph import build_graph

    model = config.read_model(args.model)
    sizes = {}
    if args.image_size:
        for lp in model.layer:
            if lp.is_input:
                sizes[lp.name] = args.image_size
    graph = build_graph(model, sizes)
    if args.checkpoint:
        params, _, _ = ckpt.load(
            args.checkpoint, expected_shapes=model_lib.param_shapes(graph)
        )
        params = jax.tree.map(np.asarray, params)
    else:
        params = model_lib.init_params(graph, seed=args.seed)
    rng = np.random.RandomState(args.seed)
    batch = synth_batch(graph, args.batch_size, rng)

    acts = jax.device_get(model_lib.apply_fn(graph, params, batch))
    with h5py.File(args.output, "w") as f:
        f.attrs["model"] = graph.name
        f.attrs["seed"] = args.seed
        for name, arr in acts.items():
            f.create_dataset(name.replace("/", "_"), data=np.asarray(arr, np.float32))
        for lname in [l.name for l in graph.input_layers]:
            f.create_dataset(
                f"input_{lname}", data=np.asarray(batch[graph.layer(lname).data_field])
            )
    print(f"wrote {args.output}: {len(acts)} activation tensors")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
