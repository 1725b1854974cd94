"""Feature-extraction CLI (reference: src/extract_representation.cc [U]).

Loads a model pbtxt + checkpoint, runs fprop over a dataset (no jitter:
center crop), and streams chosen layers' activations into an output
HDF5 file — the AlexNet-fc7-embeddings workflow (BASELINE.json
configs[3]).

Usage:
    python -m convnet_tpu.cli.extract MODEL.pbtxt DATA.pbtxt \
        --checkpoint CKPT.h5 --output OUT.h5 --layers fc7 [fc6 ...]
"""

from __future__ import annotations

import argparse

import jax
import numpy as np

from convnet_tpu import checkpoint as ckpt
from convnet_tpu import config
from convnet_tpu.data.datahandler import DataHandler
from convnet_tpu.data.datawriter import DataWriter
from convnet_tpu.graph import build_graph
from convnet_tpu.trainer import make_forward


def build_argparser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(prog="convnet_extract", description=__doc__)
    p.add_argument("model", help="model .pbtxt")
    p.add_argument("data", help="DatasetConfig .pbtxt to extract over")
    p.add_argument("--checkpoint", required=True, help="HDF5 checkpoint")
    p.add_argument(
        "--config",
        default=None,
        help="FeatureExtractorConfig .pbtxt supplying output/layers/batch size "
        "(reference: extract_representation's run config [U])",
    )
    p.add_argument("--output", default=None, help="output HDF5 file")
    p.add_argument("--layers", nargs="+", default=None, help="layer names to dump")
    p.add_argument("--batch-size", type=int, default=None)
    p.add_argument(
        "--strict",
        action="store_true",
        help="fail on pbtxt fields unknown to the schema instead of "
        "parsing leniently with a warning",
    )
    p.add_argument(
        "--timing",
        action="store_true",
        help="print a per-phase wall-time breakdown (gather / dispatch "
        "/ device readback / HDF5 write) at the end",
    )
    return p


def main(argv=None) -> int:
    args = build_argparser().parse_args(argv)
    if args.strict:
        config.set_strict(True)
    from convnet_tpu.trainer import enable_compilation_cache

    enable_compilation_cache()
    if args.config:
        fe = config.read_feature_extractor_config(args.config)
        args.output = args.output or fe.output_file
        args.layers = args.layers or list(fe.layer)
        args.batch_size = args.batch_size or fe.batch_size
    if not args.output or not args.layers:
        raise SystemExit("--output and --layers are required (directly or via --config)")
    model = config.read_model(args.model)
    data_cfg = config.read_dataset_config(args.data)
    sizes = {c.layer_name: c.image_size for c in data_cfg.data_config if c.image_size}
    graph = build_graph(model, sizes)
    for name in args.layers:
        graph.layer(name)  # raises KeyError for unknown layers

    from convnet_tpu.parallel import mesh as mesh_lib

    mesh = mesh_lib.mesh_for_graph(graph)
    # batch size priority: CLI flag > data config's own > model default —
    # padded up to a multiple of the mesh data axis (iter_epoch pads the
    # final batch anyway, so every row is still extracted exactly once)
    bs = (
        args.batch_size
        or (data_cfg.batch_size if data_cfg.HasField("batch_size") else 0)
        or model.batch_size
    )
    if mesh is not None:
        axis = mesh.shape.get("data", 1)
        if bs % axis:
            bs += axis - bs % axis
            print(f"batch size rounded up to {bs} (multiple of mesh data axis {axis})")
    data = DataHandler(data_cfg, batch_size=bs, randomize=False)
    from convnet_tpu.model import param_shapes

    params, _, step = ckpt.load(args.checkpoint, expected_shapes=param_shapes(graph))
    params = jax.tree.map(np.asarray, params)
    print(f"loaded {args.checkpoint} (step {step})")
    fwd = make_forward(graph, args.layers, data.jitter_specs(), mesh=mesh)
    if mesh is not None:
        params = jax.device_put(params, mesh_lib.param_shardings(graph, mesh))
    dims = {
        name: int(np.prod(graph.shapes[name])) for name in args.layers
    }
    total = data.num_rows
    done = 0
    import time

    t = {"gather": 0.0, "dispatch": 0.0, "readback": 0.0, "write": 0.0}
    with DataWriter(args.output, dims) as writer:
        # deterministic epoch incl. the final partial batch (padded rows
        # are trimmed before writing) — every input row gets features.
        # Double-buffered: batch i+1 is dispatched (host->device + fprop
        # enqueued, all async) before batch i's readback blocks, so the
        # transfer/compute of one batch hides under the readback/HDF5
        # write of the previous one.
        pending = None

        def drain(pending):
            nonlocal done
            out, valid = pending
            t0 = time.perf_counter()
            acts = jax.device_get(out)
            t["readback"] += time.perf_counter() - t0
            t0 = time.perf_counter()
            writer.append({name: acts[name][:valid] for name in args.layers})
            t["write"] += time.perf_counter() - t0
            done += valid
            if done % (50 * data.batch_size) < data.batch_size:
                print(f"extracted {done}/{total} rows")

        it = data.iter_epoch()
        while True:
            t0 = time.perf_counter()
            item = next(it, None)
            t["gather"] += time.perf_counter() - t0
            if item is None:
                break
            batch, valid = item
            t0 = time.perf_counter()
            out = fwd(params, batch)
            t["dispatch"] += time.perf_counter() - t0
            if pending is not None:
                drain(pending)
            pending = (out, valid)
        if pending is not None:
            drain(pending)
    data.close()
    if args.timing:
        width = max(len(k) for k in t)
        for k, v in t.items():
            print(f"  {k:{width}s} {v:8.2f} s")
    print(f"wrote {args.output}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
