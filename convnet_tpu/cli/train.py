"""Train CLI (reference: src/train_convnet.cc [U]).

Usage:
    python -m convnet_tpu.cli.train MODEL.pbtxt TRAIN_DATA.pbtxt \
        [VAL_DATA.pbtxt] [--output-dir DIR] [--max-iter N] [--batch-size N]

Builds the graph from the model pbtxt (input sizes from the data
config), resumes from the newest checkpoint in the output dir if one
exists, and runs the jit'd train loop.
"""

from __future__ import annotations

import argparse

from convnet_tpu import config
from convnet_tpu.data.datahandler import DataHandler
from convnet_tpu.graph import build_graph
from convnet_tpu.trainer import Trainer


def build_argparser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(prog="convnet_train", description=__doc__)
    p.add_argument("model", help="model .pbtxt")
    p.add_argument("train_data", help="training DatasetConfig .pbtxt")
    p.add_argument("val_data", nargs="?", default=None, help="validation DatasetConfig .pbtxt")
    p.add_argument("--output-dir", default=None, help="checkpoint/output directory")
    p.add_argument("--max-iter", type=int, default=None, help="override model max_iter")
    p.add_argument("--batch-size", type=int, default=None, help="override batch size")
    p.add_argument(
        "--profile-dir",
        default=None,
        help="capture a jax.profiler device trace of steps 5-15 here",
    )
    p.add_argument(
        "--data-parallel",
        type=int,
        default=None,
        help="override Model.parallel.data (batch-sharding ways)",
    )
    p.add_argument(
        "--model-parallel",
        type=int,
        default=None,
        help="override Model.parallel.model (unit-sharding ways)",
    )
    p.add_argument(
        "--steps-per-launch",
        type=int,
        default=1,
        help="scan N train steps inside one device launch (lax.scan): "
        "amortizes per-launch dispatch latency; numerics are identical",
    )
    p.add_argument(
        "--strict",
        action="store_true",
        help="fail on pbtxt fields unknown to the schema instead of "
        "parsing leniently with a warning",
    )
    return p


def main(argv=None) -> int:
    args = build_argparser().parse_args(argv)
    if args.strict:
        config.set_strict(True)
    from convnet_tpu.trainer import enable_compilation_cache

    enable_compilation_cache()
    model = config.read_model(args.model)
    if args.batch_size:
        model.batch_size = args.batch_size
    if args.data_parallel is not None:
        model.parallel.data = args.data_parallel
    if args.model_parallel is not None:
        model.parallel.model = args.model_parallel
    train_cfg = config.read_dataset_config(args.train_data)
    train_data = DataHandler(train_cfg, batch_size=model.batch_size, seed=model.seed)
    val_data = None
    if args.val_data:
        val_cfg = config.read_dataset_config(args.val_data)
        val_data = DataHandler(val_cfg, batch_size=model.batch_size, randomize=False)
    graph = build_graph(model, train_data.input_image_sizes())
    trainer = Trainer(
        graph,
        train_data,
        val_data,
        checkpoint_dir=args.output_dir,
        model_proto=model,
        steps_per_launch=args.steps_per_launch,
    )
    try:
        trainer.train(max_iter=args.max_iter, profile_dir=args.profile_dir)
        if graph.checkpoint_after:
            trainer.save()
    finally:
        train_data.close()
        if val_data:
            val_data.close()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
