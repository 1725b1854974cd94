"""Gradient checker CLI (reference: src/grad_check.cc [U]).

The reference's correctness oracle: finite-difference vs analytic
gradients per weighted edge. Here the analytic side is jax.grad of the
compiled model (which exercises every custom VJP, e.g. the Pallas
response-norm kernel); the finite-difference side perturbs a random
subset of each edge's weights.

Usage:
    python -m convnet_tpu.cli.grad_check MODEL.pbtxt [--batch-size 8]
        [--samples 20] [--x64] [--tol 2e-3] [--tol-edge SRC:DST=TOL]
"""

from __future__ import annotations

import argparse
import sys

import jax
import jax.numpy as jnp
import numpy as np

from convnet_tpu import config, model as model_lib
from convnet_tpu.graph import LOSS, build_graph


def synth_batch(graph, batch_size, rng):
    """Random inputs + targets matching the graph's data fields."""
    batch = {}
    for l in graph.input_layers:
        h, w, c = graph.shapes[l.name]
        batch[l.data_field] = jnp.asarray(
            rng.randn(batch_size, h, w, c).astype(np.float32)
        )
    for l in graph.output_layers:
        if l.data_field in batch:
            continue  # autoencoder-style: target aliases an input stream
        k = graph.shapes[l.name][2]
        if l.loss_function == LOSS.CROSS_ENTROPY_MULTINOMIAL:
            batch[l.data_field] = jnp.asarray(rng.randint(0, k, batch_size))
        else:
            batch[l.data_field] = jnp.asarray(
                rng.rand(batch_size, k).astype(np.float32)
            )
    return batch


def check_graph(
    graph,
    batch_size=8,
    samples=20,
    eps=1e-3,
    tol=2e-3,
    seed=0,
    log=print,
    use_x64=False,
    tol_edges=None,
):
    """Returns (num_failures, max_rel_err). rel err per cuda-convnet:
    |analytic - numeric| / max(1, |analytic| + |numeric|).

    use_x64: run the check in float64 (CPU backends). float32 central
    differences carry cancellation noise ~ loss_magnitude * 1e-7 / eps,
    which drowns the signal for large-loss models (e.g. squared-error
    reconstruction); x64 removes it."""
    if use_x64:
        prev = jax.config.jax_enable_x64
        jax.config.update("jax_enable_x64", True)
        try:
            return _check_graph_impl(
                graph, batch_size, samples, eps, tol, seed, log, np.float64, tol_edges
            )
        finally:
            jax.config.update("jax_enable_x64", prev)
    return _check_graph_impl(
        graph, batch_size, samples, eps, tol, seed, log, None, tol_edges
    )


def _check_graph_impl(graph, batch_size, samples, eps, tol, seed, log, cast, tol_edges):
    tol_edges = tol_edges or {}
    rng = np.random.RandomState(seed)
    params = model_lib.init_params(graph, seed=seed)
    batch = synth_batch(graph, batch_size, rng)
    if cast is not None:
        params = jax.tree.map(lambda a: jnp.asarray(np.asarray(a), cast), params)
        batch = {
            k: jnp.asarray(np.asarray(v), cast)
            if np.issubdtype(np.asarray(v).dtype, np.floating)
            else v
            for k, v in batch.items()
        }

    def loss_of(p):
        return model_lib.loss_fn(graph, p, batch, train=False)[0]

    loss_of = jax.jit(loss_of)
    grads = jax.device_get(jax.grad(lambda p: loss_of(p))(params))
    # writable copies: device_get may return read-only views
    host_params = jax.tree.map(lambda a: np.array(a), jax.device_get(params))

    failures = 0
    max_rel = 0.0
    for edge_name, leaves in sorted(host_params.items()):
        for leaf_name, w in leaves.items():
            flat = w.reshape(-1)
            g_flat = grads[edge_name][leaf_name].reshape(-1)
            idxs = rng.choice(flat.size, size=min(samples, flat.size), replace=False)
            worst = 0.0
            for i in idxs:
                orig = flat[i]
                flat[i] = orig + eps
                lp = float(loss_of(jax.tree.map(jnp.asarray, host_params)))
                flat[i] = orig - eps
                lm = float(loss_of(jax.tree.map(jnp.asarray, host_params)))
                flat[i] = orig
                numeric = (lp - lm) / (2 * eps)
                analytic = float(g_flat[i])
                rel = abs(analytic - numeric) / max(1.0, abs(analytic) + abs(numeric))
                worst = max(worst, rel)
            max_rel = max(max_rel, worst)
            edge_tol = tol_edges.get(edge_name, tol)
            status = "OK " if worst <= edge_tol else "FAIL"
            if worst > edge_tol:
                failures += 1
            log(f"{status} {edge_name:>30s}.{leaf_name}  max_rel_err {worst:.2e}")
    return failures, max_rel


def build_argparser():
    p = argparse.ArgumentParser(prog="convnet_grad_check", description=__doc__)
    p.add_argument("model", help="model .pbtxt")
    p.add_argument("--batch-size", type=int, default=8)
    p.add_argument("--samples", type=int, default=20)
    p.add_argument(
        "--eps",
        type=float,
        default=None,
        help="finite-difference step (default: 1e-7 with --x64 where "
        "truncation dominates, else 1e-3 to stay above f32 cancellation)",
    )
    p.add_argument(
        "--tol",
        type=float,
        default=2e-3,
        help=(
            "max relative error per edge (default 2e-3 — use --x64 so "
            "finite differences aren't cancellation-limited); loosen a "
            "specific edge with --tol-edge when a ReLU/maxpool kink "
            "sits within eps of a sampled weight"
        ),
    )
    p.add_argument(
        "--tol-edge",
        action="append",
        default=[],
        metavar="SRC:DST=TOL",
        help="per-edge tolerance override, repeatable "
        "(e.g. --tol-edge conv1:pool1=1e-2)",
    )
    p.add_argument("--image-size", type=int, default=None, help="override input size")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument(
        "--x64",
        action="store_true",
        help="check in float64 (CPU): required for large-loss models where "
        "f32 finite differences are cancellation-limited",
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
    if args.x64:
        # f64 lives on CPU: TPU HLO has no f64 select-and-scatter (and
        # round-tripping every finite-difference probe through the chip
        # tunnel is orders slower than local XLA:CPU anyway)
        jax.config.update("jax_platforms", "cpu")
    tol_edges = {}
    for spec in args.tol_edge:
        name, _, val = spec.partition("=")
        if not val:
            raise SystemExit(f"--tol-edge expects SRC:DST=TOL, got {spec!r}")
        tol_edges[name] = float(val)
    if args.eps is None:
        args.eps = 1e-7 if args.x64 else 1e-3
    model = config.read_model(args.model)
    sizes = {}
    if args.image_size:
        for lp in model.layer:
            if lp.is_input:
                sizes[lp.name] = args.image_size
    graph = build_graph(model, sizes)
    failures, max_rel = check_graph(
        graph,
        batch_size=args.batch_size,
        samples=args.samples,
        eps=args.eps,
        tol=args.tol,
        seed=args.seed,
        use_x64=args.x64,
        tol_edges=tol_edges,
    )
    print(f"grad check: {failures} failures, max rel err {max_rel:.2e}")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
