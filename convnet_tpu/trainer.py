"""Training runtime: jit'd train/eval steps + the step loop.

Reference counterpart: ConvNet::{Train, TrainOneBatch, Validate}
(src/convnet.cc [U]) and the multi-GPU variant (src/multigpu_convnet.cc
[U]). The reference's per-batch walk (Fprop -> ComputeDeriv -> Bprop ->
UpdateWeights) compiles here into ONE XLA program: on-device jitter
prologue, forward, autodiff backward, and the per-edge SGD update are
fused and traced once; the Python loop only feeds raw uint8 batches and
reads back scalar metrics. Double-buffering: batches for step N+1 are
dispatched (device_put) while step N runs, JAX's async dispatch
providing the overlap the reference builds with a prefetch thread +
pinned staging.
"""

from __future__ import annotations

import time
import zlib
from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from convnet_tpu import checkpoint as ckpt
from convnet_tpu import model as model_lib
from convnet_tpu import optim
from convnet_tpu.data.datahandler import DataHandler
from convnet_tpu.data.jitter import JitterSpec, jitter_batch
from convnet_tpu.graph import Graph
from convnet_tpu.parallel import mesh as mesh_lib
from convnet_tpu.ops.pallas_util import mesh_dp, pallas_interpret

TrainState = Dict[str, Any]  # {"params", "moms", "step", "rng"}


def enable_compilation_cache(path: str = "/tmp/convnet_tpu_xla_cache"):
    """Persistent XLA compilation cache: first TPU compile of a given
    program costs 20-40s; later processes hit the disk cache. Called by
    the CLIs and bench; safe to call repeatedly."""
    try:
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass  # older jax without the knobs

JitterMap = Dict[str, Tuple[JitterSpec, Optional[np.ndarray], Optional[np.ndarray]]]


def init_state(graph: Graph, seed: Optional[int] = None) -> TrainState:
    params = model_lib.init_params(graph, seed)
    return {
        "params": params,
        "moms": optim.init_momentum(params),
        "step": jnp.zeros((), jnp.int32),
        "rng": jax.random.PRNGKey(graph.seed if seed is None else seed),
    }


def _fused_prologue_wanted() -> bool:
    import os

    mode = os.environ.get("CONVNET_FUSED_PROLOGUE", "auto")
    if mode in ("0", "1"):
        return mode == "1"
    # Measured on v5e (tools/r3_chip1.py, B=1024 AlexNet full step):
    # the fused prologue LOSES 1.3 ms vs the XLA jitter chain — XLA
    # already fuses crop+flip+normalize into the s2d relayout it must
    # emit anyway, and the Pallas pass serializes per-image MXU work
    # that XLA overlaps. Off by default; "1" opts in for A/B.
    return False


def _preprocess(
    graph: Graph, jitter: Optional[JitterMap], batch, rng, train: bool,
    mesh=None,
):
    """Apply the fused on-device jitter prologue to image inputs.

    For a uint8 train batch whose input layer feeds a single strided
    s2d-eligible conv (AlexNet's conv1), the crop/flip/normalize/pad/
    space-to-depth chain runs as ONE Pallas pass (ops/prologue.py) —
    the XLA form costs ~4 HBM round-trips of the raw batch in relayout
    copies. The fused path replays the exact same augmentation stream
    (same rng derivation via data.jitter.sample_crop_flip) and the same
    numerics (one-hot bf16 gathers, f32 affine)."""
    if not jitter:
        return {k: v.astype(jnp.float32) if v.dtype == jnp.uint8 else v for k, v in batch.items()}
    out = dict(batch)
    for field, (spec, mean, std) in jitter.items():
        jrng = None
        if rng is not None:
            # crc32, not hash(): stable across processes so a resumed run
            # replays the same augmentation stream
            jrng = jax.random.fold_in(rng, zlib.crc32(field.encode()) & 0x7FFFFFFF)
        x = out[field]
        dp = mesh_dp(mesh)
        if (
            x.ndim == 4
            and x.dtype == jnp.uint8
            # per-shard batch rides the relayout's lane axis: every data
            # shard needs its local rows % 128 == 0 (dp=1 single-device)
            and x.shape[0] % (128 * dp) == 0
            and (np.ndim(mean) <= 1 and np.ndim(std) <= 1)
            and (
                not train
                or jrng is not None
                or not (spec.can_translate or spec.can_flip)
            )
        ):
            from convnet_tpu.ops.s2d_relayout import relayout_wanted

            # under a mesh the fused prologue runs per-shard inside
            # shard_map over "data" (jitter_s2d_sharded) — sharded runs
            # keep the same Pallas relayout the single-chip path uses
            if relayout_wanted():
                from convnet_tpu.data.jitter import sample_crop_flip
                from convnet_tpu.ops.prologue import prologue_plan
                from convnet_tpu.ops.s2d_relayout import (
                    jitter_s2d,
                    jitter_s2d_sharded,
                )

                layer = next(
                    (l for l in graph.input_layers if l.data_field == field), None
                )
                edge = prologue_plan(graph, layer.name) if layer is not None else None
                if edge is not None:
                    b, h, w = x.shape[0], x.shape[1], x.shape[2]
                    oy = ox = flips = None
                    if train and jrng is not None:
                        oy, ox, flips = sample_crop_flip(
                            jrng, b, h, w, spec.image_size,
                            spec.can_translate, spec.can_flip,
                        )
                    if oy is None:
                        # eval / no-translate path: the model's center
                        # crop (jitter_batch's eval semantics) — this is
                        # the Predictor/extract serving prologue
                        s = spec.image_size
                        oy = jnp.full((b,), (h - s) // 2, jnp.int32)
                        ox = jnp.full((b,), (w - s) // 2, jnp.int32)
                    kw = dict(
                        crop=spec.image_size,
                        kernel=edge.kernel_size,
                        stride=edge.stride,
                        scale=spec.scale,
                        mean=mean,
                        std=std,
                        interpret=pallas_interpret(),
                    )
                    if mesh is not None:
                        out[field] = jitter_s2d_sharded(
                            mesh, x, oy, ox, flips, **kw
                        )
                    else:
                        out[field] = jitter_s2d(x, oy, ox, flips, **kw)
                    continue
        if (
            train
            and jrng is not None
            and x.ndim == 4
            and x.dtype == jnp.uint8
            and spec.can_translate
            and (np.ndim(mean) <= 1 and np.ndim(std) <= 1)
            and _fused_prologue_wanted()
        ):
            from convnet_tpu.data.jitter import sample_crop_flip
            from convnet_tpu.ops.prologue import fused_crop_s2d, prologue_plan

            layer = next(
                (l for l in graph.input_layers if l.data_field == field), None
            )
            edge = prologue_plan(graph, layer.name) if layer is not None else None
            if edge is not None:
                b, h, w = x.shape[0], x.shape[1], x.shape[2]
                oy, ox, flips = sample_crop_flip(
                    jrng, b, h, w, spec.image_size, spec.can_translate, spec.can_flip
                )
                if oy is not None:
                    out[field] = fused_crop_s2d(
                        x, oy, ox, flips,
                        crop=spec.image_size,
                        kernel=edge.kernel_size,
                        stride=edge.stride,
                        scale=spec.scale,
                        mean=mean,
                        std=std,
                        interpret=pallas_interpret(),
                    )
                    continue
        out[field] = jitter_batch(x, spec, jrng, train, mean, std)
    return out


def make_train_step(
    graph: Graph,
    jitter: Optional[JitterMap] = None,
    mesh=None,
    unroll: int = 1,
):
    """Build the jit'd (state, batch) -> (state, metrics) step.

    unroll > 1 compiles a device-side training loop: one launch runs
    `unroll` consecutive steps via lax.scan over batches stacked on a
    leading axis (each leaf (unroll, ...) instead of (...)), and the
    returned metrics carry that leading axis (one row per inner step).
    Per-step dispatch latency — host -> device launch round-trips the
    reference paid per TrainOneBatch [U] — amortizes by the factor;
    numerics are identical because the per-step RNG folds in the step
    counter, not the launch."""

    def step_fn(state: TrainState, batch):
        rng = jax.random.fold_in(state["rng"], state["step"])
        data_rng, drop_rng = jax.random.split(rng)
        proc = _preprocess(graph, jitter, batch, data_rng, train=True, mesh=mesh)

        def loss_of(params):
            return model_lib.loss_fn(
                graph, params, proc, train=True, dropout_rng=drop_rng, mesh=mesh
            )

        (_, metrics), grads = jax.value_and_grad(loss_of, has_aux=True)(
            state["params"]
        )
        new_params, new_moms = optim.apply_updates(
            graph, state["params"], state["moms"], grads, state["step"]
        )
        new_state = {
            "params": new_params,
            "moms": new_moms,
            "step": state["step"] + 1,
            "rng": state["rng"],
        }
        return new_state, metrics

    fn = step_fn
    if unroll > 1:

        def fn(state: TrainState, batches):
            return jax.lax.scan(step_fn, state, batches)

    if mesh is not None:
        ss = mesh_lib.state_shardings(graph, mesh)
        bs = mesh_lib.batch_sharding(mesh, stacked=unroll > 1)
        return jax.jit(
            fn,
            in_shardings=(ss, bs),
            out_shardings=(ss, None),
            donate_argnums=(0,),
        )
    return jax.jit(fn, donate_argnums=(0,))


def make_eval_step(graph: Graph, jitter: Optional[JitterMap] = None, mesh=None):
    """(params, batch) -> metrics; center-crop, no dropout."""

    def eval_fn(params, batch):
        proc = _preprocess(graph, jitter, batch, None, train=False, mesh=mesh)
        _, metrics = model_lib.loss_fn(graph, params, proc, train=False, mesh=mesh)
        return metrics

    if mesh is not None:
        ps = mesh_lib.param_shardings(graph, mesh)
        bs = mesh_lib.batch_sharding(mesh)
        return jax.jit(eval_fn, in_shardings=(ps, bs), out_shardings=None)
    return jax.jit(eval_fn)


def make_forward(
    graph: Graph, layers: List[str], jitter: Optional[JitterMap] = None, mesh=None
):
    """(params, batch) -> {layer: activations} for feature extraction.
    With a mesh: batch sharded over the data axis, params per the model's
    sharding rules (multi-chip inference)."""

    def fwd(params, batch):
        proc = _preprocess(graph, jitter, batch, None, train=False, mesh=mesh)
        return model_lib.apply_fn(
            graph, params, proc, train=False, return_layers=layers, mesh=mesh
        )

    if mesh is not None:
        ps = mesh_lib.param_shardings(graph, mesh)
        bs = mesh_lib.batch_sharding(mesh)
        return jax.jit(fwd, in_shardings=(ps, bs), out_shardings=None)
    return jax.jit(fwd)


class Trainer:
    """Owns the state, data handlers, and the step loop.

    Reference: ConvNet::Train [U] — periodic display, validation every
    `validate_after`, timestamped checkpoint every `checkpoint_after`,
    resume from the newest checkpoint in checkpoint_dir.
    """

    def __init__(
        self,
        graph: Graph,
        train_data: DataHandler,
        val_data: Optional[DataHandler] = None,
        checkpoint_dir: Optional[str] = None,
        mesh=None,
        log_fn=print,
        model_proto=None,
        steps_per_launch: int = 1,
    ):
        self.graph = graph
        # when given, save() mirrors the reference's ConvNet::Save [U]:
        # the model pbtxt is rewritten into the output dir with the
        # checkpoint timestamp recorded (Model.timestamp/_history)
        self.model_proto = model_proto
        self.train_data = train_data
        self.val_data = val_data
        self.checkpoint_dir = checkpoint_dir or graph.checkpoint_dir or "."
        self.mesh = mesh if mesh is not None else mesh_lib.mesh_for_graph(graph)
        self._log_fn = log_fn
        # persistent train log in the output dir (reference: the error/
        # stats history the trainer drops alongside checkpoints [U])
        self._log_path = None
        if checkpoint_dir or graph.checkpoint_dir:
            import os

            os.makedirs(self.checkpoint_dir, exist_ok=True)
            self._log_path = os.path.join(
                self.checkpoint_dir, f"{graph.name}_train_log.txt"
            )
        if self.mesh is not None:
            dp = mesh_dp(self.mesh)
            if train_data.batch_size % dp:
                raise ValueError(
                    f"batch_size {train_data.batch_size} not divisible by the "
                    f"mesh's data axis ({dp} ways)"
                )
        # fail fast on model<->data config mismatches
        need = {l.data_field for l in graph.input_layers} | {
            l.data_field for l in graph.output_layers
        }
        have = set(train_data.streams)
        if not need <= have:
            raise ValueError(
                f"data config provides streams {sorted(have)} but the model "
                f"needs fields {sorted(need)} (missing: {sorted(need - have)})"
            )
        jitter = train_data.jitter_specs()
        eval_jitter = val_data.jitter_specs() if val_data is not None else jitter
        self._jitter = jitter
        # steps_per_launch > 1: one launch scans k steps on device
        # (make_train_step unroll) over k stacked batches — amortizes
        # per-launch dispatch latency; numerics are launch-invariant.
        # Display/validate/checkpoint cadences fire at the first launch
        # boundary at or past each multiple.
        self.steps_per_launch = max(1, int(steps_per_launch))
        self._launch_fns: Dict[int, Any] = {}
        self._train_step = self._launch_fn(self.steps_per_launch)
        self._eval_step = make_eval_step(graph, eval_jitter, self.mesh)
        self.state = init_state(graph)
        self._resume()

    def _launch_fn(self, n: int):
        if n not in self._launch_fns:
            self._launch_fns[n] = make_train_step(
                self.graph, self._jitter, self.mesh, unroll=n
            )
        return self._launch_fns[n]

    def log(self, msg: str):
        self._log_fn(msg)
        if self._log_path:
            with open(self._log_path, "a") as f:
                f.write(msg + "\n")

    # -- checkpointing ------------------------------------------------------

    def _resume(self):
        path = ckpt.latest(self.checkpoint_dir, self.graph.name)
        if path:
            shapes = {
                name: {"w": tuple(l["w"].shape), "b": tuple(l["b"].shape)}
                for name, l in self.state["params"].items()
            }
            params, moms, step = ckpt.load(path, expected_shapes=shapes)
            expect = {e.name for e in self.graph.weighted_edges}
            if set(params) != expect:
                raise ValueError(
                    f"checkpoint {path} edges {sorted(params)} != model {sorted(expect)}"
                )
            self.state["params"] = jax.tree.map(jnp.asarray, params)
            if moms is not None:
                self.state["moms"] = jax.tree.map(jnp.asarray, moms)
            self.state["step"] = jnp.asarray(step, jnp.int32)
            self.log(f"resumed from {path} at step {step}")

    def save(self):
        import os

        step = int(self.state["step"])
        params = jax.device_get(self.state["params"])
        moms = jax.device_get(self.state["moms"])
        path = ckpt.save(
            self.checkpoint_dir, self.graph.name, params, moms, step=step
        )
        if self.model_proto is not None:
            from convnet_tpu.config import model_to_text

            # derive the tag by stripping the model-name prefix, not by
            # splitting on "_": collision-suffixed names ("<ts>_1.h5")
            # must keep the full "<ts>_1" so checkpoint_path(dir, name,
            # tag) still resolves to this file
            ts = (
                os.path.basename(path)
                .removeprefix(f"{self.graph.name}_")
                .removesuffix(".h5")
            )
            self.model_proto.timestamp = ts
            self.model_proto.timestamp_history.append(ts)
            with open(
                os.path.join(self.checkpoint_dir, f"{self.graph.name}.pbtxt"), "w"
            ) as f:
                f.write(model_to_text(self.model_proto))
        self.log(f"checkpoint -> {path}")
        return path

    # -- loops --------------------------------------------------------------

    def _device_batch(self, host_batch, stacked: bool = False):
        if self.mesh is not None:
            bs = mesh_lib.batch_sharding(self.mesh, stacked=stacked)
            return {k: jax.device_put(v, bs) for k, v in host_batch.items()}
        return {k: jnp.asarray(v) for k, v in host_batch.items()}

    def _stage(self, n: int):
        """Fetch n batches and ship them as one launch's input: plain
        batch for n=1, leading-axis stack for a scanned launch."""
        if n == 1:
            return self._device_batch(self.train_data.get_batch())
        batches = [self.train_data.get_batch() for _ in range(n)]
        stacked = {
            k: np.stack([b[k] for b in batches]) for k in batches[0]
        }
        return self._device_batch(stacked, stacked=True)

    def train(self, max_iter: Optional[int] = None, profile_dir: Optional[str] = None):
        """Step loop. `profile_dir`: capture a jax.profiler trace of ~10
        post-compile steps into this directory (tensorboard-readable).
        The window scales with steps_per_launch: tracing starts at the
        first launch boundary past the compile warmup and spans
        ceil(10/k) launches, so a k >= 15 launch size still captures a
        full launch instead of silently skipping the trace."""
        g = self.graph
        total = max_iter if max_iter is not None else g.max_iter
        window_metrics: List[Dict] = []
        t0 = time.time()
        start_step = int(self.state["step"])
        k = self.steps_per_launch
        # [p_start, p_stop) in step numbers, aligned to launch boundaries
        p_start = start_step + max(5, k)
        p_stop = p_start + k * -(-10 // k)
        it = start_step
        next_batch = self._stage(min(k, total - it)) if it < total else None
        profiling = False
        while it < total:
            if profile_dir is not None:
                if not profiling and p_start <= it < p_stop:
                    jax.profiler.start_trace(profile_dir)
                    profiling = True
                elif profiling and it >= p_stop:
                    jax.tree.map(
                        lambda a: a.block_until_ready(), self.state["params"]
                    )
                    jax.profiler.stop_trace()
                    profiling = False
                    self.log(f"profile trace -> {profile_dir}")
            n = min(k, total - it)
            batch = next_batch
            self.state, metrics = self._launch_fn(n)(self.state, batch)
            prev = it
            it += n
            # overlap: stage the next launch's batches while this one runs
            if it < total:
                next_batch = self._stage(min(k, total - it))
            if n == 1:
                window_metrics.append(metrics)
            else:
                # unstack the scanned launch's per-step metric rows
                rows = jax.device_get(metrics)
                for i in range(n):
                    window_metrics.append(
                        {mk: np.asarray(mv)[i] for mk, mv in rows.items()}
                    )

            step_no = it
            if g.display_after and step_no // g.display_after > prev // g.display_after:
                ms = jax.device_get(window_metrics)
                loss = float(np.mean([m["loss"] for m in ms]))
                errs = sum(
                    float(m[k]) for m in ms for k in m if k.endswith("/errors")
                )
                seen = len(ms) * self.train_data.batch_size
                dt = time.time() - t0
                ips = seen / dt if dt > 0 else 0.0
                self.log(
                    f"step {step_no} loss {loss:.4f} train_err {errs / max(1, seen):.4f} "
                    f"({ips:.1f} img/s)"
                )
                window_metrics = []
                t0 = time.time()
            if g.validate_after and self.val_data and step_no // g.validate_after > prev // g.validate_after:
                verr, vloss = self.validate()
                self.log(f"step {step_no} VALIDATION loss {vloss:.4f} err {verr:.4f}")
                t0 = time.time()
            if g.checkpoint_after and step_no // g.checkpoint_after > prev // g.checkpoint_after:
                self.save()
                t0 = time.time()
        if profiling:
            jax.profiler.stop_trace()
            self.log(f"profile trace -> {profile_dir} (truncated at end of run)")
        elif profile_dir is not None and it < p_start:
            self.log(
                f"WARNING: profile_dir given but the run ended at step {it} "
                f"before the trace window (starts at step {p_start}); no "
                "trace was captured"
            )
        return self.state

    def validate(self, num_batches: Optional[int] = None) -> Tuple[float, float]:
        assert self.val_data is not None
        n = num_batches or self.graph.validate_batches or self.val_data.num_batches
        n = max(1, min(n, self.val_data.num_batches))
        tot_err = tot_loss = seen = 0.0
        for _ in range(n):
            batch = self._device_batch(self.val_data.get_batch())
            m = jax.device_get(self._eval_step(self.state["params"], batch))
            tot_loss += float(m["loss"]) * self.val_data.batch_size
            tot_err += sum(float(m[k]) for k in m if k.endswith("/errors"))
            seen += self.val_data.batch_size
        return tot_err / seen, tot_loss / seen
