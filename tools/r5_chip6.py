"""r5 chip batch 6 — hardware validation of grouped convolution.

Round-5 session-5 feature: Edge.num_groups (two-tower AlexNet,
feature_group_count lowering — ops/conv.py). Never ship a kernel form
the chip hasn't executed (docs/performance.md trap #5: interpret/CPU
passes do not prove the TPU backend compiles or computes it — and this
repo's history has degenerate-Cin weight-grad conv pathologies).

Checks, in one ordered process (batch chip work; never kill mid-compile):
  1. Grouped conv fwd+dw+dx at AlexNet conv2 geometry (27x27x96 -> 256,
     g=2, bf16 + f32) vs the per-group loop, on chip.
  2. One bf16 train step of examples/imagenet/alexnet_2tower.pbtxt at
     224 px batch 256 (single chip: parallel clamps to 1x1) — proves the
     full graph (grouped convs + LRN kernels + s2d prologue) compiles
     and runs on hardware; prints the step time next to the single-tower
     net's for context (NOT a tuned benchmark).

Safe to rerun; uses the persistent XLA cache at /tmp/convnet_tpu_xla_cache.
"""

import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/convnet_tpu_xla_cache")

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    print(f"platform={jax.devices()[0].platform}", flush=True)
    from convnet_tpu.ops.conv import conv2d

    rng = np.random.RandomState(0)

    # --- 1. grouped conv numerics at conv2 geometry ---------------------
    B = 64  # enough rows to exercise tiling; numerics, not perf
    x_np = rng.randn(B, 27, 27, 96).astype(np.float32)
    w_np = (0.05 * rng.randn(5, 5, 48, 256)).astype(np.float32)
    g_np = rng.randn(B, 27, 27, 256).astype(np.float32)

    for cdt, tag, tol in ((None, "f32", 1e-5), (jnp.bfloat16, "bf16", 2e-2)):
        x, w = jnp.asarray(x_np), jnp.asarray(w_np)
        ct = jnp.asarray(g_np)

        def grouped(w_):
            return conv2d(x, w_, 1, 2, compute_dtype=cdt, groups=2)

        def looped(w_):
            a = conv2d(x[..., :48], w_[..., :128], 1, 2, compute_dtype=cdt)
            b = conv2d(x[..., 48:], w_[..., 128:], 1, 2, compute_dtype=cdt)
            return jnp.concatenate([a, b], axis=-1)

        def fwd_and_grads(fn):
            y, vjp = jax.vjp(fn, w)
            (dw,) = vjp(ct.astype(y.dtype))
            return y.astype(jnp.float32), dw.astype(jnp.float32)

        y1, dw1 = jax.jit(lambda: fwd_and_grads(grouped))()
        y2, dw2 = jax.jit(lambda: fwd_and_grads(looped))()
        # dx too (vjp wrt x through the grouped form)
        dx1 = jax.jit(
            jax.grad(lambda x_: jnp.vdot(
                conv2d(x_, w, 1, 2, compute_dtype=cdt, groups=2).astype(jnp.float32), ct))
        )(x)
        dx2 = jax.jit(
            jax.grad(lambda x_: jnp.vdot(jnp.concatenate([
                conv2d(x_[..., :48], w[..., :128], 1, 2, compute_dtype=cdt),
                conv2d(x_[..., 48:], w[..., 128:], 1, 2, compute_dtype=cdt),
            ], axis=-1).astype(jnp.float32), ct))
        )(x)
        scale = float(jnp.abs(y2).max())
        rel = lambda a, b: float(jnp.abs(a - b).max()) / max(
            1e-30, float(jnp.abs(b).max())
        )
        print(
            f"grouped-conv {tag}: y rel {rel(y1, y2):.2e} "
            f"dw rel {rel(dw1, dw2):.2e} dx rel {rel(dx1, dx2):.2e} "
            f"(|y|max {scale:.1f})",
            flush=True,
        )
        assert rel(y1, y2) <= tol and rel(dw1, dw2) <= tol and rel(dx1, dx2) <= tol

    # --- 2. full two-tower train step on chip ---------------------------
    from convnet_tpu import config
    from convnet_tpu.graph import build_graph
    from convnet_tpu.trainer import init_state, make_train_step
    from convnet_tpu.data.jitter import JitterSpec

    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

    def step_time(fname, B=256, iters=8):
        m = config.read_model(os.path.join(here, "examples/imagenet", fname))
        m.parallel.data = 1
        m.parallel.model = 1
        g = build_graph(m)
        jitter = {
            "input": (
                JitterSpec(image_size=224, can_translate=True, can_flip=True,
                           scale=1 / 255),
                np.full((3,), 127.0, np.float32),
                None,
            )
        }
        step = make_train_step(g, jitter)
        state = init_state(g)
        rr = np.random.RandomState(1)
        batch = {
            "input": jnp.asarray(
                rr.randint(0, 256, (B, 256, 256, 3), dtype=np.uint8)
            ),
            "labels": jnp.asarray(rr.randint(0, 1000, (B,), dtype=np.int32)),
        }
        t0 = time.time()
        state, metrics = step(state, batch)
        loss = float(metrics["loss"])  # sync
        print(f"{fname}: first step (incl. compile) {time.time()-t0:.1f}s "
              f"loss={loss:.4f}", flush=True)
        assert np.isfinite(loss)
        ts = []
        for _ in range(iters):
            t0 = time.time()
            state, metrics = step(state, batch)
            _ = float(metrics["loss"])  # sync
            ts.append(time.time() - t0)
        best = min(ts)
        print(f"{fname}: warm step {1e3*best:.1f} ms = {B/best:.0f} img/s "
              f"(B={B}, single chip)", flush=True)
        return best

    t_tower = step_time("alexnet_2tower.pbtxt")
    t_plain = step_time("alexnet.pbtxt")
    print(
        f"two-tower vs single-tower @B=256: {1e3*t_tower:.1f} vs "
        f"{1e3*t_plain:.1f} ms (towers halve conv2/4/5 FLOPs; "
        "context only, headline stays the classic net)",
        flush=True,
    )
    print("CHIP6 OK", flush=True)


if __name__ == "__main__":
    main()
