"""Pallas maxpool forward (ops/pool.py): bit-equality vs the XLA
reduce-window across both layout forms + the select-and-scatter
gradient (the backward is shared, so grads must be array-equal too)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from convnet_tpu.ops.pool import (
    _maxpool_pallas,
    _pool_form,
    _xla_maxpool,
    maxpool2d,
)


def _x(shape, dtype=jnp.bfloat16, seed=0):
    rng = np.random.RandomState(seed)
    return jnp.asarray(rng.randn(*shape), dtype)


# (shape, kernel, stride): AlexNet pool1/2/5 geometries at a reduced
# batch (both pad-free exact covers) + an even-W case + f32
CASES = [
    ((16, 55, 55, 96), 3, 2),    # pool1: bminor (C*B = 1536 lanes)
    ((8, 27, 27, 256), 3, 2),    # pool2: cminor
    ((8, 13, 13, 256), 3, 2),    # pool5: cminor
    ((16, 12, 12, 24), 2, 2),    # non-overlapping window, even W
    ((16, 11, 11, 48), 3, 2),    # odd W, bminor
]


@pytest.mark.parametrize("shape,k,s", CASES)
def test_forward_bit_equal(shape, k, s):
    x = _x(shape)
    form = _pool_form(x, k, s, 0)
    assert form is not None, (shape, k, s)
    want = _xla_maxpool(x, k, s, 0)
    got = _maxpool_pallas(x, k, s, 0, form)
    assert got.shape == want.shape
    np.testing.assert_array_equal(
        np.asarray(got, np.float32), np.asarray(want, np.float32)
    )


def test_form_rejects_window_larger_than_input():
    # h < kernel: Python's negative modulo used to admit this as an
    # "exact cover" with a zero-sized Pallas output, where XLA's
    # ceil-mode pool produces 1 output row
    x = _x((16, 1, 1, 128))
    assert _pool_form(x, 3, 2, 0) is None


def test_forward_f32():
    x = _x((8, 27, 27, 256), jnp.float32, seed=3)
    form = _pool_form(x, 3, 2, 0)
    got = _maxpool_pallas(x, 3, 2, 0, form)
    np.testing.assert_array_equal(
        np.asarray(got), np.asarray(_xla_maxpool(x, 3, 2, 0))
    )


def test_gradient_equals_xla_path():
    """The custom VJP routes through the same select-and-scatter as the
    XLA forward's autodiff — gradients must be ARRAY-equal."""
    x = _x((8, 27, 27, 256), jnp.float32, seed=5)
    w = _x((8, 13, 13, 256), jnp.float32, seed=6)
    form = _pool_form(x, 3, 2, 0)

    def f_pallas(xx):
        return jnp.sum(_maxpool_pallas(xx, 3, 2, 0, form) * w)

    def f_xla(xx):
        return jnp.sum(_xla_maxpool(xx, 3, 2, 0) * w)

    g1 = jax.grad(f_pallas)(x)
    g2 = jax.grad(f_xla)(x)
    np.testing.assert_array_equal(np.asarray(g1), np.asarray(g2))


def test_dispatch_gates():
    # padding, ragged cover, tiny lane dim, wide kernel -> XLA fallback
    assert _pool_form(_x((8, 27, 27, 256)), 3, 2, 1) is None  # pad
    assert _pool_form(_x((8, 28, 28, 256)), 3, 2, 0) is None  # ragged
    assert _pool_form(_x((1, 27, 27, 96)), 3, 2, 0) is None  # 96 lanes
    assert _pool_form(_x((8, 27, 27, 256)), 5, 2, 0) is None  # k > 2s
    # maxpool2d with backend forced off matches anyway (sanity)
    x = _x((8, 13, 13, 256))
    np.testing.assert_array_equal(
        np.asarray(maxpool2d(x, 3, 2, 0), np.float32),
        np.asarray(_xla_maxpool(x, 3, 2, 0), np.float32),
    )


def test_under_mesh_matches(monkeypatch):
    """shard_map'd form on the 8-device CPU mesh == single device."""
    from convnet_tpu.parallel.mesh import make_mesh

    if len(jax.devices()) < 8:
        pytest.skip("needs >= 8 devices (single-chip TPU run)")

    monkeypatch.setenv("CONVNET_POOL_BACKEND", "pallas")
    x = _x((16, 27, 27, 256), seed=9)
    mesh = make_mesh(4, 2)
    form = _pool_form(x, 3, 2, 0, mesh)
    assert form == "cminor"
    want = _xla_maxpool(x, 3, 2, 0)
    got = _maxpool_pallas(x, 3, 2, 0, form, mesh)
    np.testing.assert_array_equal(
        np.asarray(got, np.float32), np.asarray(want, np.float32)
    )


def test_train_step_matches_xla_pool(monkeypatch):
    """Full train step with CONVNET_POOL_BACKEND=pallas equals the XLA
    pool path (forward bit-equal, backward shared)."""
    from convnet_tpu import config
    from convnet_tpu.graph import build_graph
    from convnet_tpu.trainer import init_state, make_train_step

    NET = """
    name: "pp"
    seed: 2
    layer { name: "input" is_input: true num_channels: 8 image_size: 13 }
    layer { name: "conv1" num_channels: 16 activation: RECTIFIED_LINEAR }
    layer { name: "pool1" num_channels: 16 }
    layer { name: "output" is_output: true num_channels: 5 activation: SOFTMAX data_field: "labels" }
    edge { source: "input" dest: "conv1" edge_type: CONV kernel_size: 3 stride: 1 padding: 1
           initialization: DENSE_GAUSSIAN init_wt: 0.1
           weight_optimizer { base_epsilon: 0.05 initial_momentum: 0.9 final_momentum: 0.9 } }
    edge { source: "conv1" dest: "pool1" edge_type: MAXPOOL kernel_size: 3 stride: 2 }
    edge { source: "pool1" dest: "output" edge_type: FC initialization: DENSE_GAUSSIAN_SQRT_FAN_IN init_wt: 1.0
           weight_optimizer { base_epsilon: 0.05 initial_momentum: 0.9 final_momentum: 0.9 } }
    """
    g = build_graph(config.parse_model(NET))
    rng = np.random.RandomState(0)
    x = rng.rand(16, 13, 13, 8).astype(np.float32)
    y = rng.randint(0, 5, 16).astype(np.int32)
    results = {}
    for mode in ("xla", "pallas"):
        monkeypatch.setenv("CONVNET_POOL_BACKEND", mode)
        jax.clear_caches()
        step = make_train_step(g)
        s = init_state(g)
        losses = []
        for _ in range(3):
            s, m = step(s, {"input": jnp.asarray(x), "labels": jnp.asarray(y)})
            losses.append(float(m["loss"]))
        results[mode] = losses
    assert results["xla"] == results["pallas"], results
