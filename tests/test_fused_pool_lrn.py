"""Fused LRN->maxpool backward: Pallas kernel vs the comparison-form
oracle composition, tie-free agreement with autodiff, and the model-level
wiring. Runs the kernel in interpret mode on CPU; `make test-tpu` adds
the compiled hardware case (tests/test_tpu_numerics.py)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from convnet_tpu.ops.fused_pool_lrn import lrn_maxpool
from convnet_tpu.ops.lrn import response_norm_cross_map
from convnet_tpu.ops.pool import maxpool2d

ARGS = dict(add_scale=0.001, pow_scale=0.75)


def _vjp(x, g, backend, *, frac, blocked=False, pk=3, ps=2, fuse_relu=False,
         monkeypatch=None):
    if monkeypatch is not None:
        monkeypatch.setenv("CONVNET_POOL_LRN_BACKEND", backend)
    fn = lambda a: lrn_maxpool(
        a, ARGS["add_scale"], ARGS["pow_scale"], frac, blocked, pk, ps, 0,
        fuse_relu, backend,
    )
    y, vjp = jax.vjp(fn, x)
    (dx,) = vjp(g)
    return y, dx


@pytest.mark.parametrize(
    "b,h,c,pk,ps,frac,blocked,fuse_relu",
    [
        (8, 6, 8, 3, 2, 5.0 / 8, False, False),
        (8, 6, 8, 3, 2, 5.0 / 8, False, True),
        (8, 8, 16, 2, 2, 4.0 / 16, True, False),
        (4, 7, 8, 3, 2, 3.0 / 8, False, True),   # odd H/W: ceil-mode pad, wsplit=1
        (8, 10, 8, 3, 3, 5.0 / 8, False, False),  # stride 3: single view
    ],
)
def test_fused_bwd_matches_oracle_with_ties(
    b, h, c, pk, ps, frac, blocked, fuse_relu, monkeypatch
):
    """Quantized inputs (heavy ties) + fuse_relu zeros: the Pallas kernel
    must match the comparison-form oracle composition exactly-ish."""
    rng = np.random.RandomState(0)
    # quantize to force tied window maxima; negatives exercise relu zeros
    x = jnp.asarray(np.round(rng.randn(b, h, h, c) * 2) / 2, jnp.float32)
    oh = -(-max(h - pk, 0) // ps) + 1
    g = jnp.asarray(rng.randn(b, oh, oh, c), jnp.float32)

    y_p, dx_p = _vjp(x, g, "pallas", frac=frac, blocked=blocked, pk=pk, ps=ps,
                     fuse_relu=fuse_relu, monkeypatch=monkeypatch)
    y_x, dx_x = _vjp(x, g, "xla", frac=frac, blocked=blocked, pk=pk, ps=ps,
                     fuse_relu=fuse_relu, monkeypatch=monkeypatch)
    np.testing.assert_allclose(np.asarray(y_p), np.asarray(y_x), rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(dx_p), np.asarray(dx_x), rtol=1e-4, atol=1e-5)


def test_fused_bwd_wsplit_path(monkeypatch):
    """Force the halved-row tiling (the AlexNet-scale VMEM shape) on a
    small even-W case and check against the oracle."""
    monkeypatch.setenv("CONVNET_PLRN_WSPLIT", "2")
    rng = np.random.RandomState(1)
    x = jnp.asarray(np.round(rng.randn(8, 6, 6, 8) * 2) / 2, jnp.float32)
    g = jnp.asarray(rng.randn(8, 3, 3, 8), jnp.float32)
    y_p, dx_p = _vjp(x, g, "pallas", frac=5.0 / 8, monkeypatch=monkeypatch)
    monkeypatch.delenv("CONVNET_PLRN_WSPLIT")
    y_x, dx_x = _vjp(x, g, "xla", frac=5.0 / 8, monkeypatch=monkeypatch)
    np.testing.assert_allclose(np.asarray(dx_p), np.asarray(dx_x), rtol=1e-4, atol=1e-5)


def test_fused_lane_aligned_c(monkeypatch):
    """The CONVNET_PLRN_CMINOR=1 regime (lane-aligned C, e.g. AlexNet
    rnorm2's 256): same kernel, C a multiple of 128 — vs the oracle."""
    rng = np.random.RandomState(9)
    x = jnp.asarray(np.round(rng.randn(4, 6, 6, 128) * 2) / 2, jnp.float32)
    g = jnp.asarray(rng.randn(4, 3, 3, 128), jnp.float32)
    y_p, dx_p = _vjp(x, g, "pallas", frac=5.0 / 128, monkeypatch=monkeypatch)
    y_x, dx_x = _vjp(x, g, "xla", frac=5.0 / 128, monkeypatch=monkeypatch)
    np.testing.assert_allclose(np.asarray(y_p), np.asarray(y_x), rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(dx_p), np.asarray(dx_x), rtol=1e-4, atol=1e-5)


def test_fused_matches_autodiff_when_tie_free(monkeypatch):
    """On tie-free input the comparison form equals select-and-scatter,
    so the fused op's grad must equal autodiff of the plain composition."""
    monkeypatch.setenv("CONVNET_POOL_LRN_BACKEND", "pallas")
    rng = np.random.RandomState(2)
    # distinct values: iid continuous, no relu fusing
    x = jnp.asarray(rng.randn(4, 7, 7, 8), jnp.float32)
    g = jnp.asarray(rng.randn(4, 3, 3, 8), jnp.float32)
    frac = 5.0 / 8

    _, vjp_f = jax.vjp(
        lambda a: lrn_maxpool(a, 0.001, 0.75, frac, False, 3, 2, 0), x
    )
    _, vjp_c = jax.vjp(
        lambda a: maxpool2d(
            response_norm_cross_map(a, 0.001, 0.75, frac), 3, 2
        ),
        x,
    )
    np.testing.assert_allclose(
        np.asarray(vjp_f(g)[0]), np.asarray(vjp_c(g)[0]), rtol=1e-4, atol=1e-5
    )


def test_fused_bwd_bf16(monkeypatch):
    """bf16 I/O (the bench dtype): kernel vs oracle at bf16 tolerance."""
    rng = np.random.RandomState(3)
    x = jnp.asarray(np.round(rng.randn(8, 6, 6, 8) * 2) / 2, jnp.bfloat16)
    g = jnp.asarray(rng.randn(8, 3, 3, 8), jnp.bfloat16)
    y_p, dx_p = _vjp(x, g, "pallas", frac=5.0 / 8, fuse_relu=True,
                     monkeypatch=monkeypatch)
    y_x, dx_x = _vjp(x, g, "xla", frac=5.0 / 8, fuse_relu=True,
                     monkeypatch=monkeypatch)
    assert dx_p.dtype == jnp.bfloat16
    np.testing.assert_allclose(
        np.asarray(dx_p, np.float32), np.asarray(dx_x, np.float32),
        rtol=2e-2, atol=2e-2,
    )


def test_model_level_fusion_matches_default_when_tie_free(monkeypatch):
    """A conv->rnorm->pool->fc graph trained with CONVNET_POOL_LRN_FUSED=1
    must match the default path's loss and gradients on tie-free input
    (LINEAR source activation, so no post-ReLU zero ties)."""
    from convnet_tpu import config, model as model_lib
    from convnet_tpu.graph import build_graph

    pbtxt = """
name: "fuse_test"
seed: 7
layer { name: "input" num_channels: 8 is_input: true data_field: "input" }
layer { name: "conv1" num_channels: 8 activation: LINEAR }
layer { name: "rnorm1" num_channels: 8 activation: LINEAR }
layer { name: "pool1" num_channels: 8 activation: LINEAR }
layer { name: "out" num_channels: 4 is_output: true activation: SOFTMAX
        loss_function: CROSS_ENTROPY_MULTINOMIAL data_field: "labels" }
edge { source: "input" dest: "conv1" edge_type: CONV kernel_size: 3
       stride: 1 padding: 1 initialization: DENSE_GAUSSIAN init_wt: 0.1 }
edge { source: "conv1" dest: "rnorm1" edge_type: RESPONSE_NORM
       add_scale: 0.001 pow_scale: 0.75 frac_of_filters_response_norm: 0.5 }
edge { source: "rnorm1" dest: "pool1" edge_type: MAXPOOL kernel_size: 2 stride: 2 }
edge { source: "pool1" dest: "out" edge_type: FC initialization: DENSE_GAUSSIAN
       init_wt: 0.1 }
"""
    model = config.parse_model(pbtxt)
    graph = build_graph(model, {"input": 8})
    params = model_lib.init_params(graph, seed=0)
    rng = np.random.RandomState(4)
    batch = {
        "input": jnp.asarray(rng.randn(8, 8, 8, 8), jnp.float32),
        "labels": jnp.asarray(rng.randint(0, 4, (8,)), jnp.int32),
    }

    def lossval(p):
        return model_lib.loss_fn(graph, p, batch, train=True,
                                 dropout_rng=jax.random.PRNGKey(0))[0]

    l0, g0 = jax.value_and_grad(lossval)(params)
    monkeypatch.setenv("CONVNET_POOL_LRN_FUSED", "1")
    monkeypatch.setenv("CONVNET_POOL_LRN_BACKEND", "pallas")
    l1, g1 = jax.value_and_grad(lossval)(params)
    np.testing.assert_allclose(float(l0), float(l1), rtol=1e-6)
    for k in g0:
        for kk in g0[k]:
            np.testing.assert_allclose(
                np.asarray(g0[k][kk]), np.asarray(g1[k][kk]),
                rtol=1e-4, atol=1e-5,
                err_msg=f"{k}/{kk}",
            )


def test_fusion_skipped_when_lrn_requested(monkeypatch):
    """Feature extraction asking for the LRN layer's activations must
    bypass the fusion (the layer has to materialize)."""
    from convnet_tpu import config, model as model_lib
    from convnet_tpu.graph import build_graph

    monkeypatch.setenv("CONVNET_POOL_LRN_FUSED", "1")
    pbtxt = """
name: "fuse_skip"
layer { name: "input" num_channels: 8 is_input: true data_field: "input" }
layer { name: "rnorm1" num_channels: 8 activation: LINEAR }
layer { name: "pool1" num_channels: 8 activation: LINEAR }
layer { name: "out" num_channels: 4 is_output: true activation: SOFTMAX
        loss_function: CROSS_ENTROPY_MULTINOMIAL data_field: "labels" }
edge { source: "input" dest: "rnorm1" edge_type: RESPONSE_NORM
       add_scale: 0.001 pow_scale: 0.75 frac_of_filters_response_norm: 0.5 }
edge { source: "rnorm1" dest: "pool1" edge_type: MAXPOOL kernel_size: 2 stride: 2 }
edge { source: "pool1" dest: "out" edge_type: FC initialization: DENSE_GAUSSIAN
       init_wt: 0.1 }
"""
    model = config.parse_model(pbtxt)
    graph = build_graph(model, {"input": 8})
    params = model_lib.init_params(graph, seed=0)
    rng = np.random.RandomState(5)
    batch = {"input": jnp.asarray(rng.randn(4, 8, 8, 8), jnp.float32)}
    outs = model_lib.apply_fn(
        graph, params, batch, train=True, dropout_rng=jax.random.PRNGKey(0),
        return_layers=["rnorm1", "pool1"],
    )
    assert outs["rnorm1"].shape == (4, 8, 8, 8)
    assert outs["pool1"].shape == (4, 4, 4, 8)
