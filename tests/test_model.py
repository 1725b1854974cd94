"""Model builder + gradient checks (the reference's grad_check oracle,
src/grad_check.cc [U], reproduced as unit tests)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from convnet_tpu import config, model as model_lib
from convnet_tpu.cli.grad_check import check_graph, synth_batch
from convnet_tpu.graph import build_graph

TINY_NET = """
name: "tiny"
seed: 7
layer { name: "input" is_input: true num_channels: 3 image_size: 8 }
layer { name: "conv1" num_channels: 8 activation: RECTIFIED_LINEAR }
layer { name: "rnorm1" num_channels: 8 }
layer { name: "pool1" num_channels: 8 }
layer { name: "local1" num_channels: 6 activation: RECTIFIED_LINEAR }
layer { name: "onexone" num_channels: 4 activation: TANH }
layer { name: "fc1" num_channels: 16 activation: LOGISTIC }
layer { name: "output" is_output: true num_channels: 5 activation: SOFTMAX data_field: "labels" }
edge { source: "input" dest: "conv1" edge_type: CONV kernel_size: 3 stride: 1 padding: 1
       initialization: DENSE_GAUSSIAN init_wt: 0.1 }
edge { source: "conv1" dest: "rnorm1" edge_type: RESPONSE_NORM
       add_scale: 0.01 pow_scale: 0.75 frac_of_filters_response_norm: 0.5 }
edge { source: "rnorm1" dest: "pool1" edge_type: MAXPOOL kernel_size: 2 stride: 2 }
edge { source: "pool1" dest: "local1" edge_type: LOCAL kernel_size: 3 stride: 1 padding: 1
       initialization: DENSE_GAUSSIAN init_wt: 0.1 init_bias: 0.05 }
edge { source: "local1" dest: "onexone" edge_type: CONV_ONETOONE
       initialization: DENSE_GAUSSIAN init_wt: 0.2 }
edge { source: "onexone" dest: "fc1" edge_type: FC
       initialization: DENSE_GAUSSIAN_SQRT_FAN_IN init_wt: 1.0 }
edge { source: "fc1" dest: "output" edge_type: FC
       initialization: DENSE_GAUSSIAN_SQRT_FAN_IN init_wt: 1.0 }
"""


@pytest.fixture(scope="module")
def tiny():
    return build_graph(config.parse_model(TINY_NET))


def test_init_param_shapes(tiny):
    params = model_lib.init_params(tiny)
    assert params["input:conv1"]["w"].shape == (3, 3, 3, 8)
    assert params["input:conv1"]["b"].shape == (8,)
    assert params["pool1:local1"]["w"].shape == (4, 4, 3 * 3 * 8, 6)
    assert params["local1:onexone"]["w"].shape == (6, 4)
    assert params["onexone:fc1"]["w"].shape == (4 * 4 * 4, 16)
    assert params["fc1:output"]["w"].shape == (16, 5)


def test_forward_shapes_and_determinism(tiny):
    params = model_lib.init_params(tiny)
    rng = np.random.RandomState(0)
    batch = synth_batch(tiny, 4, rng)
    out1 = model_lib.apply_fn(tiny, params, batch)
    out2 = model_lib.apply_fn(tiny, params, batch)
    assert out1["conv1"].shape == (4, 8, 8, 8)
    assert out1["pool1"].shape == (4, 4, 4, 8)
    assert out1["local1"].shape == (4, 4, 4, 6)
    assert out1["output"].shape == (4, 1, 1, 5)
    # softmax activation sums to 1
    np.testing.assert_allclose(
        np.asarray(out1["output"]).sum(-1), np.ones((4, 1, 1)), rtol=1e-5
    )
    np.testing.assert_array_equal(np.asarray(out1["output"]), np.asarray(out2["output"]))


def test_dropout_train_vs_eval():
    m = config.parse_model(
        """
        name: "d"
        layer { name: "input" is_input: true num_channels: 8 }
        layer { name: "h" num_channels: 32 activation: RECTIFIED_LINEAR dropprob: 0.5 }
        layer { name: "output" is_output: true num_channels: 4 activation: SOFTMAX data_field: "labels" }
        edge { source: "input" dest: "h" edge_type: FC initialization: CONSTANT init_wt: 0.1 }
        edge { source: "h" dest: "output" edge_type: FC initialization: CONSTANT init_wt: 0.1 }
        """
    )
    g = build_graph(m)
    params = model_lib.init_params(g)
    x = {"input": jnp.ones((2, 1, 1, 8))}
    eval_out = model_lib.apply_fn(g, params, x)["h"]
    rng = jax.random.PRNGKey(0)
    train_out = model_lib.apply_fn(g, params, x, train=True, dropout_rng=rng)["h"]
    # some units must be zeroed at train time, none at eval
    assert np.asarray(eval_out).min() > 0
    assert (np.asarray(train_out) == 0).any()
    # inverted dropout: surviving units scaled by 1/keep
    nz = np.asarray(train_out)[np.asarray(train_out) > 0]
    np.testing.assert_allclose(nz, 2 * np.asarray(eval_out).max(), rtol=1e-5)


def test_grad_check_all_edge_types(tiny):
    failures, max_rel = check_graph(tiny, batch_size=4, samples=6, log=lambda *_: None)
    assert failures == 0, f"gradient check failed (max rel err {max_rel})"


def test_multi_output_and_multi_input_grads():
    m = config.parse_model(
        """
        name: "multi"
        layer { name: "input" is_input: true num_channels: 6 }
        layer { name: "h" num_channels: 12 activation: TANH }
        layer { name: "out_a" is_output: true num_channels: 3 activation: SOFTMAX data_field: "labels_a" }
        layer { name: "out_b" is_output: true num_channels: 4 activation: LOGISTIC data_field: "labels_b" }
        edge { source: "input" dest: "h" edge_type: FC initialization: DENSE_GAUSSIAN init_wt: 0.3 }
        edge { source: "input" dest: "out_a" edge_type: FC initialization: DENSE_GAUSSIAN init_wt: 0.3 }
        edge { source: "h" dest: "out_a" edge_type: FC initialization: DENSE_GAUSSIAN init_wt: 0.3 }
        edge { source: "h" dest: "out_b" edge_type: FC initialization: DENSE_GAUSSIAN init_wt: 0.3 }
        """
    )
    g = build_graph(m)
    failures, max_rel = check_graph(g, batch_size=4, samples=8, log=lambda *_: None)
    assert failures == 0, f"max rel err {max_rel}"


def test_bfloat16_compute_close_to_f32(tiny):
    params = model_lib.init_params(tiny)
    rng = np.random.RandomState(1)
    batch = synth_batch(tiny, 4, rng)
    bf = build_graph(config.parse_model(TINY_NET.replace('name: "tiny"', 'name: "tiny" compute_dtype: "bfloat16"')))
    out32 = model_lib.apply_fn(tiny, params, batch)["output"]
    out16 = model_lib.apply_fn(bf, params, batch)["output"]
    np.testing.assert_allclose(np.asarray(out32), np.asarray(out16), atol=0.05)


def test_remat_matches_no_remat():
    """Model.remat must not change numerics — only the backward schedule."""
    base = config.parse_model(TINY_NET)
    g_plain = build_graph(base)
    base.remat = True
    g_remat = build_graph(base)
    params = model_lib.init_params(g_plain)
    rng = np.random.RandomState(3)
    batch = synth_batch(g_plain, 4, rng)

    def loss(g, p):
        return model_lib.loss_fn(g, p, batch, train=True,
                                 dropout_rng=jax.random.PRNGKey(0))[0]

    l1, grads1 = jax.value_and_grad(lambda p: loss(g_plain, p))(params)
    l2, grads2 = jax.value_and_grad(lambda p: loss(g_remat, p))(params)
    np.testing.assert_allclose(float(l1), float(l2), rtol=1e-6)
    for k in grads1:
        np.testing.assert_allclose(
            np.asarray(grads1[k]["w"]), np.asarray(grads2[k]["w"]), rtol=1e-5, atol=1e-6
        )


def test_unshared_conv_bias():
    m = config.parse_model(
        """
        name: "ub"
        layer { name: "input" is_input: true num_channels: 2 image_size: 6 }
        layer { name: "c" num_channels: 3 activation: RECTIFIED_LINEAR }
        layer { name: "output" is_output: true num_channels: 2 activation: SOFTMAX data_field: "labels" }
        edge { source: "input" dest: "c" edge_type: CONV kernel_size: 3 stride: 1 padding: 1
               shared_bias: false initialization: DENSE_GAUSSIAN init_wt: 0.2 init_bias: 0.1 }
        edge { source: "c" dest: "output" edge_type: FC initialization: DENSE_GAUSSIAN_SQRT_FAN_IN init_wt: 1.0 }
        """
    )
    g = build_graph(m)
    params = model_lib.init_params(g)
    assert params["input:c"]["b"].shape == (6, 6, 3)  # per-location bias
    failures, max_rel = check_graph(g, batch_size=4, samples=6, log=lambda *_: None)
    assert failures == 0, f"max rel err {max_rel}"


def test_two_input_layers():
    m = config.parse_model(
        """
        name: "two"
        layer { name: "img" is_input: true num_channels: 2 image_size: 4 }
        layer { name: "side" is_input: true num_channels: 8 }
        layer { name: "h" num_channels: 8 activation: TANH }
        layer { name: "output" is_output: true num_channels: 3 activation: SOFTMAX data_field: "labels" }
        edge { source: "img" dest: "h" edge_type: FC initialization: DENSE_GAUSSIAN init_wt: 0.2 }
        edge { source: "side" dest: "h" edge_type: FC initialization: DENSE_GAUSSIAN init_wt: 0.2 }
        edge { source: "h" dest: "output" edge_type: FC initialization: DENSE_GAUSSIAN init_wt: 0.2 }
        """
    )
    g = build_graph(m)
    assert len(g.input_layers) == 2
    failures, max_rel = check_graph(g, batch_size=4, samples=6, log=lambda *_: None)
    assert failures == 0, f"max rel err {max_rel}"


def test_autoencoder_family_trains():
    """The RGBTOYUV/DOWNSAMPLE/UPSAMPLE + SQUARED_ERROR family: grads
    check out and reconstruction loss drops."""
    import os

    from convnet_tpu.trainer import init_state, make_train_step

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    g = build_graph(config.read_model(
        os.path.join(repo, "examples/autoencoder/conv_autoencoder.pbtxt")),
        {"input": 16})  # downsized for CPU speed
    assert g.shapes["down"] == (8, 8, 3)
    assert g.shapes["up"] == (16, 16, 32)
    assert g.shapes["output"] == (16, 16, 3)

    failures, max_rel = check_graph(g, batch_size=2, samples=4, eps=1e-6, use_x64=True, log=lambda *_: None)
    assert failures == 0, f"max rel err {max_rel}"

    step = make_train_step(g)
    state = init_state(g)
    rng = np.random.RandomState(0)
    batch = {"input": jnp.asarray(rng.rand(32, 16, 16, 3).astype(np.float32))}
    losses = []
    for _ in range(30):
        state, m = step(state, batch)
        losses.append(float(m["loss"]))
    assert losses[-1] < 0.5 * losses[0], f"reconstruction loss stuck: {losses[0]:.4f} -> {losses[-1]:.4f}"


def test_bf16_activation_storage_close_to_f32(tiny):
    params = model_lib.init_params(tiny)
    rng = np.random.RandomState(2)
    batch = synth_batch(tiny, 4, rng)
    text = TINY_NET.replace(
        'name: "tiny"',
        'name: "tiny" compute_dtype: "bfloat16" activation_dtype: "bfloat16"',
    )
    gbf = build_graph(config.parse_model(text))
    out32 = model_lib.apply_fn(tiny, params, batch)["output"]
    out16 = model_lib.apply_fn(gbf, params, batch)["output"]
    np.testing.assert_allclose(np.asarray(out32), np.asarray(out16), atol=0.07)
    # gradients still flow and are finite
    g = jax.grad(lambda p: model_lib.loss_fn(gbf, p, batch, train=False)[0])(params)
    for leaf in jax.tree.leaves(g):
        assert np.isfinite(np.asarray(leaf)).all()


def test_graph_identity_includes_precision_and_remat(tiny):
    """Graphs differing only in compute dtype / remat must not compare
    equal (they would otherwise share a jit trace compiled for the other
    configuration)."""
    import dataclasses

    bf16 = dataclasses.replace(tiny, compute_dtype="bfloat16")
    remat = dataclasses.replace(tiny, remat=True)
    assert tiny != bf16 and tiny != remat and bf16 != remat
    assert hash(tiny) != hash(bf16) or tiny._key != bf16._key
    same = dataclasses.replace(tiny)
    assert tiny == same and hash(tiny) == hash(same)


def test_grad_check_grouped_conv():
    """Finite-difference gradient check through a grouped-conv edge
    (num_groups: 2 — both the direct feature_group_count route and the
    per-group im2col route, chosen by per-group Cin)."""
    m = config.parse_model(
        """
        name: "grouped"
        layer { name: "input" is_input: true num_channels: 8 image_size: 6 }
        layer { name: "c1" num_channels: 12 activation: RECTIFIED_LINEAR }
        layer { name: "output" is_output: true num_channels: 3 activation: SOFTMAX data_field: "labels" }
        edge { source: "input" dest: "c1" edge_type: CONV kernel_size: 3 stride: 1 padding: 1
               num_groups: 2 initialization: DENSE_GAUSSIAN init_wt: 0.3 }
        edge { source: "c1" dest: "output" edge_type: FC initialization: DENSE_GAUSSIAN_SQRT_FAN_IN init_wt: 1.0 }
        """
    )
    g = build_graph(m)
    assert model_lib.param_shapes(g)["input:c1"]["w"] == (3, 3, 4, 12)
    failures, max_rel = check_graph(g, batch_size=4, samples=6, log=lambda *_: None)
    assert failures == 0, f"gradient check failed (max rel err {max_rel})"


def test_grouped_conv_rejected_on_non_conv_and_indivisible():
    import pytest

    bad = config.parse_model(
        """
        name: "bad"
        layer { name: "input" is_input: true num_channels: 8 }
        layer { name: "output" is_output: true num_channels: 4 activation: SOFTMAX }
        edge { source: "input" dest: "output" edge_type: FC num_groups: 2 }
        """
    )
    with pytest.raises(ValueError, match="only supported on CONV"):
        build_graph(bad)
    m = config.parse_model(
        """
        name: "bad2"
        layer { name: "input" is_input: true num_channels: 6 image_size: 4 }
        layer { name: "c" num_channels: 8 activation: RECTIFIED_LINEAR }
        layer { name: "output" is_output: true num_channels: 4 activation: SOFTMAX data_field: "labels" }
        edge { source: "input" dest: "c" edge_type: CONV kernel_size: 3 stride: 1 padding: 1 num_groups: 4 }
        edge { source: "c" dest: "output" edge_type: FC }
        """
    )
    with pytest.raises(ValueError, match="must divide"):
        build_graph(m)
