"""Fused crop+flip+normalize+s2d prologue (ops/prologue.py) vs the
composed XLA path it replaces."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from convnet_tpu import config
from convnet_tpu.data.jitter import JitterSpec, sample_crop_flip
from convnet_tpu.graph import build_graph
from convnet_tpu.ops.prologue import fused_crop_s2d, prologue_plan, s2d_geometry

NET = """
name: "pro"
seed: 2
compute_dtype: "bfloat16"
activation_dtype: "bfloat16"
layer { name: "input" is_input: true num_channels: 3 image_size: 16 }
layer { name: "conv1" num_channels: 8 activation: RECTIFIED_LINEAR }
layer { name: "output" is_output: true num_channels: 5 activation: SOFTMAX data_field: "labels" }
edge { source: "input" dest: "conv1" edge_type: CONV kernel_size: 5 stride: 4 padding: 0
       initialization: DENSE_GAUSSIAN init_wt: 0.1
       weight_optimizer { base_epsilon: 0.05 initial_momentum: 0.9 final_momentum: 0.9 } }
edge { source: "conv1" dest: "output" edge_type: FC initialization: DENSE_GAUSSIAN_SQRT_FAN_IN init_wt: 1.0
       weight_optimizer { base_epsilon: 0.05 initial_momentum: 0.9 final_momentum: 0.9 } }
"""


def _numpy_reference(x, oy, ox, flips, crop, kernel, stride, scale, mean):
    """crop -> flip -> x*scale - mean -> zero-pad -> s2d, channel order
    (row-phase, col-phase, cin)."""
    b = x.shape[0]
    cin = x.shape[3]
    s = stride
    _, _, tgt, p = s2d_geometry(crop, kernel, stride)
    out = np.zeros((b, p, p, s * s * cin), np.float32)
    for i in range(b):
        img = x[i, oy[i] : oy[i] + crop, ox[i] : ox[i] + crop, :].astype(np.float32)
        if flips is not None and flips[i]:
            img = img[:, ::-1, :]
        img = img * scale - (mean if mean is not None else 0.0)
        pad = np.zeros((tgt, tgt, cin), np.float32)
        pad[:crop, :crop] = img
        v = pad.reshape(p, s, p, s, cin).transpose(0, 2, 1, 3, 4).reshape(p, p, -1)
        out[i] = v
    return out


def test_fused_prologue_matches_numpy_reference():
    rng = np.random.RandomState(0)
    x = rng.randint(0, 256, (6, 20, 20, 3), dtype=np.uint8)
    key = jax.random.PRNGKey(3)
    oy, ox, flips = sample_crop_flip(key, 6, 20, 20, 16, True, True)
    mean = np.asarray([0.4, 0.5, 0.6], np.float32)
    got = fused_crop_s2d(
        jnp.asarray(x), oy, ox, flips,
        crop=16, kernel=5, stride=4, scale=1 / 255, mean=mean, interpret=True,
    )
    want = _numpy_reference(
        x, np.asarray(oy), np.asarray(ox), np.asarray(flips),
        16, 5, 4, 1 / 255, mean,
    )
    np.testing.assert_allclose(
        np.asarray(got.x, np.float32), want, rtol=1e-2, atol=4e-3
    )  # bf16 output rounding
    assert got.stride == 4
    assert got.x.shape == (6, 5, 5, 48)


def test_fused_prologue_train_step_matches_unfused(monkeypatch, tmp_path):
    """The full train step is numerically identical with the fused
    prologue on and off (same augmentation stream, same conv route)."""
    from convnet_tpu.trainer import init_state, make_train_step

    g = build_graph(config.parse_model(NET))
    assert prologue_plan(g, "input") is not None
    jitter = {
        "input": (
            JitterSpec(image_size=16, can_translate=True, can_flip=True, scale=1 / 255),
            np.full((3,), 0.45, np.float32),
            None,
        )
    }
    rng = np.random.RandomState(1)
    batches = [
        {
            "input": jnp.asarray(rng.randint(0, 256, (8, 20, 20, 3)).astype(np.uint8)),
            "labels": jnp.asarray(rng.randint(0, 5, (8,)).astype(np.int32)),
        }
        for _ in range(2)
    ]

    results = {}
    for mode in ("0", "1"):
        monkeypatch.setenv("CONVNET_FUSED_PROLOGUE", mode)
        step = make_train_step(g, jitter)
        s = init_state(g)
        losses = []
        for b in batches:
            s, m = step(s, b)
            losses.append(float(m["loss"]))
        results[mode] = (losses, jax.device_get(s["params"]))

    np.testing.assert_allclose(results["0"][0], results["1"][0], rtol=1e-5)
    for e in results["0"][1]:
        np.testing.assert_allclose(
            np.asarray(results["0"][1][e]["w"]),
            np.asarray(results["1"][1][e]["w"]),
            rtol=1e-4, atol=1e-6, err_msg=e,
        )


def test_prologue_plan_gates():
    """Ineligible graphs (stride 1, f32 compute, multi-consumer) fall
    back to the unfused path."""
    g_f32 = build_graph(config.parse_model(NET.replace('compute_dtype: "bfloat16"', "")))
    assert prologue_plan(g_f32, "input") is None
    g_s1 = build_graph(
        config.parse_model(NET.replace("stride: 4", "stride: 1").replace("padding: 0", "padding: 2"))
    )
    assert prologue_plan(g_s1, "input") is None
