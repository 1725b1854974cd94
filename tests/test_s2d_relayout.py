"""Phase-major jitter einsum + Pallas s2d relayout (ops/s2d_relayout.py)
vs the composed XLA path it replaces (jitter_batch + conv2d's internal
pad/space-to-depth). The replacement must be BIT-exact at bf16: the
one-hot gathers select exact uint8 values and the affine runs in f32 in
both paths, so any difference is a bug, not rounding."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from convnet_tpu import config
from convnet_tpu.data.jitter import JitterSpec, jitter_batch, sample_crop_flip
from convnet_tpu.graph import build_graph
from convnet_tpu.ops.conv import ceil_mode_padding
from convnet_tpu.ops.s2d_relayout import (
    jitter_crop_phased,
    jitter_s2d,
    relayout_geometry,
    s2d_relayout,
)

B, RAW, CROP, KERNEL, STRIDE = 128, 12, 9, 5, 4

# compiled on the real chip under `make test-tpu`; interpreted on CPU
INTERP = jax.default_backend() == "cpu"


def _xla_s2d_view(x4, kernel, stride):
    """The x-side transform of ops.conv._space_to_depth_conv: pad to the
    ceil-mode extent and regroup (row-phase, col-phase, cin)."""
    b, h, w, cin = x4.shape
    s = stride
    from convnet_tpu.graph import conv_out_size

    out = conv_out_size(h, kernel, stride, 0)
    khp = -(-kernel // s) * s
    tgt = (out - 1) * s + khp
    pad_h = ceil_mode_padding(h, kernel, stride, 0)
    x4 = jnp.pad(x4, ((0, 0), (pad_h[0], tgt - h), (pad_h[0], tgt - w), (0, 0)))
    return (
        x4.reshape(b, tgt // s, s, tgt // s, s, cin)
        .transpose(0, 1, 3, 2, 4, 5)
        .reshape(b, tgt // s, tgt // s, s * s * cin)
    )


def _ref_relayout(z, stride, p_out, p_pad):
    """Plain-jnp reference for the Pallas relayout arrangement."""
    b, cin, n, _ = z.shape
    s, pp = stride, p_pad
    z6 = z.reshape(b, cin, s, pp, s, pp)
    return (
        jnp.transpose(z6, (0, 3, 5, 2, 4, 1))[:, :p_out, :p_out]
        .reshape(b, p_out, p_out, s * s * cin)
    )


def test_jitter_s2d_bit_exact_vs_xla_chain():
    rng = np.random.RandomState(0)
    x = rng.randint(0, 256, (B, RAW, RAW, 3), dtype=np.uint8)
    key = jax.random.PRNGKey(7)
    oy, ox, flips = sample_crop_flip(key, B, RAW, RAW, CROP, True, True)
    mean = np.asarray([0.4, 0.5, 0.6], np.float32)

    got = jitter_s2d(
        jnp.asarray(x), oy, ox, flips,
        crop=CROP, kernel=KERNEL, stride=STRIDE,
        scale=1 / 255, mean=mean, interpret=INTERP,
    )
    spec = JitterSpec(image_size=CROP, can_translate=True, can_flip=True, scale=1 / 255)
    xj = jitter_batch(jnp.asarray(x), spec, key, True, mean=mean)
    want = _xla_s2d_view(xj.astype(jnp.bfloat16), KERNEL, STRIDE)

    assert got.stride == STRIDE
    assert got.x.shape == want.shape
    np.testing.assert_array_equal(
        np.asarray(got.x, np.float32), np.asarray(want, np.float32)
    )


def test_phased_crop_pad_stays_zero_through_affine():
    """Folded ceil-mode pad positions must be exactly 0 even with a
    nonzero mean/std (the conv's implicit zero padding semantics)."""
    rng = np.random.RandomState(1)
    x = rng.randint(1, 256, (B, RAW, RAW, 3), dtype=np.uint8)
    oy = jnp.zeros((B,), jnp.int32)
    ox = jnp.zeros((B,), jnp.int32)
    p_grid, p_pad = relayout_geometry(CROP, KERNEL, STRIDE)
    z = jitter_crop_phased(
        jnp.asarray(x), oy, ox, None,
        crop=CROP, stride=STRIDE, p_pad=p_pad,
        scale=1 / 255, mean=np.asarray([0.4, 0.5, 0.6], np.float32),
        std=np.asarray([0.2, 0.2, 0.2], np.float32),
    )
    zf = np.asarray(z, np.float32)
    t = STRIDE * (np.arange(STRIDE * p_pad) % p_pad) + (
        np.arange(STRIDE * p_pad) // p_pad
    )
    invalid = t >= CROP
    assert zf[:, :, invalid, :].max(initial=0) == 0
    assert zf[:, :, invalid, :].min(initial=0) == 0
    assert zf[:, :, :, invalid].max(initial=0) == 0
    # and valid positions are NOT all zero (the mask isn't over-wide)
    assert np.abs(zf[:, :, ~invalid][:, :, :, ~invalid]).max() > 0


@pytest.mark.parametrize("kform", ["3d", "2d", "mxu"])
def test_relayout_kernel_and_vjp_match_reference(kform, monkeypatch):
    monkeypatch.setenv("CONVNET_S2D_RELAYOUT_KFORM", kform)
    rng = np.random.RandomState(2)
    p_grid, p_pad = relayout_geometry(CROP, KERNEL, STRIDE)
    z = jnp.asarray(
        rng.randn(B, 3, STRIDE * p_pad, STRIDE * p_pad), jnp.bfloat16
    )

    got = s2d_relayout(z, STRIDE, p_grid, p_pad, INTERP)
    want = _ref_relayout(z, STRIDE, p_grid, p_pad)
    np.testing.assert_array_equal(
        np.asarray(got, np.float32), np.asarray(want, np.float32)
    )

    w = jnp.asarray(rng.randn(*got.shape), jnp.bfloat16)
    g1 = jax.grad(lambda a: jnp.sum(s2d_relayout(a, STRIDE, p_grid, p_pad, INTERP) * w).astype(jnp.float32))(z)
    g2 = jax.grad(lambda a: jnp.sum(_ref_relayout(a, STRIDE, p_grid, p_pad) * w).astype(jnp.float32))(z)
    np.testing.assert_array_equal(
        np.asarray(g1, np.float32), np.asarray(g2, np.float32)
    )


NET = """
name: "relayout"
seed: 2
compute_dtype: "bfloat16"
activation_dtype: "bfloat16"
layer { name: "input" is_input: true num_channels: 3 image_size: 9 }
layer { name: "conv1" num_channels: 8 activation: RECTIFIED_LINEAR }
layer { name: "output" is_output: true num_channels: 5 activation: SOFTMAX data_field: "labels" }
edge { source: "input" dest: "conv1" edge_type: CONV kernel_size: 5 stride: 4 padding: 0
       initialization: DENSE_GAUSSIAN init_wt: 0.1
       weight_optimizer { base_epsilon: 0.05 initial_momentum: 0.9 final_momentum: 0.9 } }
edge { source: "conv1" dest: "output" edge_type: FC initialization: DENSE_GAUSSIAN_SQRT_FAN_IN init_wt: 1.0
       weight_optimizer { base_epsilon: 0.05 initial_momentum: 0.9 final_momentum: 0.9 } }
"""


def test_train_step_matches_default_path(monkeypatch):
    """Full train step with CONVNET_S2D_RELAYOUT=1 equals the default
    XLA chain (same augmentation stream, same conv route, same SGD)."""
    from convnet_tpu.trainer import init_state, make_train_step

    g = build_graph(config.parse_model(NET))
    jitter = {
        "input": (
            JitterSpec(image_size=CROP, can_translate=True, can_flip=True, scale=1 / 255),
            np.full((3,), 0.45, np.float32),
            None,
        )
    }
    rng = np.random.RandomState(3)
    batches = [
        {
            "input": jnp.asarray(rng.randint(0, 256, (B, RAW, RAW, 3)).astype(np.uint8)),
            "labels": jnp.asarray(rng.randint(0, 5, (B,)).astype(np.int32)),
        }
        for _ in range(2)
    ]

    results = {}
    for mode in ("0", "1"):
        monkeypatch.setenv("CONVNET_S2D_RELAYOUT", mode)
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


def test_relayout_gate_requires_lane_aligned_batch(monkeypatch):
    """B % 128 != 0 falls back to the default path (no crash)."""
    from convnet_tpu.trainer import init_state, make_train_step

    monkeypatch.setenv("CONVNET_S2D_RELAYOUT", "1")
    g = build_graph(config.parse_model(NET))
    jitter = {
        "input": (
            JitterSpec(image_size=CROP, can_translate=True, can_flip=True, scale=1 / 255),
            None,
            None,
        )
    }
    rng = np.random.RandomState(4)
    step = make_train_step(g, jitter)
    s = init_state(g)
    s, m = step(
        s,
        {
            "input": jnp.asarray(rng.randint(0, 256, (8, RAW, RAW, 3)).astype(np.uint8)),
            "labels": jnp.asarray(rng.randint(0, 5, (8,)).astype(np.int32)),
        },
    )
    assert np.isfinite(float(m["loss"]))


def test_predictor_serving_path_matches(monkeypatch):
    """The eval/serving prologue (Predictor center crop) through the
    relayout equals the default path bit-for-bit."""
    from convnet_tpu.model import init_params
    from convnet_tpu.predictor import Predictor

    g = build_graph(config.parse_model(NET))
    params = init_params(g, seed=0)
    jit_map = {
        "input": (
            JitterSpec(image_size=CROP, scale=1 / 255),
            np.full((3,), 0.45, np.float32),
            None,
        )
    }
    rng = np.random.RandomState(5)
    xb = rng.randint(0, 256, (B, RAW, RAW, 3), dtype=np.uint8)
    outs = {}
    for mode in ("0", "1"):
        monkeypatch.setenv("CONVNET_S2D_RELAYOUT", mode)
        pred = Predictor(
            g, params, batch_size=B, jitter=jit_map, raw_size=RAW,
            input_dtype=np.uint8,
        )
        outs[mode] = pred({"input": xb})["output"]
    np.testing.assert_array_equal(
        np.asarray(outs["0"], np.float32), np.asarray(outs["1"], np.float32)
    )


def test_bn_override_validation(monkeypatch):
    monkeypatch.setenv("CONVNET_S2D_RELAYOUT_BN", "192")
    p_grid, p_pad = relayout_geometry(CROP, KERNEL, STRIDE)
    z = jnp.zeros((B, 3, STRIDE * p_pad, STRIDE * p_pad), jnp.bfloat16)
    with pytest.raises(ValueError, match="multiple of 128"):
        s2d_relayout(z, STRIDE, p_grid, p_pad, INTERP)

@pytest.mark.parametrize(
    "b,cin,crop,kernel,stride",
    [
        (1024, 3, 224, 11, 4),  # AlexNet conv1: the shape that failed Mosaic
        (B, 3, CROP, KERNEL, STRIDE),  # this suite's geometry
        (256, 3, 224, 11, 4),
        (128, 1, 28, 5, 2),
    ],
)
def test_block_plan_is_mosaic_legal(b, cin, crop, kernel, stride):
    """Interpret mode does not enforce Mosaic's block rules; pin them
    statically: last two block dims divisible by (8, 128) or equal to
    the array dims, plus the double-buffered VMEM budget (~16 MB/core).
    Round 3 shipped a plan whose in-block last dim was Pp=64 — illegal —
    and only the on-chip A/B caught it."""
    from convnet_tpu.ops.s2d_relayout import block_plan

    p_out, p_pad = relayout_geometry(crop, kernel, stride)
    s, pp = stride, p_pad
    in_block, out_block, grid = block_plan(b, cin, s, pp, p_out)
    in_shape = (b, s * pp, s * pp)
    out_shape = (s * s * cin, p_out * p_out, b)  # 3D merged (K, P*P, B)

    def legal(block, shape):
        # rank-4 blocks crash the backend compiler (round-4 bisection)
        assert len(block) <= 3, block
        for bd, ad, tile in zip(block[-2:], shape[-2:], (8, 128)):
            assert bd % tile == 0 or bd == ad, (block, shape)

    legal(in_block, in_shape)
    legal(out_block, out_shape)
    # grid must tile the in array exactly on the blocked dims
    assert grid[0] * 16 == s * pp and grid[1] * in_block[0] == b
    live = 2 * (cin * np.prod(in_block) + np.prod(out_block))  # bf16
    assert 2 * live <= 16 * 2**20, f"double-buffered blocks {2*live/2**20:.1f} MB"


def test_phased_crop_dot_s8_matches_bf16(monkeypatch):
    """CONVNET_CROP_DOT=s8 (int8 MXU one-hot dots on the raw NHWC
    batch; pixels shifted -128 and restored only where the one-hots
    fired) must be BIT-exact vs the bf16 form, including the folded
    ceil-mode pad staying exactly 0 through the mean/std affine."""
    rng = np.random.RandomState(11)
    x = rng.randint(0, 256, (B, RAW, RAW, 3), dtype=np.uint8)
    x[0] = 255  # s8 overflow hazard the shift exists for
    key = jax.random.PRNGKey(13)
    oy, ox, flips = sample_crop_flip(key, B, RAW, RAW, CROP, True, True)
    _, p_pad = relayout_geometry(CROP, KERNEL, STRIDE)
    args = dict(
        crop=CROP, stride=STRIDE, p_pad=p_pad, scale=1 / 255,
        mean=np.asarray([0.4, 0.5, 0.6], np.float32),
        std=np.asarray([0.2, 0.25, 0.3], np.float32),
    )
    monkeypatch.setenv("CONVNET_CROP_DOT", "bf16")
    want = np.asarray(
        jitter_crop_phased(jnp.asarray(x), oy, ox, flips, **args), np.float32
    )
    monkeypatch.setenv("CONVNET_CROP_DOT", "s8")
    got = np.asarray(
        jitter_crop_phased(jnp.asarray(x), oy, ox, flips, **args), np.float32
    )
    np.testing.assert_array_equal(got, want)
    # bf16d (transpose-free NHWC bf16 dots) must also be BIT-exact vs
    # bf16: same values through single-term one-hot contractions.
    monkeypatch.setenv("CONVNET_CROP_DOT", "bf16d")
    got_d = np.asarray(
        jitter_crop_phased(jnp.asarray(x), oy, ox, flips, **args), np.float32
    )
    np.testing.assert_array_equal(got_d, want)


def test_relayout_engages_under_mesh(monkeypatch):
    """Round-5 inversion of the round-4 spmd gate: the fused jitter->s2d
    prologue now runs UNDER a mesh (jitter_s2d_sharded: shard_map over
    the data axis, per-shard batch 128) and the sharded train step must
    match the single-device kernel step. With per-shard batch < 128 the
    trainer still falls back to the XLA chain."""
    if len(jax.devices()) < 2:
        pytest.skip("needs >= 2 devices (single-chip TPU run)")
    from convnet_tpu import trainer as trainer_mod
    from convnet_tpu.ops import s2d_relayout as sr
    from convnet_tpu.parallel.mesh import batch_sharding, make_mesh
    from convnet_tpu.trainer import init_state, make_train_step

    monkeypatch.setenv("CONVNET_S2D_RELAYOUT", "1")
    calls = []
    real = sr.jitter_s2d_sharded

    def spy(mesh, *a, **k):
        calls.append(mesh)
        return real(mesh, *a, **k)

    monkeypatch.setattr(sr, "jitter_s2d_sharded", spy)
    g = build_graph(config.parse_model(NET))
    jitter = {
        "input": (
            JitterSpec(image_size=CROP, can_translate=True, can_flip=True, scale=1 / 255),
            np.full((3,), 0.45, np.float32),
            None,
        )
    }
    rng = np.random.RandomState(7)
    b2 = 2 * B  # per-shard batch B=128 on the 2-way data axis
    x = rng.randint(0, 256, (b2, RAW, RAW, 3)).astype(np.uint8)
    y = rng.randint(0, 5, (b2,)).astype(np.int32)

    step1 = make_train_step(g, jitter)
    s1 = init_state(g)
    s1, m1 = step1(s1, {"input": jnp.asarray(x), "labels": jnp.asarray(y)})

    mesh = make_mesh(2, 1, jax.devices()[:2])
    bs = batch_sharding(mesh)
    stepN = make_train_step(g, jitter, mesh=mesh)
    sN = init_state(g)
    sN, mN = stepN(
        sN, {"input": jax.device_put(x, bs), "labels": jax.device_put(y, bs)}
    )

    assert calls, "jitter_s2d_sharded never engaged under the mesh"
    np.testing.assert_allclose(float(m1["loss"]), float(mN["loss"]), rtol=1e-5)
    for e, leaves in jax.device_get(s1["params"]).items():
        for field in leaves:
            np.testing.assert_allclose(
                np.asarray(leaves[field], np.float32),
                np.asarray(jax.device_get(sN["params"][e][field]), np.float32),
                # bf16 graph: sharded grad sums differ by reduction
                # order (per-shard partials + psum vs one device-wide
                # reduce) — a few ulp on near-zero biases
                rtol=1e-4, atol=5e-6, err_msg=f"{e}/{field}",
            )

    # per-shard batch below 128: the fused path must stand down (the
    # relayout's batch chunk rides the lane axis)
    def boom(*a, **k):
        raise AssertionError("fused path must not engage at per-shard B<128")

    monkeypatch.setattr(sr, "jitter_s2d_sharded", boom)
    monkeypatch.setattr(sr, "jitter_s2d", boom)
    small = {
        "input": jnp.asarray(x[:B]),  # 128 total -> 64/shard
        "labels": jnp.asarray(y[:B]),
    }
    make_train_step(g, jitter, mesh=mesh).lower(
        init_state(g),
        {k: jax.device_put(np.asarray(v), bs) for k, v in small.items()},
    )


def test_cmajor_einsum_and_relayout_equal(monkeypatch):
    """cmajor=1 (channel-major einsum output feeding leading-dim-sliced
    relayout operands) must be value-identical to the shipped path."""
    from convnet_tpu.ops.s2d_relayout import jitter_s2d

    rng = np.random.RandomState(5)
    x = jnp.asarray(rng.randint(0, 256, (128, RAW, RAW, 3), np.uint8))
    n = RAW - CROP
    oy = jnp.asarray(rng.randint(0, n + 1, 128), jnp.int32)
    ox = jnp.asarray(rng.randint(0, n + 1, 128), jnp.int32)
    flips = jnp.asarray(rng.randint(0, 2, 128), jnp.int32)
    kw = dict(crop=CROP, kernel=KERNEL, stride=STRIDE, scale=1 / 255,
              mean=np.asarray([0.4, 0.5, 0.6], np.float32),
              std=np.asarray([0.2, 0.25, 0.3], np.float32), interpret=True)
    monkeypatch.setenv("CONVNET_S2D_RELAYOUT", "1")
    monkeypatch.setenv("CONVNET_S2D_CMAJOR", "0")
    want = jitter_s2d(x, oy, ox, flips, **kw)
    monkeypatch.setenv("CONVNET_S2D_CMAJOR", "1")
    got = jitter_s2d(x, oy, ox, flips, **kw)
    np.testing.assert_array_equal(
        np.asarray(got.x, np.float32), np.asarray(want.x, np.float32)
    )
