"""Per-op numerics vs a NumPy golden model + gradient checks.

This is the rebuild's analog of the reference's eigenmat CPU mirror and
grad_check harness (SURVEY.md §4): every kernel is checked against a
straight-line NumPy implementation, and custom VJPs against jax.grad of
the un-customized forward.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from convnet_tpu.ops import conv as conv_ops
from convnet_tpu.ops import local as local_ops
from convnet_tpu.ops import losses, pool, resample
from convnet_tpu.ops import lrn as lrn_ops
from convnet_tpu.ops.conv import ceil_mode_padding


def naive_conv2d(x, w, stride, padding):
    """NumPy golden conv, NHWC/HWIO, ceil-mode padding."""
    b, h, wd, cin = x.shape
    kh, kw, _, cout = w.shape
    (plo_h, phi_h) = ceil_mode_padding(h, kh, stride, padding)
    (plo_w, phi_w) = ceil_mode_padding(wd, kw, stride, padding)
    xp = np.pad(x, ((0, 0), (plo_h, phi_h), (plo_w, phi_w), (0, 0)))
    oh = (xp.shape[1] - kh) // stride + 1
    ow = (xp.shape[2] - kw) // stride + 1
    out = np.zeros((b, oh, ow, cout), np.float32)
    for i in range(oh):
        for j in range(ow):
            patch = xp[:, i * stride : i * stride + kh, j * stride : j * stride + kw, :]
            out[:, i, j, :] = patch.reshape(b, -1) @ w.reshape(-1, cout)
    return out


def naive_maxpool(x, k, stride):
    b, h, wd, c = x.shape
    (plo_h, phi_h) = ceil_mode_padding(h, k, stride, 0)
    (plo_w, phi_w) = ceil_mode_padding(wd, k, stride, 0)
    xp = np.pad(x, ((0, 0), (plo_h, phi_h), (plo_w, phi_w), (0, 0)), constant_values=-np.inf)
    oh = (xp.shape[1] - k) // stride + 1
    ow = (xp.shape[2] - k) // stride + 1
    out = np.zeros((b, oh, ow, c), np.float32)
    for i in range(oh):
        for j in range(ow):
            out[:, i, j, :] = xp[:, i * stride : i * stride + k, j * stride : j * stride + k, :].max(axis=(1, 2))
    return out


def naive_lrn(x, add_scale, pow_scale, frac, blocked=False):
    c = x.shape[-1]
    n = lrn_ops.norm_window_size(c, frac)
    alpha = add_scale / n
    xf = x.reshape(-1, c).astype(np.float64)
    out = np.zeros_like(xf)
    for i in range(c):
        if blocked:
            lo, hi = (i // n) * n, min((i // n) * n + n, c)
        else:
            lo, hi = max(0, i - n // 2), min(c, i + (n - 1) // 2 + 1)
        s = (xf[:, lo:hi] ** 2).sum(axis=1)
        out[:, i] = xf[:, i] * (1.0 + alpha * s) ** (-pow_scale)
    return out.reshape(x.shape).astype(np.float32)


@pytest.mark.parametrize("h,k,s,p", [(8, 3, 1, 1), (9, 3, 2, 0), (28, 5, 1, 2), (11, 4, 3, 1)])
def test_conv2d_matches_numpy(h, k, s, p):
    rng = np.random.RandomState(0)
    x = rng.randn(2, h, h, 3).astype(np.float32)
    w = rng.randn(k, k, 3, 5).astype(np.float32)
    got = np.asarray(conv_ops.conv2d(jnp.asarray(x), jnp.asarray(w), s, p))
    want = naive_conv2d(x, w, s, p)
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize(
    "h,k,s,p,cin",
    [
        (224, 11, 4, 0, 3),  # AlexNet conv1: the shape the fold exists for
        (17, 5, 2, 1, 3),    # odd size, pad, ceil-mode overhang
        (12, 2, 2, 0, 8),    # kernel == stride
        (16, 3, 2, 2, 16),   # folded cin 64
    ],
)
def test_conv2d_space_to_depth_equals_dense(h, k, s, p, cin):
    """The strided->s2d rewrite (conv.py:_space_to_depth_conv) must be a
    pure layout change: same outputs and same gradients as the dense
    strided conv it replaces."""
    rng = np.random.RandomState(7)
    x = jnp.asarray(rng.randn(2, h, h, cin).astype(np.float32))
    w = jnp.asarray(0.1 * rng.randn(k, k, cin, 4).astype(np.float32))
    assert cin * s * s <= conv_ops._S2D_MAX_FOLDED_CIN  # takes the s2d path

    pad_h = ceil_mode_padding(h, k, s, p)
    from convnet_tpu.graph import conv_out_size

    out = conv_out_size(h, k, s, p)

    def dense(x, w):
        return jax.lax.conv_general_dilated(
            x, w, (s, s), (pad_h, pad_h),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )

    got = conv_ops.conv2d(x, w, s, p)
    want = dense(x, w)
    assert got.shape == (2, out, out, 4)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-4, atol=1e-4)

    gx1, gw1 = jax.grad(lambda a, b: jnp.sum(jnp.sin(conv_ops.conv2d(a, b, s, p))), (0, 1))(x, w)
    gx2, gw2 = jax.grad(lambda a, b: jnp.sum(jnp.sin(dense(a, b))), (0, 1))(x, w)
    np.testing.assert_allclose(np.asarray(gx1), np.asarray(gx2), rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(gw1), np.asarray(gw2), rtol=1e-4, atol=1e-4)


def test_s2d_explicit_wgrad_matches_conv_wgrad(monkeypatch):
    """conv.py:_s2d_core's hand-written tap-matmul weight gradient
    (CONVNET_S2D_WGRAD=explicit) must equal XLA's transposed-conv
    weight grad (=conv, the default pending the chip A/B) bit-for-bit
    up to f32 roundoff, including the ceil-mode overhang rows the s2d
    pre-pad introduces."""
    rng = np.random.RandomState(11)
    x = jnp.asarray(rng.randn(3, 29, 29, 3).astype(np.float32))
    w = jnp.asarray(0.1 * rng.randn(11, 11, 3, 6).astype(np.float32))

    def loss(w_):
        y = conv_ops.conv2d(x, w_, 4, 1)
        return jnp.sum(y * jnp.cos(y))

    grads = {}
    for mode in ("explicit", "conv"):
        monkeypatch.setenv("CONVNET_S2D_WGRAD", mode)
        jax.clear_caches()  # mode is read at trace time
        grads[mode] = np.asarray(jax.grad(loss)(w))
    np.testing.assert_allclose(grads["explicit"], grads["conv"], rtol=1e-5, atol=1e-4)


@pytest.mark.parametrize("h,k,s", [(8, 2, 2), (32, 3, 2), (7, 3, 3)])
def test_maxpool_matches_numpy(h, k, s):
    rng = np.random.RandomState(1)
    x = rng.randn(2, h, h, 4).astype(np.float32)
    got = np.asarray(pool.maxpool2d(jnp.asarray(x), k, s))
    want = naive_maxpool(x, k, s)
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_maxpool_grad_routes_to_argmax():
    # MaxPoolUndo parity: gradient lands only on the max element.
    x = jnp.asarray([[1.0, 3.0], [2.0, 0.0]]).reshape(1, 2, 2, 1)
    g = jax.grad(lambda a: jnp.sum(pool.maxpool2d(a, 2, 2)))(x)
    np.testing.assert_array_equal(np.asarray(g).squeeze(), [[0, 1], [0, 0]])


@pytest.mark.parametrize("blocked", [False, True])
@pytest.mark.parametrize("c,frac", [(16, 0.25), (96, 0.0521), (64, 0.5)])
def test_lrn_forward_matches_numpy(c, frac, blocked):
    rng = np.random.RandomState(2)
    x = rng.randn(3, 4, 4, c).astype(np.float32)
    want = naive_lrn(x, 0.001, 0.75, frac, blocked)
    got = np.asarray(
        lrn_ops.response_norm_cross_map(jnp.asarray(x), 0.001, 0.75, frac, blocked, "xla")
    )
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)
    ref = np.asarray(lrn_ops.response_norm_reference(jnp.asarray(x), 0.001, 0.75, frac, blocked))
    np.testing.assert_allclose(ref, want, rtol=1e-5, atol=1e-5)


def test_lrn_pallas_interpret_matches_xla():
    rng = np.random.RandomState(3)
    x = jnp.asarray(rng.randn(2, 5, 5, 48).astype(np.float32))
    args = (0.0005, 0.75, 0.25, False)
    got = lrn_ops.response_norm_cross_map(x, *args, "pallas")
    want = lrn_ops.response_norm_cross_map(x, *args, "xla")
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-5, atol=1e-6)


@pytest.mark.parametrize("backend", ["xla", "pallas"])
def test_lrn_custom_vjp_matches_autodiff(backend):
    rng = np.random.RandomState(4)
    x = jnp.asarray(rng.randn(2, 3, 3, 32).astype(np.float32))
    args = (0.002, 0.75, 0.25, False)

    def f_custom(a):
        return jnp.sum(jnp.sin(lrn_ops.response_norm_cross_map(a, *args, backend)))

    def f_ref(a):
        return jnp.sum(jnp.sin(lrn_ops.response_norm_reference(a, *args)))

    g_custom = jax.grad(f_custom)(x)
    g_ref = jax.grad(f_ref)(x)
    np.testing.assert_allclose(np.asarray(g_custom), np.asarray(g_ref), rtol=1e-4, atol=1e-5)


def test_local_conv_matches_per_site_numpy():
    # Untied weights: compare one output site against its own filter.
    rng = np.random.RandomState(5)
    k, cin, cout, h = 3, 2, 4, 6
    x = rng.randn(2, h, h, cin).astype(np.float32)
    w = rng.randn(h, h, k * k * cin, cout).astype(np.float32)  # stride 1, pad 1 -> out h
    got = np.asarray(local_ops.local_conv2d(jnp.asarray(x), jnp.asarray(w), 1, 1, k))
    assert got.shape == (2, h, h, cout)
    # golden: extract the padded patch at (i,j) and multiply by that site's filter;
    # patch feature order must match lax.conv_general_dilated_patches (row-major
    # spatial, then channel) — verified via round-trip with a tied-weight conv below.
    xp = np.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    i, j = 2, 3
    patch = xp[:, i : i + k, j : j + k, :].reshape(2, -1)
    # try both feature orders; exactly one must match
    patch_cf = np.transpose(xp[:, i : i + k, j : j + k, :], (0, 3, 1, 2)).reshape(2, -1)
    want_a = patch @ w[i, j]
    want_b = patch_cf @ w[i, j]
    ok_a = np.allclose(got[:, i, j, :], want_a, rtol=1e-4, atol=1e-4)
    ok_b = np.allclose(got[:, i, j, :], want_b, rtol=1e-4, atol=1e-4)
    assert ok_a or ok_b, "local conv matches neither HWC nor CHW patch order"


def test_local_conv_with_tied_weights_equals_conv():
    # If every site shares the same filter, local == conv (any patch order
    # difference is absorbed by constructing w from the probe below).
    rng = np.random.RandomState(6)
    k, cin, cout, h = 3, 2, 3, 5
    x = jnp.asarray(rng.randn(1, h, h, cin).astype(np.float32))
    wl = rng.randn(1, 1, k * k * cin, cout).astype(np.float32)
    wl_full = jnp.asarray(np.broadcast_to(wl, (h, h, k * k * cin, cout)).copy())
    got_local = local_ops.local_conv2d(x, wl_full, 1, 1, k)
    # the patch feature order is either row-major spatial-then-channel (HWC)
    # or channel-major (CHW); compare against a tied conv in both orders
    w_hwc = jnp.asarray(wl[0, 0].reshape(k, k, cin, cout))
    got_conv_hwc = conv_ops.conv2d(x, w_hwc, 1, 1)
    w_chw = jnp.asarray(wl[0, 0].reshape(cin, k, k, cout).transpose(1, 2, 0, 3))
    got_conv_chw = conv_ops.conv2d(x, w_chw, 1, 1)
    ok_hwc = np.allclose(np.asarray(got_local), np.asarray(got_conv_hwc), rtol=1e-4, atol=1e-4)
    ok_chw = np.allclose(np.asarray(got_local), np.asarray(got_conv_chw), rtol=1e-4, atol=1e-4)
    assert ok_hwc or ok_chw


def test_softmax_ce_grad_is_probs_minus_onehot():
    # Reference parity: ComputeDeriv for softmax CE is (probs - onehot) [U].
    rng = np.random.RandomState(7)
    logits = jnp.asarray(rng.randn(4, 10).astype(np.float32))
    labels = jnp.asarray([1, 3, 9, 0])
    g = jax.grad(lambda z: losses.softmax_cross_entropy(z, labels))(logits)
    probs = np.asarray(jax.nn.softmax(logits, axis=-1))
    onehot = np.eye(10)[np.asarray(labels)]
    np.testing.assert_allclose(np.asarray(g), probs - onehot, rtol=1e-5, atol=1e-6)


def test_binary_ce_grad_is_sigmoid_minus_target():
    rng = np.random.RandomState(8)
    logits = jnp.asarray(rng.randn(4, 6).astype(np.float32))
    t = jnp.asarray(rng.rand(4, 6).astype(np.float32))
    g = jax.grad(lambda z: losses.binary_cross_entropy(z, t))(logits)
    want = np.asarray(jax.nn.sigmoid(logits)) - np.asarray(t)
    np.testing.assert_allclose(np.asarray(g), want, rtol=1e-4, atol=1e-4)


def test_classification_errors():
    logits = jnp.asarray([[2.0, 1.0], [0.0, 5.0], [1.0, 0.0]])
    labels = jnp.asarray([0, 1, 1])
    assert int(losses.classification_errors(logits, labels)) == 1


def test_upsample_downsample():
    x = jnp.arange(16.0).reshape(1, 2, 2, 4)
    up = resample.upsample(x, 2)
    assert up.shape == (1, 4, 4, 4)
    np.testing.assert_allclose(np.asarray(resample.downsample(up, 2)), np.asarray(x), rtol=1e-6)


def test_rgb_to_yuv_known_values():
    # pure white -> Y=1, U=V=0; pure red -> Y=0.299
    white = jnp.ones((1, 1, 1, 3))
    red = jnp.zeros((1, 1, 1, 3)).at[..., 0].set(1.0)
    yuv_w = np.asarray(resample.rgb_to_yuv(white)).squeeze()
    yuv_r = np.asarray(resample.rgb_to_yuv(red)).squeeze()
    np.testing.assert_allclose(yuv_w, [1.0, 0.0, 0.0], atol=1e-4)
    np.testing.assert_allclose(yuv_r[0], 0.299, atol=1e-4)


def test_lrn_bf16_input():
    """LRN promotes to f32 internally and returns the input dtype."""
    rng = np.random.RandomState(9)
    x32 = rng.randn(2, 3, 3, 16).astype(np.float32)
    x16 = jnp.asarray(x32, jnp.bfloat16)
    y16 = lrn_ops.response_norm_cross_map(x16, 0.001, 0.75, 0.25, False, "xla")
    assert y16.dtype == jnp.bfloat16
    y32 = lrn_ops.response_norm_cross_map(jnp.asarray(x32), 0.001, 0.75, 0.25, False, "xla")
    np.testing.assert_allclose(
        np.asarray(y16, np.float32), np.asarray(y32), atol=0.02
    )


def test_conv_small_cin_im2col_matches_conv():
    """Cin < _MIN_CIN convs run as im2col + matmul (degenerate-Cin
    weight-grad convs hang libtpu's compiler); fwd + both grads must
    match the conv-primitive formulation to float reassociation."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax import lax

    from convnet_tpu.ops.conv import ceil_mode_padding, conv2d

    rng = np.random.RandomState(0)
    for cin in (1, 3):
        x = jnp.asarray(rng.randn(2, 9, 9, cin).astype(np.float32))
        w = jnp.asarray(rng.randn(3, 3, cin, 8).astype(np.float32))

        def ours(x_, w_):
            return conv2d(x_, w_, stride=1, padding=1)

        def ref(x_, w_):
            ph = ceil_mode_padding(9, 3, 1, 1)
            return lax.conv_general_dilated(
                x_, w_, (1, 1), (ph, ph),
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                preferred_element_type=jnp.float32,
                precision=lax.Precision.HIGHEST,
            )

        np.testing.assert_allclose(
            np.asarray(ours(x, w)), np.asarray(ref(x, w)), rtol=1e-5, atol=1e-5
        )
        g_ours = jax.grad(lambda a, b: (ours(a, b) ** 2).sum(), argnums=(0, 1))(x, w)
        g_ref = jax.grad(lambda a, b: (ref(a, b) ** 2).sum(), argnums=(0, 1))(x, w)
        for go, gr in zip(g_ours, g_ref):
            np.testing.assert_allclose(np.asarray(go), np.asarray(gr), rtol=1e-5, atol=1e-4)


@pytest.mark.parametrize("backend", ["xla", "pallas"])
@pytest.mark.parametrize("c", [96, 128])
def test_lrn_fuse_relu_matches_composed(backend, c):
    """lrn(x, fuse_relu=True) must equal lrn(relu(x)) in value and VJP —
    c=96 exercises the transposed kernel form, c=128 the folded-2D form
    (interpret mode on CPU; `make test-tpu` compiles them)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from convnet_tpu.ops.lrn import response_norm_cross_map

    rng = np.random.RandomState(0)
    z = jnp.asarray(rng.randn(2, 3, 3, c).astype(np.float32))
    g = jnp.asarray(rng.randn(2, 3, 3, c).astype(np.float32))
    args = (0.001, 0.75, 5.0 / c, False, backend)

    fused, vjp_f = jax.vjp(
        lambda a: response_norm_cross_map(a, *args, fuse_relu=True), z
    )
    composed, vjp_c = jax.vjp(
        lambda a: response_norm_cross_map(jnp.maximum(a, 0.0), *args), z
    )
    np.testing.assert_allclose(
        np.asarray(fused), np.asarray(composed), rtol=1e-6, atol=1e-6
    )
    (dz_f,) = vjp_f(g)
    (dz_c,) = vjp_c(g)
    np.testing.assert_allclose(
        np.asarray(dz_f), np.asarray(dz_c), rtol=1e-5, atol=1e-5
    )


def test_model_relu_lrn_fusion_matches_eager_compose():
    """A conv->relu->rnorm graph must produce the same activations and
    gradients whether or not the ReLU fuses into the LRN kernel (the
    fusion triggers automatically in apply_fn when the source layer is
    RECTIFIED_LINEAR)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from convnet_tpu import config, model as model_lib
    from convnet_tpu.graph import build_graph
    from convnet_tpu.ops.lrn import response_norm_reference

    g = build_graph(config.parse_model(
        """
        name: "f"
        layer { name: "input" is_input: true num_channels: 3 image_size: 6 }
        layer { name: "c1" num_channels: 16 activation: RECTIFIED_LINEAR }
        layer { name: "r1" num_channels: 16 }
        layer { name: "output" is_output: true num_channels: 4 activation: SOFTMAX data_field: "labels" }
        edge { source: "input" dest: "c1" edge_type: CONV kernel_size: 3 stride: 1 padding: 1
               initialization: DENSE_GAUSSIAN init_wt: 0.3 }
        edge { source: "c1" dest: "r1" edge_type: RESPONSE_NORM add_scale: 0.002 pow_scale: 0.75
               frac_of_filters_response_norm: 0.3 }
        edge { source: "r1" dest: "output" edge_type: FC initialization: DENSE_GAUSSIAN_SQRT_FAN_IN init_wt: 1.0 }
        """
    ))
    params = model_lib.init_params(g, seed=0)
    rng = np.random.RandomState(1)
    batch = {
        "input": jnp.asarray(rng.randn(4, 6, 6, 3).astype(np.float32)),
        "labels": jnp.asarray(rng.randint(0, 4, 4)),
    }
    out = model_lib.apply_fn(g, params, batch, return_layers=["c1", "r1"])
    relu = np.asarray(out["c1"])
    want = response_norm_reference(jnp.asarray(relu), 0.002, 0.75, 0.3)
    np.testing.assert_allclose(
        np.asarray(out["r1"]), np.asarray(want), rtol=1e-4, atol=1e-5
    )
    # gradient flows through the fused kernel without NaNs and matches
    # finite differences at one coordinate
    def loss(p):
        return model_lib.loss_fn(g, p, batch, train=False)[0]

    grads = jax.grad(loss)(params)
    gw = np.asarray(grads["input:c1"]["w"])
    assert np.isfinite(gw).all()
    host = jax.tree.map(lambda a: np.array(a), params)
    eps = 1e-3
    w = host["input:c1"]["w"]
    orig = w[0, 0, 0, 0]
    w[0, 0, 0, 0] = orig + eps
    lp = float(loss(jax.tree.map(jnp.asarray, host)))
    w[0, 0, 0, 0] = orig - eps
    lm = float(loss(jax.tree.map(jnp.asarray, host)))
    w[0, 0, 0, 0] = orig
    num = (lp - lm) / (2 * eps)
    assert abs(num - gw[0, 0, 0, 0]) < 2e-3 * max(1.0, abs(num)), (num, gw[0, 0, 0, 0])


def test_lrn_transposed_form_lane_aligned_batch():
    """B=128 forces the transposed (H,W,C,B) kernel form (B fills the
    lane axis — smaller batches route to the 2D form after a compiled-
    Mosaic miscompile at partial lanes). On TPU this compiles the exact
    kernel the headline bench runs; on CPU it runs interpret mode."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from convnet_tpu.ops.lrn import (
        response_norm_cross_map,
        response_norm_reference,
    )

    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(128, 2, 2, 96).astype(np.float32))
    g = jnp.asarray(rng.randn(128, 2, 2, 96).astype(np.float32))
    args = (0.001, 0.75, 5.0 / 96, False, "pallas")

    y, vjp = jax.vjp(lambda a: response_norm_cross_map(a, *args), x)
    want = response_norm_reference(x, 0.001, 0.75, 5.0 / 96)
    np.testing.assert_allclose(np.asarray(y), np.asarray(want), rtol=1e-5, atol=1e-6)
    want_dx = jax.grad(
        lambda a: (response_norm_reference(a, 0.001, 0.75, 5.0 / 96) * g).sum()
    )(x)
    (dx,) = vjp(g)
    np.testing.assert_allclose(
        np.asarray(dx), np.asarray(want_dx), rtol=1e-4, atol=1e-5
    )

    # fused-relu variant against composed
    yf, vjp_f = jax.vjp(
        lambda a: response_norm_cross_map(a, *args, fuse_relu=True), x
    )
    yc, vjp_c = jax.vjp(
        lambda a: response_norm_cross_map(jnp.maximum(a, 0.0), *args), x
    )
    np.testing.assert_allclose(np.asarray(yf), np.asarray(yc), rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(vjp_f(g)[0]), np.asarray(vjp_c(g)[0]), rtol=1e-4, atol=1e-5
    )


def test_maxpool_undo_reference_semantics():
    """The comparison-form MaxPoolUndo oracle: equals autodiff of
    reduce_window on tie-free inputs; credits EVERY tied max (the
    cuda-convnet convention) where select-and-scatter picks one."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from convnet_tpu.ops.pool import maxpool2d, maxpool2d_undo_reference

    # tie-free random input: both conventions agree
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(2, 7, 7, 3).astype(np.float32))
    g = jnp.asarray(rng.randn(2, 3, 3, 3).astype(np.float32))
    y, vjp = jax.vjp(lambda a: maxpool2d(a, kernel=3, stride=2), x)
    (dx_ss,) = vjp(g)
    dx_ref = maxpool2d_undo_reference(x, y, g, kernel=3, stride=2)
    np.testing.assert_allclose(np.asarray(dx_ref), np.asarray(dx_ss), rtol=1e-6)

    # all-equal window (post-ReLU zeros scenario): reference credits all
    # window members; select-and-scatter credits exactly one
    xz = jnp.zeros((1, 2, 2, 1), jnp.float32)
    gz = jnp.ones((1, 1, 1, 1), jnp.float32)
    yz, vjpz = jax.vjp(lambda a: maxpool2d(a, kernel=2, stride=2), xz)
    (dz_ss,) = vjpz(gz)
    dz_ref = maxpool2d_undo_reference(xz, yz, gz, kernel=2, stride=2)
    assert float(jnp.sum(dz_ss)) == 1.0       # single winner
    np.testing.assert_array_equal(np.asarray(dz_ref), np.ones((1, 2, 2, 1)))


@pytest.mark.parametrize("form", ["2d", "t", "r2d"])
def test_lrn_all_kernel_forms_match_reference(form, monkeypatch):
    """Every Pallas kernel form (folded-2D lane kernel, transposed
    sublane-shift kernel, rows-2D block-banded-matmul kernel) computes
    the same values and VJP. B=128 / C=96 keeps all three eligible
    (lane-aligned batch). On TPU (make test-tpu) this compiles each
    form; on CPU it runs interpret mode."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from convnet_tpu.ops.lrn import (
        response_norm_cross_map,
        response_norm_reference,
    )

    monkeypatch.setenv("CONVNET_LRN_FORM", form)
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(128, 3, 3, 96).astype(np.float32))
    g = jnp.asarray(rng.randn(128, 3, 3, 96).astype(np.float32))
    args = (0.001, 0.75, 5.0 / 96, False, "pallas")

    y, vjp = jax.vjp(lambda a: response_norm_cross_map(a, *args), x)
    want = response_norm_reference(x, 0.001, 0.75, 5.0 / 96)
    np.testing.assert_allclose(np.asarray(y), np.asarray(want), rtol=1e-5, atol=1e-6)
    want_dx = jax.grad(
        lambda a: (response_norm_reference(a, 0.001, 0.75, 5.0 / 96) * g).sum()
    )(x)
    (dx,) = vjp(g)
    # atol 3e-5: on the real chip the kernel's MXU banded-matmul window
    # sums accumulate f32 in a different order than jax.grad of the
    # reference chain — observed max |diff| 1.6e-5 on 1/110592 elements
    # (r2d form, 2026-08-19); CPU interpret mode sits well inside 1e-5
    np.testing.assert_allclose(np.asarray(dx), np.asarray(want_dx), rtol=1e-4, atol=3e-5)

    # fused-relu variant against composed
    yf, vjp_f = jax.vjp(lambda a: response_norm_cross_map(a, *args, fuse_relu=True), x)
    yc, vjp_c = jax.vjp(
        lambda a: response_norm_cross_map(jnp.maximum(a, 0.0), *args), x
    )
    np.testing.assert_allclose(np.asarray(yf), np.asarray(yc), rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(vjp_f(g)[0]), np.asarray(vjp_c(g)[0]), rtol=1e-4, atol=3e-5
    )


def test_lrn_r2d_bf16_matches_reference():
    """The r2d form at the headline dtype (bf16 in/out, f32 math)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from convnet_tpu.ops.lrn import (
        response_norm_cross_map,
        response_norm_reference,
    )

    rng = np.random.RandomState(2)
    x32 = rng.randn(128, 5, 5, 96).astype(np.float32)
    x = jnp.asarray(x32).astype(jnp.bfloat16)
    args = (0.001, 0.75, 5.0 / 96, False, "pallas")
    y = response_norm_cross_map(x, *args)  # auto form -> r2d at C=96/B=128
    want = response_norm_reference(jnp.asarray(x.astype(jnp.float32)), 0.001, 0.75, 5.0 / 96)
    np.testing.assert_allclose(
        np.asarray(y, np.float32), np.asarray(want), rtol=2e-2, atol=2e-2
    )


def test_lrn_2d_ragged_tile_matches_reference():
    """Odd M (B*H*W = 27) forces _pick_tile's ragged fallback — the
    partially-occupied last block is exactly the regime where compiled
    Mosaic once miscompiled while interpret mode passed (the t-form
    B%128 bug), so this shape runs compiled under `make test-tpu`."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from convnet_tpu.ops.lrn import (
        response_norm_cross_map,
        response_norm_reference,
    )

    rng = np.random.RandomState(3)
    x = jnp.asarray(rng.randn(3, 3, 3, 128).astype(np.float32))
    g = jnp.asarray(rng.randn(3, 3, 3, 128).astype(np.float32))
    args = (0.001, 0.75, 9.0 / 128, False, "pallas")  # C%128==0 -> 2d form
    y, vjp = jax.vjp(lambda a: response_norm_cross_map(a, *args), x)
    want = response_norm_reference(x, 0.001, 0.75, 9.0 / 128)
    np.testing.assert_allclose(np.asarray(y), np.asarray(want), rtol=1e-5, atol=1e-6)
    want_dx = jax.grad(
        lambda a: (response_norm_reference(a, 0.001, 0.75, 9.0 / 128) * g).sum()
    )(x)
    (dx,) = vjp(g)
    np.testing.assert_allclose(np.asarray(dx), np.asarray(want_dx), rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize(
    "cin_g,stride",
    [
        (16, 1),  # direct feature_group_count lowering (one MXU conv)
        (4, 1),   # per-group dispatch (im2col route: cin_g < _MIN_CIN)
        (16, 2),  # per-group dispatch (strided: s2d fold per tower)
    ],
)
def test_grouped_conv_matches_per_group_loop(cin_g, stride):
    """Grouped convolution (Edge.num_groups — the cuda-convnet kernels'
    numGroups [U], the two-tower AlexNet topology): every lowering route
    must equal the per-group loop exactly, forward and gradients."""
    g = 2
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(2, 9, 9, g * cin_g).astype(np.float32))
    w = jnp.asarray(rng.randn(3, 3, cin_g, 2 * 12).astype(np.float32))

    def looped(x_, w_):
        outs = [
            conv_ops.conv2d(
                x_[..., gi * cin_g : (gi + 1) * cin_g],
                w_[..., gi * 12 : (gi + 1) * 12],
                stride,
                1,
            )
            for gi in range(g)
        ]
        return jnp.concatenate(outs, axis=-1)

    y = conv_ops.conv2d(x, w, stride, 1, groups=g)
    # allclose, not bit-equal: on TPU the single feature_group_count conv
    # tiles its contraction differently from two separate convs, so f32
    # sums differ in accumulation order (~4e-5 rel measured on v5e) —
    # both are valid orderings of the same exact dot products
    np.testing.assert_allclose(
        np.asarray(y), np.asarray(looped(x, w)), rtol=1e-4, atol=1e-4
    )

    loss = lambda fn: lambda w_: jnp.sum(jnp.sin(fn(x, w_)))
    dw = jax.grad(loss(lambda x_, w_: conv_ops.conv2d(x_, w_, stride, 1, groups=g)))(w)
    dw_ref = jax.grad(loss(looped))(w)
    # grads inherit the forward's accumulation-order noise through sin(y)
    # (measured 3.4e-5 abs on v5e); 1e-4 still fails loudly on any real
    # wiring bug (a wrong gradient is O(1) off)
    np.testing.assert_allclose(np.asarray(dw), np.asarray(dw_ref), rtol=1e-4, atol=1e-4)
    dx = jax.grad(
        lambda x_: jnp.sum(jnp.sin(conv_ops.conv2d(x_, w, stride, 1, groups=g)))
    )(x)
    dx_ref = jax.grad(lambda x_: jnp.sum(jnp.sin(looped(x_, w))))(x)
    np.testing.assert_allclose(np.asarray(dx), np.asarray(dx_ref), rtol=1e-4, atol=1e-4)


def test_grouped_conv_validates_channel_mismatch():
    x = jnp.zeros((1, 5, 5, 10), jnp.float32)
    w = jnp.zeros((3, 3, 4, 8), jnp.float32)  # expects 4*2=8 input channels
    with pytest.raises(ValueError, match="grouped conv"):
        conv_ops.conv2d(x, w, 1, 1, groups=2)
