"""Property-based tests (hypothesis): geometry and kernel invariants
over randomized shapes — the wide-net complement to the fixed golden
tests in test_ops.py."""

import numpy as np
from hypothesis import given, settings, strategies as st

import jax.numpy as jnp

from convnet_tpu.graph import conv_out_size
from convnet_tpu.ops import lrn as lrn_ops
from convnet_tpu.ops import pool
from convnet_tpu.ops.conv import ceil_mode_padding


@given(
    in_size=st.integers(1, 64),
    kernel=st.integers(1, 11),
    stride=st.integers(1, 4),
    padding=st.integers(0, 5),
)
def test_conv_geometry_invariants(in_size, kernel, stride, padding):
    if in_size + 2 * padding < kernel:
        return
    out = conv_out_size(in_size, kernel, stride, padding)
    lo, hi = ceil_mode_padding(in_size, kernel, stride, padding)
    # output positive; padded extent covers exactly the windows
    assert out >= 1
    assert lo == padding and hi >= 0
    span = in_size + lo + hi
    assert (out - 1) * stride + kernel == span or (out - 1) * stride + kernel <= span
    # every window fits in the padded input
    assert (out - 1) * stride + kernel <= span
    # one more window would NOT fit in the unpadded+symmetric-pad input
    assert (out - 1) * stride < in_size + 2 * padding


@settings(deadline=None, max_examples=25)
@given(
    h=st.integers(2, 12),
    k=st.integers(1, 4),
    s=st.integers(1, 3),
    c=st.integers(1, 5),
)
def test_maxpool_bounds_and_monotonicity(h, k, s, c):
    if h < k:
        return
    rng = np.random.RandomState(h * 100 + k * 10 + s)
    x = rng.randn(2, h, h, c).astype(np.float32)
    out = np.asarray(pool.maxpool2d(jnp.asarray(x), k, s))
    # every pooled value is attained somewhere in the input (max over
    # real elements; -inf padding can't win)
    assert out.max() <= x.max() + 1e-6
    assert out.min() >= x.min() - 1e-6
    if k >= s:  # windows tile the whole image -> global max is sampled
        per_image_max = x.max(axis=(1, 2, 3))
        np.testing.assert_allclose(out.max(axis=(1, 2, 3)), per_image_max, rtol=1e-6)


@settings(deadline=None, max_examples=20)
@given(
    c=st.integers(2, 40),
    frac=st.floats(0.05, 1.0),
    blocked=st.booleans(),
    scale=st.floats(0.0001, 0.01),
)
def test_lrn_shrinks_and_preserves_sign(c, frac, blocked, scale):
    rng = np.random.RandomState(c)
    x = rng.randn(3, 2, 2, c).astype(np.float32)
    y = np.asarray(
        lrn_ops.response_norm_cross_map(jnp.asarray(x), scale, 0.75, frac, blocked, "xla")
    )
    # denominator >= 1 -> |y| <= |x|, sign preserved, zero fixed point
    assert (np.abs(y) <= np.abs(x) + 1e-6).all()
    assert (np.sign(y) == np.sign(x))[np.abs(x) > 1e-6].all()


@settings(deadline=None, max_examples=15)
@given(c=st.integers(2, 32), frac=st.floats(0.1, 1.0), blocked=st.booleans())
def test_lrn_xla_matches_reference_oracle(c, frac, blocked):
    rng = np.random.RandomState(c * 7)
    x = jnp.asarray(rng.randn(2, 3, 3, c).astype(np.float32))
    got = lrn_ops.response_norm_cross_map(x, 0.002, 0.75, frac, blocked, "xla")
    want = lrn_ops.response_norm_reference(x, 0.002, 0.75, frac, blocked)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-5, atol=1e-6)
