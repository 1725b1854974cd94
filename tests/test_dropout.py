"""Dropout op: statistics, determinism, and the mask-recompute VJP.

Reference counterpart: dropout mask RNG in Matrix/Layer (src/matrix.cc,
src/layer.cc [U]). On CPU these tests exercise the threefry recompute
path; `make test-tpu` runs the same module against the hardware-PRNG
Pallas kernel.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from convnet_tpu.ops.dropout import dropout


KEY = jax.random.PRNGKey(7)


def test_dropout_statistics_and_scaling():
    x = jnp.ones((64, 512), jnp.float32)
    rate = 0.4
    y = np.asarray(dropout(x, rate, KEY))
    kept = y != 0.0
    # surviving values carry the 1/keep scale
    np.testing.assert_allclose(y[kept], 1.0 / (1.0 - rate), rtol=1e-6)
    # keep fraction within 4 sigma of binomial expectation
    n = y.size
    frac = kept.mean()
    sigma = np.sqrt(rate * (1 - rate) / n)
    assert abs(frac - (1.0 - rate)) < 4 * sigma, frac


def test_dropout_deterministic_per_key():
    x = jnp.asarray(np.random.RandomState(0).randn(33, 257), jnp.float32)
    a = np.asarray(dropout(x, 0.5, KEY))
    b = np.asarray(dropout(x, 0.5, KEY))
    np.testing.assert_array_equal(a, b)
    c = np.asarray(dropout(x, 0.5, jax.random.PRNGKey(8)))
    assert (a != c).any()


def test_dropout_rate_zero_identity_and_grad():
    x = jnp.asarray(np.random.RandomState(1).randn(8, 16), jnp.float32)
    np.testing.assert_array_equal(np.asarray(dropout(x, 0.0, KEY)), np.asarray(x))
    g = jax.grad(lambda a: dropout(a, 0.0, KEY).sum())(x)
    np.testing.assert_array_equal(np.asarray(g), np.ones_like(g))


def test_dropout_vjp_recomputes_the_same_mask():
    """dx must be nonzero exactly where y is nonzero, scaled by 1/keep —
    i.e. the backward pass regenerated the identical mask."""
    rate = 0.5
    x = jnp.asarray(np.random.RandomState(2).randn(32, 128), jnp.float32)
    y, vjp = jax.vjp(lambda a: dropout(a, rate, KEY), x)
    (dx,) = vjp(jnp.ones_like(y))
    mask_fwd = np.asarray(y) != 0.0
    np.testing.assert_array_equal(np.asarray(dx) != 0.0, mask_fwd)
    np.testing.assert_allclose(
        np.asarray(dx)[mask_fwd], 1.0 / (1.0 - rate), rtol=1e-6
    )


def test_dropout_zero_residual():
    """The VJP residual is the key alone — no mask/tensor is stored."""
    x = jnp.ones((16, 64), jnp.float32)
    _, vjp = jax.vjp(lambda a: dropout(a, 0.5, KEY), x)
    leaves = jax.tree.leaves(vjp)
    assert all(l.size <= 4 for l in leaves if hasattr(l, "size")), [
        (l.shape, l.dtype) for l in leaves if hasattr(l, "size")
    ]


@pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
def test_dropout_matches_bernoulli_reference_semantics(dtype):
    """Against the plain threefry formulation at equal keys (CPU path is
    literally it; on TPU the masks differ but the law is the same, so
    compare moments instead of values)."""
    rate = 0.3
    rng = np.random.RandomState(3)
    x = jnp.asarray(rng.rand(128, 256) + 0.5, dtype)
    y = dropout(x, rate, KEY)
    if jax.default_backend() in ("cpu", "gpu"):
        keep = jax.random.bernoulli(KEY, 1.0 - rate, x.shape)
        want = jnp.where(keep, x / dtype(1.0 - rate), 0)
        np.testing.assert_array_equal(np.asarray(y), np.asarray(want))
    else:
        ratio = float(jnp.mean(y.astype(jnp.float32)) / jnp.mean(x.astype(jnp.float32)))
        assert abs(ratio - 1.0) < 0.05, ratio  # E[y] == E[x] (inverted dropout)