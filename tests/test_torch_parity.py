"""Cross-framework numerics parity vs torch (CPU).

BASELINE.json's north star is "activations matching the CUDA reference
within float tolerance". The actual reference mount is empty this round
(SURVEY.md provenance note), so torch — an independent implementation
with the same operator semantics lineage — serves as the strongest
available oracle: conv / maxpool / LRN forward AND backward are checked
against it at 1e-4.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")
import torch.nn.functional as F  # noqa: E402

from convnet_tpu.ops import conv as conv_ops  # noqa: E402
from convnet_tpu.ops import lrn as lrn_ops  # noqa: E402
from convnet_tpu.ops import pool  # noqa: E402
from convnet_tpu.ops.conv import ceil_mode_padding  # noqa: E402


def torch_conv(x_nhwc, w_hwio, stride, padding):
    """torch conv with our ceil-mode asymmetric padding; returns NHWC."""
    xt = torch.from_numpy(np.transpose(x_nhwc, (0, 3, 1, 2))).double()
    wt = torch.from_numpy(np.transpose(w_hwio, (3, 2, 0, 1))).double()
    (plo_h, phi_h) = ceil_mode_padding(x_nhwc.shape[1], w_hwio.shape[0], stride, padding)
    (plo_w, phi_w) = ceil_mode_padding(x_nhwc.shape[2], w_hwio.shape[1], stride, padding)
    xt = F.pad(xt, (plo_w, phi_w, plo_h, phi_h))
    out = F.conv2d(xt, wt, stride=stride)
    return np.transpose(out.numpy(), (0, 2, 3, 1))


@pytest.mark.parametrize(
    "h,k,s,p,cin,cout",
    [(8, 3, 1, 1, 3, 5), (28, 5, 1, 2, 1, 4), (16, 11, 4, 0, 3, 6), (9, 3, 2, 0, 2, 2)],
)
def test_conv_forward_matches_torch(h, k, s, p, cin, cout):
    rng = np.random.RandomState(0)
    x = rng.randn(2, h, h, cin).astype(np.float32)
    w = rng.randn(k, k, cin, cout).astype(np.float32)
    ours = np.asarray(conv_ops.conv2d(jnp.asarray(x), jnp.asarray(w), s, p))
    theirs = torch_conv(x, w, s, p)
    np.testing.assert_allclose(ours, theirs, rtol=1e-4, atol=1e-4)


def test_conv_gradients_match_torch():
    rng = np.random.RandomState(1)
    x = rng.randn(2, 10, 10, 3).astype(np.float32)
    w = rng.randn(3, 3, 3, 4).astype(np.float32)

    gx_ours, gw_ours = jax.grad(
        lambda a, b: jnp.sum(conv_ops.conv2d(a, b, 2, 1) ** 2), argnums=(0, 1)
    )(jnp.asarray(x), jnp.asarray(w))

    xt = torch.from_numpy(np.transpose(x, (0, 3, 1, 2))).double().requires_grad_()
    wt = torch.from_numpy(np.transpose(w, (3, 2, 0, 1))).double().requires_grad_()
    (plo_h, phi_h) = ceil_mode_padding(10, 3, 2, 1)
    out = F.conv2d(F.pad(xt, (plo_h, phi_h, plo_h, phi_h)), wt, stride=2)
    (out.pow(2).sum()).backward()
    gx_t = np.transpose(xt.grad.numpy(), (0, 2, 3, 1))
    gw_t = np.transpose(wt.grad.numpy(), (2, 3, 1, 0))

    np.testing.assert_allclose(np.asarray(gx_ours), gx_t, rtol=1e-3, atol=1e-4)
    np.testing.assert_allclose(np.asarray(gw_ours), gw_t, rtol=1e-3, atol=1e-3)


@pytest.mark.parametrize("h,k,s", [(8, 2, 2), (32, 3, 2), (27, 3, 2)])
def test_maxpool_matches_torch(h, k, s):
    rng = np.random.RandomState(2)
    x = rng.randn(2, h, h, 4).astype(np.float32)
    ours = np.asarray(pool.maxpool2d(jnp.asarray(x), k, s))
    xt = torch.from_numpy(np.transpose(x, (0, 3, 1, 2)))
    (plo, phi) = ceil_mode_padding(h, k, s, 0)
    xt = F.pad(xt, (plo, phi, plo, phi), value=float("-inf"))
    theirs = F.max_pool2d(xt, k, stride=s)
    theirs = np.transpose(theirs.numpy(), (0, 2, 3, 1))
    assert ours.shape == theirs.shape
    np.testing.assert_allclose(ours, theirs, rtol=1e-6)


@pytest.mark.parametrize("c,n", [(16, 4), (96, 5), (64, 9), (8, 3)])
def test_lrn_matches_torch(c, n):
    """torch local_response_norm: y = x/(1 + (alpha/n) sum_window x^2)^beta
    — identical formula and centered-window convention."""
    rng = np.random.RandomState(3)
    x = rng.randn(2, 7, 7, c).astype(np.float32)
    alpha_total = 0.0005  # torch's alpha = our add_scale (both divide by n)
    frac = n / c
    assert lrn_ops.norm_window_size(c, frac) == n
    ours = np.asarray(
        lrn_ops.response_norm_cross_map(jnp.asarray(x), alpha_total, 0.75, frac, False, "xla")
    )
    xt = torch.from_numpy(np.transpose(x, (0, 3, 1, 2))).double()
    theirs = F.local_response_norm(xt, size=n, alpha=alpha_total, beta=0.75, k=1.0)
    theirs = np.transpose(theirs.numpy(), (0, 2, 3, 1))
    np.testing.assert_allclose(ours, theirs, rtol=1e-4, atol=1e-5)


def test_lrn_gradient_matches_torch():
    rng = np.random.RandomState(4)
    c, n = 32, 5
    x = rng.randn(2, 4, 4, c).astype(np.float32)
    g_ours = jax.grad(
        lambda a: jnp.sum(
            jnp.sin(lrn_ops.response_norm_cross_map(a, 0.001, 0.75, n / c, False, "xla"))
        )
    )(jnp.asarray(x))
    xt = torch.from_numpy(np.transpose(x, (0, 3, 1, 2))).double().requires_grad_()
    y = F.local_response_norm(xt, size=n, alpha=0.001, beta=0.75, k=1.0)
    torch.sin(y).sum().backward()
    g_t = np.transpose(xt.grad.numpy(), (0, 2, 3, 1))
    np.testing.assert_allclose(np.asarray(g_ours), g_t, rtol=1e-3, atol=1e-5)
