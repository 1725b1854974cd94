"""Pallas jitter gather (ops/jitter_gather.py): bit-exactness vs the
einsum path it replaces, across the crop/flip/affine matrix.

The gather itself must be ARRAY-EQUAL to jitter_crop_phased (identity
and scale-only affines are bit-exact — both paths move exact uint8
values); with a mean subtraction the kernel's mul+sub compiles to an
FMA the einsum graph doesn't use, so those cases allow <= 1 bf16 ulp
at cancellation points (x*scale ~= mean). Anything larger is a real
indexing/phase bug."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from convnet_tpu.ops.jitter_gather import (
    gather_crop_phased,
    gather_supported,
)
from convnet_tpu.ops.s2d_relayout import jitter_crop_phased, relayout_geometry

# AlexNet-shaped but smaller: raw 40, crop 32, stride 4 -> P=8, Pp=16
RAW, CROP, S, K = 40, 32, 4, 5


def _geom():
    return relayout_geometry(CROP, K, S)


def _inputs(b=8, seed=0, flip=True):
    rng = np.random.RandomState(seed)
    x = rng.randint(0, 256, (b, RAW, RAW, 3), dtype=np.uint8)
    n = RAW - CROP  # offsets in [0, n] inclusive
    oy = jnp.asarray(rng.randint(0, n + 1, b), jnp.int32)
    ox = jnp.asarray(rng.randint(0, n + 1, b), jnp.int32)
    flips = jnp.asarray(rng.randint(0, 2, b), jnp.int32) if flip else None
    return jnp.asarray(x), oy, ox, flips


def _assert_close_1ulp(got, want):
    """Elementwise |diff| <= max(1 bf16 ulp of want, 2e-7 f32-fma slack)."""
    g = np.asarray(got, np.float32)
    w = np.asarray(want, np.float32)
    ulp = 2.0 ** (np.floor(np.log2(np.maximum(np.abs(w), 1e-30))) - 7)
    tol = np.maximum(ulp, 2e-7)
    bad = np.abs(g - w) > tol
    assert not bad.any(), (
        f"{bad.sum()} elements beyond 1 bf16 ulp; worst "
        f"{np.abs(g - w)[bad].max()} at {np.argwhere(bad)[:3]}"
    )


@pytest.mark.parametrize("flip", [False, True])
@pytest.mark.parametrize(
    "affine",
    [
        dict(scale=1.0, mean=None, std=None),
        dict(scale=1 / 255, mean=None, std=None),
        dict(scale=1 / 255, mean=np.asarray([0.4, 0.5, 0.6], np.float32),
             std=None),
        dict(scale=1 / 255, mean=np.asarray([0.4, 0.5, 0.6], np.float32),
             std=np.asarray([0.2, 0.25, 0.3], np.float32)),
        # scalar mean/std must broadcast like the einsum path does
        dict(scale=1 / 255, mean=np.float32(0.45), std=np.float32(0.25)),
    ],
)
def test_matches_einsum(flip, affine):
    p_grid, p_pad = _geom()
    x, oy, ox, flips = _inputs(flip=flip)
    assert gather_supported(
        RAW, RAW, 3, CROP, S, p_pad, affine["mean"], affine["std"]
    )
    want = jitter_crop_phased(
        x, oy, ox, flips, crop=CROP, stride=S, p_pad=p_pad, **affine
    )
    got = gather_crop_phased(
        x, oy, ox, flips, crop=CROP, stride=S, p_pad=p_pad, interpret=True,
        **affine,
    )
    assert got.shape == want.shape and got.dtype == want.dtype
    if affine["mean"] is None:
        # pure gather (+ scalar scale): bit-exact
        np.testing.assert_array_equal(
            np.asarray(got, np.float32), np.asarray(want, np.float32)
        )
    else:
        _assert_close_1ulp(got, want)
        # the ceil-mode PAD positions must be exactly 0 (data values may
        # legitimately differ between 0.0 and ~1e-8 under the fma)
        p = CROP // S
        i = np.arange(S * p_pad)
        pad = (i % p_pad) >= p
        g = np.asarray(got, np.float32)
        assert (g[:, :, pad, :] == 0).all() and (g[:, :, :, pad] == 0).all()


def test_extreme_offsets_and_all_flips():
    """Corners: oy/ox at 0 and max simultaneously, every image flipped."""
    p_grid, p_pad = _geom()
    rng = np.random.RandomState(3)
    b = 8
    x = jnp.asarray(rng.randint(0, 256, (b, RAW, RAW, 3), dtype=np.uint8))
    n = RAW - CROP
    oy = jnp.asarray([0, n, 0, n, 3, 5, 1, 7], jnp.int32)
    ox = jnp.asarray([0, 0, n, n, 7, 1, 5, 3], jnp.int32)
    flips = jnp.ones((b,), jnp.int32)
    kw = dict(crop=CROP, stride=S, p_pad=p_pad, scale=1 / 255,
              mean=np.asarray([0.45, 0.45, 0.45], np.float32))
    want = jitter_crop_phased(x, oy, ox, flips, **kw)
    got = gather_crop_phased(x, oy, ox, flips, interpret=True, **kw)
    _assert_close_1ulp(got, want)


def test_jitter_s2d_equal_with_gather_enabled(monkeypatch):
    """End-to-end: jitter_s2d with the gather stage enabled produces
    the identical S2DInput as the einsum stage."""
    from convnet_tpu.ops.s2d_relayout import jitter_s2d

    # B=128: the downstream relayout's batch chunk rides the lane axis
    x, oy, ox, flips = _inputs(b=128, seed=11)
    kw = dict(crop=CROP, kernel=K, stride=S, scale=1 / 255,
              mean=np.asarray([0.45, 0.45, 0.45], np.float32),
              std=None, interpret=True)
    monkeypatch.setenv("CONVNET_JITTER_GATHER", "0")
    monkeypatch.setenv("CONVNET_S2D_RELAYOUT", "1")
    want = jitter_s2d(x, oy, ox, flips, **kw)
    monkeypatch.setenv("CONVNET_JITTER_GATHER", "1")
    got = jitter_s2d(x, oy, ox, flips, **kw)
    assert got.stride == want.stride
    _assert_close_1ulp(got.x, want.x)


def test_unsupported_geometry_falls_back():
    # crop not divisible by stride -> P % 8 fails the gate
    assert not gather_supported(40, 40, 3, 30, 4, 16, None, None)
    # switch wider than 64 offsets
    assert not gather_supported(300, 300, 3, 224, 4, 64, None, None)
