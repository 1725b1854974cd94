"""Chip-free Mosaic lowering legality checks.

Interpret mode (what the CPU suite runs) validates kernel NUMERICS but
enforces none of Mosaic's lowering rules — block-shape divisibility,
VMEM budgets, unsupported-op checks. Two real lowering failures reached
the on-chip A/B queue that way (rounds 3 and 4: the s2d relayout block
plan and the bias-gradient (1, C) partial blocks).

JAX can lower for a platform it is not running on:
`jit(f).trace(...).lower(lowering_platforms=("tpu",))` executes the full
Python-side Mosaic lowering (including `_check_block_mappings`) on the
CPU backend. CONVNET_PALLAS_COMPILED=1 (ops/pallas_util.py) forces the
ops off their CPU interpret path so these tests exercise the real block
plans at hardware geometries. The backend (C++) compiler can still
reject a kernel — `make test-tpu` remains the final gate — but every
block-plan bug class seen so far is caught here, pre-chip.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from convnet_tpu.ops import fused_pool_lrn, lrn
from convnet_tpu.ops.s2d_relayout import jitter_s2d


@pytest.fixture(autouse=True)
def _compiled_pallas(monkeypatch):
    monkeypatch.setenv("CONVNET_PALLAS_COMPILED", "1")


def _lower_tpu(f, *args):
    return jax.jit(f).trace(*args).lower(lowering_platforms=("tpu",))


# AlexNet hardware geometries at a lane-aligned test batch. B=128 keeps
# the trace light; every Mosaic legality rule exercised here depends on
# shape divisibility, not magnitude (grid_m > 1 at both layer shapes).
RNORM1 = (128, 55, 55, 96)  # r2d form (C not lane-aligned)
RNORM2 = (128, 27, 27, 256)  # folded-2D form (C-minor layout)


@pytest.mark.parametrize("shape", [RNORM1, RNORM2], ids=["rnorm1", "rnorm2"])
def test_lrn_fwd_bwd_lowering(shape):
    x = jnp.zeros(shape, jnp.bfloat16)

    def f(x):
        y = lrn.response_norm_cross_map(
            x, 0.0001, 0.75, 0.052, False, "pallas", True
        )
        return jnp.sum(y.astype(jnp.float32))

    _lower_tpu(jax.value_and_grad(f), x)


@pytest.mark.parametrize("shape", [RNORM1, RNORM2], ids=["rnorm1", "rnorm2"])
def test_lrn_bias_fwd_bwd_lowering(shape):
    """The round-4 chip failure: the bias-gradient partial's (1, C)
    output block violates the (8, 128) rule whenever grid_m > 1. Now a
    full-array (8, C) accumulator — this test pins the legality."""
    x = jnp.zeros(shape, jnp.bfloat16)
    b = jnp.zeros((shape[-1],), jnp.float32)

    def f(x, b):
        y = lrn.response_norm_cross_map_bias(
            x, b, 0.0001, 0.75, 0.052, False, "pallas", True
        )
        return jnp.sum(y.astype(jnp.float32))

    _lower_tpu(jax.value_and_grad(f, argnums=(0, 1)), x, b)


def test_fused_pool_lrn_bias_lowering():
    x = jnp.zeros(RNORM1, jnp.bfloat16)
    b = jnp.zeros((RNORM1[-1],), jnp.float32)

    def f(x, b):
        m = fused_pool_lrn.lrn_maxpool_bias(
            x, b, 0.0001, 0.75, 0.052, False, 3, 2, 0, True, "pallas"
        )
        return jnp.sum(m.astype(jnp.float32))

    _lower_tpu(jax.value_and_grad(f, argnums=(0, 1)), x, b)


def test_fused_pool_lrn_lowering():
    x = jnp.zeros(RNORM1, jnp.bfloat16)

    def f(x):
        m = fused_pool_lrn.lrn_maxpool(
            x, 0.0001, 0.75, 0.052, False, 3, 2, 0, True, "pallas"
        )
        return jnp.sum(m.astype(jnp.float32))

    _lower_tpu(jax.value_and_grad(f), x)


@pytest.mark.parametrize("kform", ["3d", "2d", "mxu"])
def test_s2d_relayout_lowering(kform, monkeypatch):
    """The round-3 chip failure class: the relayout block plan must obey
    the (8, 128) rule at AlexNet geometry, for every in-VMEM transpose
    strategy (the backend compile is additionally hardware-gated under
    make test-tpu / tools/r4_compilecheck.py)."""
    monkeypatch.setenv("CONVNET_S2D_RELAYOUT_KFORM", kform)
    raw = jnp.zeros((128, 256, 256, 3), jnp.uint8)
    oy = jnp.zeros((128,), jnp.int32)
    ox = jnp.zeros((128,), jnp.int32)
    flips = jnp.zeros((128,), jnp.bool_)

    def f(raw, oy, ox, flips):
        s2d = jitter_s2d(
            raw, oy, ox, flips, crop=224, kernel=11, stride=4,
            scale=1 / 255, mean=np.full((3,), 0.45, np.float32),
        )
        return jnp.sum(s2d.x.astype(jnp.float32))

    _lower_tpu(f, raw, oy, ox, flips)


def test_jitter_gather_lowering(monkeypatch):
    """Round-5 gather kernel at the full AlexNet input geometry
    (256 raw / 224 crop / stride 4 / Pp 64): the oy/ox pl.when
    switches, deinterleave transposes, flip dots, and partial-lane
    assembly must all pass Mosaic's Python-side lowering."""
    from convnet_tpu.ops.jitter_gather import gather_crop_phased

    B = 8

    def f(x, oy, ox, fl):
        return gather_crop_phased(
            x, oy, ox, fl, crop=224, stride=4, p_pad=64, scale=1 / 255,
            mean=np.asarray([0.45, 0.45, 0.45], np.float32),
            std=np.asarray([0.2, 0.25, 0.3], np.float32),
        )

    _lower_tpu(
        f,
        jax.ShapeDtypeStruct((B, 256, 256, 3), jnp.uint8),
        jax.ShapeDtypeStruct((B,), jnp.int32),
        jax.ShapeDtypeStruct((B,), jnp.int32),
        jax.ShapeDtypeStruct((B,), jnp.int32),
    )


@pytest.mark.parametrize(
    "shape,k,s",
    [
        ((128, 55, 55, 96), 3, 2),   # pool1 (bminor)
        ((128, 27, 27, 256), 3, 2),  # pool2 (cminor)
        ((128, 13, 13, 256), 3, 2),  # pool5 (cminor)
    ],
)
def test_pallas_maxpool_lowering(shape, k, s):
    from convnet_tpu.ops.pool import _maxpool_pallas, _pool_form

    x = jax.ShapeDtypeStruct(shape, jnp.bfloat16)
    form = _pool_form(x, k, s, 0)
    assert form is not None
    _lower_tpu(lambda a: _maxpool_pallas(a, k, s, 0, form), x)
