"""Inverted dropout with recomputed masks (zero residual memory).

Reference counterpart: the dropout mask RNG in Matrix/Layer
(src/matrix.cc, src/layer.cc [U]) — the reference draws a fresh mask per
step on the GPU and applies `x * mask / keep`.

TPU-first design: the mask is never stored. Both backends draw the
mask from the key alone in BOTH forward and backward, so the VJP
carries NO residual (round 1 stored a full-size bool mask per dropout
layer). The default path is `jax.random.bernoulli` (threefry) inside
the jit — measured at parity with the Pallas hardware-PRNG kernel on
v5e (BASELINE.md) and free of its ~150s Mosaic compile. The Pallas
kernel (per-core `pltpu.prng_seed` from the folded key, fwd and bwd
re-seeding identically) stays behind CONVNET_DROPOUT_BACKEND=pallas
for memory-bound configs and is hardware-validated by `make test-tpu`.

The two backends draw different (but equally valid) masks; determinism
holds within a backend: same key -> same mask, and fwd/bwd masks always
agree because both derive from the key alone.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# reuse the LRN row-tiling policy: divisor-of-M tiles under a VMEM budget
from convnet_tpu.ops.lrn import _pick_tile


def _use_pallas() -> bool:
    """CONVNET_DROPOUT_BACKEND: "auto" | "pallas" | "xla" — same A/B
    knob as LRN. Measured on v5e-1 (AlexNet batch 512 bf16, 2 runs
    each): threefry 12175/12170 img/s vs hardware-PRNG 11902/12216 —
    within noise, and the Pallas kernel costs ~150s of Mosaic compile
    through the tunnel. auto therefore picks threefry; the kernel stays
    available (and TPU-validated via `make test-tpu`) for memory-bound
    configs where the zero-residual VJP matters."""
    backend = os.environ.get("CONVNET_DROPOUT_BACKEND", "auto")
    if backend == "pallas":
        return True
    if backend == "xla":
        return False
    return False


def _seed_words(key: jax.Array) -> jax.Array:
    """Two int32 words from a JAX PRNG key (old- or new-style)."""
    data = jax.random.key_data(key).reshape(-1).astype(jnp.uint32)
    return data[:2].astype(jnp.int32)


def _mask_kernel(seed_ref, x_ref, y_ref, *, threshold, inv_keep):
    # Mosaic takes at most 2 seed words: fold the tile index into one
    # (Knuth multiplicative hash) so every grid step draws distinct bits
    tile_seed = seed_ref[1] + pl.program_id(0) * jnp.int32(-1640531527)
    pltpu.prng_seed(seed_ref[0], tile_seed)
    bits = pltpu.prng_random_bits(x_ref.shape)
    keep = pltpu.bitcast(bits, jnp.uint32) >= jnp.uint32(threshold)
    y_ref[:] = jnp.where(keep, x_ref[:] * x_ref.dtype.type(inv_keep), 0)


def _pallas_apply(x2d, seed, rate):
    m, c = x2d.shape
    tile_m = _pick_tile(m, c)
    threshold = min(int(rate * (1 << 32)), (1 << 32) - 1)
    kernel = functools.partial(
        _mask_kernel, threshold=threshold, inv_keep=1.0 / (1.0 - rate)
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(pl.cdiv(m, tile_m),),
        in_specs=[
            pl.BlockSpec((tile_m, c), lambda i, *_: (i, 0), memory_space=pltpu.VMEM)
        ],
        out_specs=pl.BlockSpec(
            (tile_m, c), lambda i, *_: (i, 0), memory_space=pltpu.VMEM
        ),
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((m, c), x2d.dtype),
    )(seed, x2d)


def _apply(x, rate, key):
    """Draw the mask from `key` and apply inverted dropout — used by both
    fwd (on x) and bwd (on the cotangent): same key -> same mask."""
    if _use_pallas():
        c = x.shape[-1]
        y2d = _pallas_apply(x.reshape(-1, c), _seed_words(key), rate)
        return y2d.reshape(x.shape)
    keep = jax.random.bernoulli(key, 1.0 - rate, x.shape)
    return jnp.where(keep, x / x.dtype.type(1.0 - rate), 0)


# nondiff_argnums for custom_vjp must lead the signature
@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def _dropout(rate: float, x: jax.Array, key: jax.Array) -> jax.Array:
    if rate <= 0.0:
        return x
    return _apply(x, rate, key)


def _dropout_fwd(rate, x, key):
    return _dropout(rate, x, key), key


def _dropout_bwd(rate, key, g):
    if rate <= 0.0:
        return (g, None)
    return (_apply(g, rate, key), None)


_dropout.defvjp(_dropout_fwd, _dropout_bwd)


def dropout(x: jax.Array, rate: float, key: jax.Array) -> jax.Array:
    """y = x * mask / (1-rate), mask ~ Bernoulli(1-rate) drawn from `key`.

    rate=0 is the identity. The VJP recomputes the mask from `key`
    instead of storing it (zero residual)."""
    return _dropout(float(rate), x, key)