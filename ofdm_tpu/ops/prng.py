"""Device RNG: Pallas TPU PRNG kernels with a jax.random fallback.

The XLA threefry lowering is pathologically expensive on the target TPU
backend (hundreds of ms per call and minutes of compile time for large
draws); TPUs have a hardware PRNG that Pallas exposes (`pltpu.prng_seed` /
`pltpu.prng_random_bits`).  This module provides:

  * :func:`random_u32`      — raw uniform 32-bit words
  * :func:`normal_planes`   — two iid N(0,1) planes (Box-Muller, fused in-kernel)

On non-TPU backends both fall back to `jax.random` (tests / CPU parity runs).
Seeding: the caller's `jax.random` key data plus the Pallas grid block index
seed the per-core PRNG, so chunks (fold_in'd keys) and grid blocks draw
independent streams.

SURVEY §7.1: the reference's PCG64 stream need not be reproduced — parity is
statistical; seeded runs of this framework remain reproducible per backend.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Block shape for PRNG kernels: 8 sublanes x 128 lanes x 64 rows.
_BLOCK_ROWS = 512
_COLS = 128
_BLOCK = _BLOCK_ROWS * _COLS


def _use_pallas() -> bool:
    return jax.default_backend() not in ("cpu", "gpu")


def _key_seeds(key: jax.Array) -> jnp.ndarray:
    """(2,) int32 seed words from a jax.random key."""
    data = jax.random.key_data(key).reshape(-1).astype(jnp.uint32)
    return data[:2].astype(jnp.int32)


# ---------------------------------------------------------------------------
# Raw uniform bits
# ---------------------------------------------------------------------------


def _mix(seed0, block):
    # prng_seed accepts at most 2 words; mix the grid block index into the
    # first word (Knuth multiplicative hash) to decorrelate blocks.
    return seed0 + block * jnp.int32(-1640531527)


def _bits_kernel(seed_ref, o_ref):
    pltpu.prng_seed(_mix(seed_ref[0], pl.program_id(0)), seed_ref[1])
    o_ref[:] = pltpu.prng_random_bits(o_ref.shape)


def _pallas_u32(key: jax.Array, count: int) -> jnp.ndarray:
    blocks = -(-count // _BLOCK)
    out = pl.pallas_call(
        _bits_kernel,
        grid=(blocks,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)],
        out_specs=pl.BlockSpec(
            (_BLOCK_ROWS, _COLS), lambda i: (i, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((blocks * _BLOCK_ROWS, _COLS), jnp.uint32),
    )(_key_seeds(key))
    return out.reshape(-1)[:count]


def random_u32(key: jax.Array, shape) -> jnp.ndarray:
    """Uniform uint32 words of the given shape."""
    count = int(np.prod(shape)) if shape else 1
    if _use_pallas():
        return _pallas_u32(key, count).reshape(shape)
    return jax.random.bits(key, shape, jnp.uint32)


def uniform_indices(key: jax.Array, shape, mask) -> jnp.ndarray:
    """Uniform int32 indices in [0, mask] for power-of-two mask+1.

    ``mask`` may be a scalar (order-1) or a broadcastable per-position array
    (adaptive mode: order_k - 1, with 0 for inactive subcarriers).
    """
    u = random_u32(key, shape)
    return (u & jnp.asarray(mask, jnp.uint32)).astype(jnp.int32)


# ---------------------------------------------------------------------------
# Standard-normal pairs (Box-Muller), fused in one kernel on TPU
# ---------------------------------------------------------------------------

_INV_2_24 = float(1.0 / 16777216.0)  # 2^-24


def _normal_kernel(seed_ref, z0_ref, z1_ref):
    pltpu.prng_seed(_mix(seed_ref[0], pl.program_id(0)), seed_ref[1])
    shape = z0_ref.shape
    # Mosaic can't cast uint32->f32; mask 24 bits via int32 ops instead.
    b1 = pltpu.bitcast(pltpu.prng_random_bits(shape), jnp.int32)
    b2 = pltpu.bitcast(pltpu.prng_random_bits(shape), jnp.int32)
    u1 = ((b1 >> 8) & 0xFFFFFF).astype(jnp.float32) * _INV_2_24
    u1 = jnp.maximum(u1, _INV_2_24)
    u2 = ((b2 >> 8) & 0xFFFFFF).astype(jnp.float32) * _INV_2_24
    r = jnp.sqrt(-2.0 * jnp.log(u1))
    theta = (2.0 * np.pi) * u2
    z0_ref[:] = r * jnp.cos(theta)
    z1_ref[:] = r * jnp.sin(theta)


def _pallas_normal_pair(key: jax.Array, count: int) -> Tuple[jnp.ndarray, jnp.ndarray]:
    blocks = -(-count // _BLOCK)
    spec = pl.BlockSpec((_BLOCK_ROWS, _COLS), lambda i: (i, 0), memory_space=pltpu.VMEM)
    shape = jax.ShapeDtypeStruct((blocks * _BLOCK_ROWS, _COLS), jnp.float32)
    z0, z1 = pl.pallas_call(
        _normal_kernel,
        grid=(blocks,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)],
        out_specs=(spec, spec),
        out_shape=(shape, shape),
    )(_key_seeds(key))
    return z0.reshape(-1)[:count], z1.reshape(-1)[:count]


def normal_planes(key: jax.Array, shape) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Two independent N(0,1) float32 planes of the given shape."""
    count = int(np.prod(shape)) if shape else 1
    if _use_pallas():
        z0, z1 = _pallas_normal_pair(key, count)
        return z0.reshape(shape), z1.reshape(shape)
    kr, ki = jax.random.split(key)
    return (
        jax.random.normal(kr, shape, jnp.float32),
        jax.random.normal(ki, shape, jnp.float32),
    )
