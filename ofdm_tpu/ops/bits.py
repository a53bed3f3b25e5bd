"""Bit-source ops: counter-based random bits, pack/unpack.

Replaces the reference's BytesIO byte-stream plumbing
(bits_generation/models.py:18-163, simulation/models.py:59-69) with integer
arrays and `jax.random`.  The reference's PCG64 stream cannot (and need not)
be reproduced bit-for-bit — parity is statistical (SURVEY §7.1); seeded runs
of *this* framework are fully reproducible, and per-shard keys derive via
`jax.random.fold_in`, which is the shardable analog of the reference's seeded
generators.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def random_bits(key: jax.Array, shape) -> jnp.ndarray:
    """Uniform random bits as uint8 zeros/ones."""
    nbits = int(np.prod(shape)) if shape else 1
    nwords = -(-nbits // 32)
    words = jax.random.bits(key, (nwords,), jnp.uint32)
    shifts = jnp.arange(32, dtype=jnp.uint32)
    bits = ((words[:, None] >> shifts) & 1).astype(jnp.uint8).reshape(-1)[:nbits]
    return bits.reshape(shape)


def pack_bits(bits: jnp.ndarray) -> jnp.ndarray:
    """Pack (..., 8k) uint8 bits MSB-first into (..., k) uint8 bytes."""
    *lead, n = bits.shape
    if n % 8:
        raise ValueError("Bit count must be a multiple of 8 to pack into bytes.")
    groups = bits.reshape(*lead, n // 8, 8).astype(jnp.uint8)
    weights = jnp.asarray([128, 64, 32, 16, 8, 4, 2, 1], jnp.uint8)
    return jnp.sum(groups * weights, axis=-1, dtype=jnp.uint8)


def unpack_bits(data: jnp.ndarray) -> jnp.ndarray:
    """Unpack (..., k) uint8 bytes MSB-first into (..., 8k) uint8 bits."""
    shifts = jnp.asarray([7, 6, 5, 4, 3, 2, 1, 0], jnp.uint8)
    bits = (data[..., None] >> shifts) & 1
    return bits.reshape(*data.shape[:-1], data.shape[-1] * 8).astype(jnp.uint8)
