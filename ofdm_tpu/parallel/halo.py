"""Exact contiguous-stream convolution under sharding via ppermute halos.

The reference convolves ONE serial sample stream with the channel IR and
truncates (channel/models.py:46-62), so sample dependencies cross block —
and, under sharding, shard — boundaries.  The default sharded mode runs
per-shard *independent* streams (statistically identical, no collectives in
the convolution).  This module implements the exact alternative named in
SURVEY §2.12/§5: the (K-1)-sample convolution tail (equivalently, the
previous time row for the matmul-form operators) is exchanged between
neighbor shards with `jax.lax.ppermute`, so one globally *contiguous*
stream — laid out shard-major along the batch axis — convolves bit-exactly
as if it were unsharded.

Key structural fact making this cheap: the halo a shard needs from its left
neighbor is a pure function of the neighbor's *transmitted* blocks (the
convolution carry is the last input row / input tail, not an output), so the
exchange is a single (T,)-row ppermute per chunk with no sequential
dependency chain across shards.

The new global carry (the last row of the whole chunk's stream, produced on
shard n-1) is replicated to all shards via the ppermute wrap-around: shard 0
receives shard n-1's row, and a masked psum broadcasts it.  Collectives per
chunk: one ppermute + one (T,)-vector psum — negligible against the chunk's
matmuls, riding ICI.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from ofdm_tpu.ops import channel as ch
from ofdm_tpu.ops import cplx
from ofdm_tpu.ops import linops
from ofdm_tpu.ops.cplx import Complexish


def _neighbor_shift(x: Complexish, axis_name: str):
    """Send each shard's value to its right neighbor (wrap-around).

    Returns (received_value, is_shard0, n_shards): shard d receives shard
    d-1's value; shard 0 receives shard n-1's (the wrap) — which is exactly
    the chunk's new global carry.
    """
    n = jax.lax.axis_size(axis_name)  # static mesh extent
    idx = jax.lax.axis_index(axis_name)
    perm = [(i, (i + 1) % n) for i in range(n)]
    recv = jax.tree.map(lambda a: jax.lax.ppermute(a, axis_name, perm), x)
    return recv, idx == 0, n


def _broadcast_from_shard0(x: Complexish, is0, axis_name: str) -> Complexish:
    """Replicate shard 0's value to every shard (masked psum)."""
    return jax.tree.map(
        lambda a: jax.lax.psum(jnp.where(is0, a, jnp.zeros_like(a)), axis_name), x
    )


def convolve_stream_sharded(
    blocks: Complexish,
    t0: Tuple[jnp.ndarray, jnp.ndarray],
    t1: Tuple[jnp.ndarray, jnp.ndarray],
    carry_row: Complexish,
    axis_name: str,
    passes: int = 3,
    ext: int = None,
) -> Tuple[Complexish, Complexish]:
    """Matmul-form stream convolution of a contiguous sharded stream.

    ``blocks`` is the local (B_local, T) shard of a shard-major global
    (B, T) stream; ``carry_row`` is the *replicated* (T,) last row of the
    previous chunk's global stream.  Returns ``(out_local, new_carry)`` with
    ``new_carry`` replicated.  Bit-exact vs `linops.convolve` on the
    unsharded stream: the halo row enters the identical T1 matmul.
    """
    last = blocks[-1]
    recv, is0, _ = _neighbor_shift(last, axis_name)
    prev_row = cplx.where(is0, carry_row, recv)
    out, _ = linops.convolve(blocks, t0, t1, prev_row, passes=passes, ext=ext)
    new_carry = _broadcast_from_shard0(recv, is0, axis_name)
    return out, new_carry


def convolve_taps_sharded(
    blocks: Complexish,
    taps: Complexish,
    carry_tail: Complexish,
    axis_name: str,
) -> Tuple[Complexish, Complexish]:
    """Tap-unrolled stream convolution of a contiguous sharded stream.

    ``carry_tail`` is the replicated (K-1,) sample tail spilling out of the
    previous chunk's global stream.  Bit-exact vs `channel.convolve_blocks`
    on the unsharded stream: the local conv runs with a zero head first
    (x + 0 == x in IEEE), then the neighbor's tail adds into the first K-1
    samples of row 0 — the same single addition the unsharded path performs.
    """
    K = taps.shape[0]
    out0, tail = ch.convolve_blocks(blocks, taps, None)
    if K == 1:
        return out0, carry_tail
    recv, is0, _ = _neighbor_shift(tail, axis_name)
    prev_tail = cplx.where(is0, carry_tail, recv)
    out = cplx.at_add(out0, (0, slice(0, K - 1)), prev_tail)
    new_carry = _broadcast_from_shard0(recv, is0, axis_name)
    return out, new_carry
