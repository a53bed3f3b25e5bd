"""OFDM / SC-FDE modulation core: ortho FFTs + guard-interval schemes.

Batched over OFDM blocks: every function takes/returns ``(..., N)`` or
``(..., N + L)`` arrays and is jit/vmap/shard_map friendly.  This replaces the
reference's per-row Python list comprehensions (modulation/models.py:35-86)
and its dense-matrix zero-padding removal (prefix/models.py:88-101) with
sliced, fused array ops (SURVEY §2.11 items 1 and 6).

Reference semantics being matched:
  * OFDM TX: IFFT(norm="ortho") then prefix        (modulation/models.py:27-38)
  * OFDM RX: strip prefix, FFT(ortho), equalize     (modulation/models.py:41-55)
  * SC-FDE TX: prefix only                          (modulation/models.py:67-72)
  * SC-FDE RX: strip, FFT, equalize, IFFT           (modulation/models.py:74-91)
  * CP: prepend last L samples / drop first L       (prefix/models.py:29-52)
  * ZP: append L zeros / overlap-add the L-sample tail onto the head
    (prefix/models.py:55-101 — the reference builds an (N x N+L) matrix
    [I | overlap]; the equivalent O(N) form is y = x[:N]; y[:L] += x[N:])
"""

from __future__ import annotations

import jax.numpy as jnp

from ofdm_tpu.config import PrefixType


def ifft_ortho(x: jnp.ndarray, n: int) -> jnp.ndarray:
    return jnp.fft.ifft(x, n=n, axis=-1, norm="ortho")


def fft_ortho(x: jnp.ndarray, n: int) -> jnp.ndarray:
    return jnp.fft.fft(x, n=n, axis=-1, norm="ortho")


# ---------------------------------------------------------------------------
# Guard intervals
# ---------------------------------------------------------------------------


def add_prefix(x: jnp.ndarray, prefix_type: PrefixType, prefix_length: int) -> jnp.ndarray:
    """Add a guard interval along the last axis: (..., N) -> (..., N + L)."""
    if prefix_length == 0 or prefix_type == PrefixType.NONE:
        return x
    if prefix_type == PrefixType.CYCLIC:
        return jnp.concatenate([x[..., -prefix_length:], x], axis=-1)
    if prefix_type == PrefixType.ZERO:
        pad = [(0, 0)] * (x.ndim - 1) + [(0, prefix_length)]
        return jnp.pad(x, pad)
    raise ValueError(f"Unknown prefix type: {prefix_type}")


def remove_prefix(x: jnp.ndarray, prefix_type: PrefixType, prefix_length: int) -> jnp.ndarray:
    """Remove a guard interval along the last axis: (..., N + L) -> (..., N)."""
    if prefix_length == 0 or prefix_type == PrefixType.NONE:
        return x
    if prefix_type == PrefixType.CYCLIC:
        return x[..., prefix_length:]
    if prefix_type == PrefixType.ZERO:
        # Overlap-add: fold the ZP tail (which carries the ISI spill of this
        # block) back onto the head — restores circular convolution.
        body = x[..., : x.shape[-1] - prefix_length]
        tail = x[..., x.shape[-1] - prefix_length :]
        return body.at[..., :prefix_length].add(tail)
    raise ValueError(f"Unknown prefix type: {prefix_type}")


# ---------------------------------------------------------------------------
# Modulators (equalizer is applied by the caller; see ops/equalize.py)
# ---------------------------------------------------------------------------


def ofdm_modulate(
    symbols: jnp.ndarray, n_sc: int, prefix_type: PrefixType, prefix_length: int
) -> jnp.ndarray:
    """Frequency-domain symbols (..., N) -> time-domain blocks (..., N + L)."""
    return add_prefix(ifft_ortho(symbols, n_sc), prefix_type, prefix_length)


def ofdm_demodulate_to_freq(
    blocks: jnp.ndarray, n_sc: int, prefix_type: PrefixType, prefix_length: int
) -> jnp.ndarray:
    """Time blocks (..., N + L) -> unequalized frequency symbols (..., N)."""
    return fft_ortho(remove_prefix(blocks, prefix_type, prefix_length), n_sc)


def sc_modulate(
    symbols: jnp.ndarray, prefix_type: PrefixType, prefix_length: int
) -> jnp.ndarray:
    """SC-FDE TX: time-domain symbols get only a guard interval."""
    return add_prefix(symbols, prefix_type, prefix_length)


def sc_demodulate_from_freq(equalized_freq: jnp.ndarray, n_sc: int) -> jnp.ndarray:
    """SC-FDE RX back-end: equalized frequency bins -> time-domain symbols."""
    return ifft_ortho(equalized_freq, n_sc)
