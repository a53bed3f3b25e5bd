"""OFDM / SC-FDE modulation core: ortho (I)DFT + guard-interval schemes.

Batched over OFDM blocks: every function takes/returns ``(..., N)`` or
``(..., N + L)`` arrays and is jit/vmap/shard_map friendly.  This replaces the
reference's per-row Python list comprehensions (modulation/models.py:35-86)
and its dense-matrix zero-padding removal (prefix/models.py:88-101) with
sliced, fused array ops (SURVEY §2.11 items 1 and 6).

All ops are generic over native complex arrays and planar
:class:`ofdm_tpu.ops.cplx.CArray` (the TPU hot path, where the transform is
an MXU matmul — see ofdm_tpu.ops.dft).

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

from ofdm_tpu.config import PrefixType
from ofdm_tpu.ops import cplx
from ofdm_tpu.ops.cplx import Complexish
from ofdm_tpu.ops.dft import fft_ortho, ifft_ortho  # noqa: F401  (re-exported)


# ---------------------------------------------------------------------------
# Guard intervals
# ---------------------------------------------------------------------------


def add_prefix(x: Complexish, prefix_type: PrefixType, prefix_length: int) -> Complexish:
    """Add a guard interval along the last axis: (..., N) -> (..., N + L)."""
    if prefix_length == 0 or prefix_type == PrefixType.NONE:
        return x
    if prefix_type == PrefixType.CYCLIC:
        return cplx.concat([x[..., -prefix_length:], x], axis=-1)
    if prefix_type == PrefixType.ZERO:
        return cplx.pad_last(x, 0, prefix_length)
    raise ValueError(f"Unknown prefix type: {prefix_type}")


def remove_prefix(x: Complexish, prefix_type: PrefixType, prefix_length: int) -> Complexish:
    """Remove a guard interval along the last axis: (..., N + L) -> (..., N)."""
    if prefix_length == 0 or prefix_type == PrefixType.NONE:
        return x
    if prefix_type == PrefixType.CYCLIC:
        return x[..., prefix_length:]
    if prefix_type == PrefixType.ZERO:
        # Overlap-add: fold the ZP tail (which carries the ISI spill of this
        # block) back onto the head — restores circular convolution.
        n = x.shape[-1] - prefix_length
        body = x[..., :n]
        tail = x[..., n:]
        return cplx.at_add(body, (Ellipsis, slice(0, prefix_length)), tail)
    raise ValueError(f"Unknown prefix type: {prefix_type}")


# ---------------------------------------------------------------------------
# Modulators (equalizer is applied by the caller; see ops/equalize.py)
# ---------------------------------------------------------------------------


def ofdm_modulate(
    symbols: Complexish, n_sc: int, prefix_type: PrefixType, prefix_length: int
) -> Complexish:
    """Frequency-domain symbols (..., N) -> time-domain blocks (..., N + L)."""
    return add_prefix(ifft_ortho(symbols, n_sc), prefix_type, prefix_length)


def ofdm_demodulate_to_freq(
    blocks: Complexish, n_sc: int, prefix_type: PrefixType, prefix_length: int
) -> Complexish:
    """Time blocks (..., N + L) -> unequalized frequency symbols (..., N)."""
    return fft_ortho(remove_prefix(blocks, prefix_type, prefix_length), n_sc)


def sc_modulate(
    symbols: Complexish, prefix_type: PrefixType, prefix_length: int
) -> Complexish:
    """SC-FDE TX: time-domain symbols get only a guard interval."""
    return add_prefix(symbols, prefix_type, prefix_length)


def sc_demodulate_from_freq(
    equalized_freq: Complexish, n_sc: int, passes: int = 3
) -> Complexish:
    """SC-FDE RX back-end: equalized frequency bins -> time-domain symbols."""
    return ifft_ortho(equalized_freq, n_sc, passes=passes)
