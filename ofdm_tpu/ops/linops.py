"""Matmul-form link operators: modulate/convolve/demodulate as MXU matrices.

Profiling on the target TPU showed the tap-unrolled stream convolution
dominating the chunk (lane-offset dynamic-update-slices force full-array
relayouts).  Every linear stage of the link is, mathematically, a small
matrix acting on the time/frequency axis, so the planar hot path can instead
run four batched matmuls per chunk:

    x = X @ F_tx            IDFT + guard insertion          (N  -> T)
    y = x @ T0 + prev(x) @ T1   banded-Toeplitz stream conv (T  -> T)
    Y = y @ R               guard removal (CP strip / ZP overlap-add) + DFT
                                                            (T  -> N)

where ``prev(x)`` is x shifted one OFDM symbol down the batch axis (the
cross-symbol ISI — the tail of symbol b spills into symbol b+1), carrying the
last row across chunks so the stream convolution stays bit-equivalent to
``np.convolve(stream)[:len]`` (channel/models.py:46-62 semantics).

All matrices are precomputed host-side in complex128 and applied with the
precise bf16x3 Karatsuba matmul (ops.cplx.matmul).  T = N + L.
"""

from __future__ import annotations

from functools import lru_cache
from typing import Optional, Tuple

import jax.numpy as jnp
import numpy as np

from ofdm_tpu.config import ModulationType, PrefixType
from ofdm_tpu.ops import cplx
from ofdm_tpu.ops.cplx import CArray
from ofdm_tpu.ops.dft import dft_matrix


@lru_cache(maxsize=None)
def tx_matrix(
    n: int, prefix: PrefixType, L: int, modulation: ModulationType
) -> Tuple[np.ndarray, np.ndarray]:
    """(re, im) of F_tx (N, T): frequency symbols -> time block with guard.

    OFDM: orthonormal IDFT then CP prepend / ZP append.  SC-FDE: identity
    (symbols are already time domain) then guard.
    """
    if modulation == ModulationType.OFDM:
        fr, fi = dft_matrix(n, inverse=True)
        base = fr + 1j * fi  # (N, N), symmetric
    else:
        base = np.eye(n, dtype=np.complex128)
    if L == 0 or prefix == PrefixType.NONE:
        out = base
    elif prefix == PrefixType.CYCLIC:
        out = np.concatenate([base[:, n - L :], base], axis=1)  # (N, N+L)
    elif prefix == PrefixType.ZERO:
        out = np.concatenate([base, np.zeros((n, L), np.complex128)], axis=1)
    else:
        raise ValueError(prefix)
    return np.ascontiguousarray(out.real), np.ascontiguousarray(out.imag)


def conv_matrices(taps: np.ndarray, T: int) -> Tuple[np.ndarray, np.ndarray]:
    """(T0, T1) complex (T, T): intra-symbol and previous-symbol Toeplitz bands.

    y[b] = x[b] @ T0 + x[b-1] @ T1 equals the stream convolution restricted
    to symbol b's samples: T0[j, m] = h[m-j] (0 <= m-j < K) and
    T1[j, m] = h[T+m-j] (0 < T+m-j < K).
    """
    K = len(taps)
    T0 = np.zeros((T, T), np.complex128)
    T1 = np.zeros((T, T), np.complex128)
    for k in range(K):
        # T0: output m = j + k.
        idx = np.arange(T - k)
        T0[idx, idx + k] = taps[k]
        # T1: output m = j + k - T (j near the end, m near the start).
        if k >= 1:
            jdx = np.arange(T - k, T)
            mdx = jdx + k - T
            T1[jdx, mdx] = taps[k]
    return T0, T1


def ext_width(num_taps: int, T: int) -> int:
    """Lanes of previous-symbol tail that reach into the current block.

    The stream convolution's ISI spans ``num_taps - 1`` samples (clamped to
    one block: T1 has at most T nonzero rows)."""
    return max(0, min(num_taps - 1, T))


def conv_matrix_merged(taps: np.ndarray, T: int) -> np.ndarray:
    """Single (T+E, T) complex matrix C with y[b] = [x[b] | tail(x[b-1])] @ C.

    Rows 0..T-1 are T0 (intra band); rows T..T+E-1 are the E = num_taps-1
    nonzero rows of T1 (the previous block's last E samples are the only
    ones that spill into block b).  Merging halves the fused kernel's conv
    VMEM staging and — while T+E <= 128 — runs the stream convolution in
    ONE MXU pass set instead of two (same banded-Toeplitz semantics as
    `conv_matrices`, reference channel/models.py:46-62)."""
    E = ext_width(len(taps), T)
    T0, T1 = conv_matrices(taps, T)
    return np.concatenate([T0, T1[T - E :, :]], axis=0) if E else T0


def conv_rx_merged(
    taps: np.ndarray, n: int, prefix: PrefixType, L: int
) -> np.ndarray:
    """Single (T+E, N) complex matrix folding conv INTO guard-strip + DFT.

    For CP / no-prefix RX, guard removal is a pure row selection and the
    orthonormal DFT is unitary, so Y = ([x | tail(prev)] @ C) @ R collapses
    to one matmul with C @ R — and, because the stripped samples never
    reach Y and the DFT is unitary, adding iid complex AWGN per *frequency
    bin* after this matmul is distributed EXACTLY as adding it per time
    sample before R (reference semantics, channel/models.py:46-62 +
    modulation/models.py:41-55).  Not valid for ZP: overlap-add sums two
    noisy samples into the head bins, correlating the folded noise.
    """
    assert prefix != PrefixType.ZERO
    T = n + L
    rr, ri = rx_matrix(n, prefix, L)
    return conv_matrix_merged(taps, T) @ (rr + 1j * ri)


@lru_cache(maxsize=None)
def rx_matrix(
    n: int, prefix: PrefixType, L: int
) -> Tuple[np.ndarray, np.ndarray]:
    """(re, im) of R (T, N): guard removal + orthonormal DFT.

    CP: drop the first L samples.  ZP: overlap-add the tail onto the head
    (equivalent to the reference's dense [I | overlap] matrix,
    prefix/models.py:88-101, fused with the DFT).
    """
    fr, fi = dft_matrix(n, inverse=False)
    F = fr + 1j * fi  # (N, N)
    T = n + L
    R = np.zeros((T, n), np.complex128)
    if L == 0 or prefix == PrefixType.NONE:
        R[:, :] = F
    elif prefix == PrefixType.CYCLIC:
        R[L:, :] = F
    elif prefix == PrefixType.ZERO:
        R[:n, :] = F
        R[n:, :] = F[:L, :]  # tail adds onto head rows
    else:
        raise ValueError(prefix)
    return np.ascontiguousarray(R.real), np.ascontiguousarray(R.imag)


def _mm(x: CArray, mats: Tuple[np.ndarray, np.ndarray], passes: int = 3) -> CArray:
    return cplx.matmul(
        x,
        jnp.asarray(mats[0], jnp.float32),
        jnp.asarray(mats[1], jnp.float32),
        passes=passes,
    )


def modulate(
    symbols: CArray,
    n: int,
    prefix: PrefixType,
    L: int,
    modulation: ModulationType,
    passes: int = 3,
) -> CArray:
    """(B, N) frequency/time symbols -> (B, T) guarded time blocks."""
    return _mm(symbols, tx_matrix(n, prefix, L, modulation), passes)


def convolve(
    blocks: CArray,
    t0: Tuple[jnp.ndarray, jnp.ndarray],
    t1: Tuple[jnp.ndarray, jnp.ndarray],
    carry_row: Optional[CArray] = None,
    passes: int = 3,
    ext: Optional[int] = None,
) -> Tuple[CArray, CArray]:
    """Stream conv via Toeplitz matmuls; returns (out, last_row_carry).

    ``ext`` (= num_taps - 1, `ext_width`) enables the banded ISI form: T1's
    only nonzero rows are its last ``ext`` (the previous block's tail is all
    that spills into this block), so the second matmul shrinks from (B, T) @
    (T, T) to (B, E) @ (E, T) — at wide links this halves the conv FLOPs.
    ``t1`` must then be the (E, T) band ``T1[T-E:, :]``.  ``ext=None`` keeps
    the dense two-matmul form (t1 the full (T, T) matrix); ``ext=0`` (flat
    channel) skips the ISI term entirely.
    """
    if carry_row is None:
        carry_row = cplx.zeros((blocks.shape[-1],), blocks)
    prev = cplx.concat([carry_row[None, :], blocks[:-1]], axis=0)
    out = cplx.matmul(blocks, t0[0], t0[1], passes=passes)
    if ext is None:
        out = out + cplx.matmul(prev, t1[0], t1[1], passes=passes)
    elif ext > 0:
        T = blocks.shape[-1]
        out = out + cplx.matmul(prev[..., T - ext :], t1[0], t1[1], passes=passes)
    return out, blocks[-1]


def demodulate(y: CArray, n: int, prefix: PrefixType, L: int, passes: int = 3) -> CArray:
    """(B, T) received blocks -> (B, N) unequalized frequency symbols."""
    return _mm(y, rx_matrix(n, prefix, L), passes)
