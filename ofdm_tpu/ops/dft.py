"""DFT on the MXU: orthonormal (I)DFT as batched complex matmuls.

TPU-native replacement for FFT custom calls (unsupported on the target
backend, and for N <= a few thousand the dense DFT is a *better* fit for the
hardware anyway): the transform over ``(..., N)`` batches becomes a
``(B, N) @ (N, N)`` matmul pipeline that lives entirely on the 128x128
systolic array, with bf16x3-split passes for f32 accuracy
(ofdm_tpu.ops.cplx.dot_precise).

For native complex arrays (CPU/GPU parity paths) we fall through to jnp.fft.
"""

from __future__ import annotations

from functools import lru_cache
from typing import Tuple

import jax.numpy as jnp
import numpy as np

from ofdm_tpu.ops import cplx
from ofdm_tpu.ops.cplx import CArray, Complexish


@lru_cache(maxsize=None)
def dft_matrix(n: int, inverse: bool) -> Tuple[np.ndarray, np.ndarray]:
    """(real, imag) parts of the orthonormal (I)DFT matrix, float64 host-side.

    Layout is ``y = x @ F`` with x a row vector, i.e. F[k, j] = w^{kj}/sqrt(N)
    (symmetric, so row/column convention doesn't matter).
    """
    k = np.arange(n)
    sign = 2j if inverse else -2j
    F = np.exp(sign * np.pi * np.outer(k, k) / n) / np.sqrt(n)
    return np.ascontiguousarray(F.real), np.ascontiguousarray(F.imag)


# Above this size, use the two-stage Cooley-Tukey matmul factorization:
# dense DFT work is O(N^2) per row, the N1 x N2 split is O(N (N1 + N2)) —
# 16x fewer MXU FLOPs at N=1024 for two small matmuls plus a twiddle.
_CT_THRESHOLD = 256


def _split_factors(n: int) -> Tuple[int, int]:
    """Near-square factor pair (N1, N2) with N1 * N2 == n."""
    n1 = 1
    for f in range(int(np.sqrt(n)), 0, -1):
        if n % f == 0:
            n1 = f
            break
    return n1, n // n1


def _apply_dense(x: CArray, n: int, inverse: bool, passes: int = 3) -> CArray:
    fr, fi = dft_matrix(n, inverse)
    wr = jnp.asarray(fr, jnp.float32)
    wi = jnp.asarray(fi, jnp.float32)
    lead = x.shape[:-1]
    flat = x.reshape(-1, n)
    out = cplx.matmul(flat, wr, wi, passes=passes)
    return out.reshape(*lead, n)


@lru_cache(maxsize=None)
def _ct_constants(n: int, inverse: bool):
    """(N1, N2, F2r, F2i, twiddle_r, twiddle_i, F1r, F1i) for the CT split.

    With x[n] laid out as n = N1*n2 + n1 and X[k] as k = N2*k1 + k2:
      X[N2 k1 + k2] = sum_{n1} W_N1^{n1 k1} * W_N^{n1 k2}
                      * (sum_{n2} x[N1 n2 + n1] W_N2^{n2 k2})
    Both sub-DFTs are orthonormal; the twiddle carries the remaining
    1/sqrt(N)/(1/sqrt(N1)/sqrt(N2)) = 1 factor, so the result is ortho.
    """
    n1, n2 = _split_factors(n)
    f2 = dft_matrix(n2, inverse)
    f1 = dft_matrix(n1, inverse)
    sign = 2j if inverse else -2j
    tw = np.exp(sign * np.pi * np.outer(np.arange(n1), np.arange(n2)) / n)
    # HOST arrays only: caching device arrays here would leak tracers when
    # the first call happens inside a jit trace (observed: a second runner's
    # scan reusing a cache entry populated during another runner's trace).
    return (
        n1,
        n2,
        np.asarray(f2[0], np.float32),
        np.asarray(f2[1], np.float32),
        np.asarray(tw.real, np.float32),
        np.asarray(tw.imag, np.float32),
        np.asarray(f1[0], np.float32),
        np.asarray(f1[1], np.float32),
    )


def _apply_ct(x: CArray, n: int, inverse: bool, passes: int = 3) -> CArray:
    n1, n2, f2r, f2i, twr, twi, f1r, f1i = _ct_constants(n, inverse)
    f2r, f2i = jnp.asarray(f2r), jnp.asarray(f2i)
    twr, twi = jnp.asarray(twr), jnp.asarray(twi)
    f1r, f1i = jnp.asarray(f1r), jnp.asarray(f1i)
    lead = x.shape[:-1]
    b = int(np.prod(lead)) if lead else 1

    def t(a):  # (B, N) -> (B, n1, n2): rows n1, columns n2 (n = n1 + N1*n2)
        return a.reshape(b, n2, n1).transpose(0, 2, 1)

    xt = CArray(t(x.re), t(x.im))  # (B, n1, n2)
    # Stage 1: DFT over n2 for each n1.
    y = cplx.matmul(xt.reshape(b * n1, n2), f2r, f2i, passes=passes).reshape(b, n1, n2)
    # Twiddle: W_N^{n1 k2}.
    y = y * CArray(twr, twi)
    # Stage 2: DFT over n1 for each k2: transpose to (B, k2, n1).
    yt = CArray(y.re.transpose(0, 2, 1), y.im.transpose(0, 2, 1))
    z = cplx.matmul(yt.reshape(b * n2, n1), f1r, f1i, passes=passes).reshape(b, n2, n1)
    # Output layout: k = N2*k1 + k2 -> array (k1, k2) = transpose of z.
    out = CArray(z.re.transpose(0, 2, 1), z.im.transpose(0, 2, 1))
    return out.reshape(*lead, n)


def _apply(x: CArray, n: int, inverse: bool, passes: int = 3) -> CArray:
    n1, n2 = _split_factors(n)
    if n > _CT_THRESHOLD and n1 >= 8:
        return _apply_ct(x, n, inverse, passes)
    return _apply_dense(x, n, inverse, passes)


def fft_ortho(x: Complexish, n: int, passes: int = 3) -> Complexish:
    if isinstance(x, CArray):
        if x.shape[-1] != n:
            raise ValueError(f"Planar DFT requires last dim == n ({x.shape[-1]} != {n})")
        return _apply(x, n, inverse=False, passes=passes)
    return jnp.fft.fft(x, n=n, axis=-1, norm="ortho")


def ifft_ortho(x: Complexish, n: int, passes: int = 3) -> Complexish:
    if isinstance(x, CArray):
        if x.shape[-1] != n:
            raise ValueError(f"Planar DFT requires last dim == n ({x.shape[-1]} != {n})")
        return _apply(x, n, inverse=True, passes=passes)
    return jnp.fft.ifft(x, n=n, axis=-1, norm="ortho")
