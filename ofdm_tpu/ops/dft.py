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


def _apply(x: CArray, n: int, inverse: bool) -> CArray:
    fr, fi = dft_matrix(n, inverse)
    wr = jnp.asarray(fr, jnp.float32)
    wi = jnp.asarray(fi, jnp.float32)
    lead = x.shape[:-1]
    flat = x.reshape(-1, n)
    out = cplx.matmul(flat, wr, wi)
    return out.reshape(*lead, n)


def fft_ortho(x: Complexish, n: int) -> Complexish:
    if isinstance(x, CArray):
        if x.shape[-1] != n:
            raise ValueError(f"Planar DFT requires last dim == n ({x.shape[-1]} != {n})")
        return _apply(x, n, inverse=False)
    return jnp.fft.fft(x, n=n, axis=-1, norm="ortho")


def ifft_ortho(x: Complexish, n: int) -> Complexish:
    if isinstance(x, CArray):
        if x.shape[-1] != n:
            raise ValueError(f"Planar DFT requires last dim == n ({x.shape[-1]} != {n})")
        return _apply(x, n, inverse=True)
    return jnp.fft.ifft(x, n=n, axis=-1, norm="ortho")
