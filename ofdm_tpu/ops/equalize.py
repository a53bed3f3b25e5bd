"""Per-subcarrier one-tap frequency-domain equalizers (ZF / MMSE / none).

Batched over OFDM symbols: ``rx`` is ``(..., N)``; ``H`` is ``(N,)``.
Generic over native complex arrays and planar CArray (TPU path).

Reference semantics being matched (equalization/models.py):
  * ZF (:22-35): rx / H with H==0 replaced by eps=1e-10.
  * MMSE (:39-63): the noise variance is *re-estimated from each received
    row*: sigma^2 = mean(|rx_row|^2) / snr_lin / mean(|H|^2), then the filter
    is conj(H) / (|H|^2 + sigma^2).  This per-row estimate materially shifts
    BER curves (SURVEY §7.3), so it is replicated exactly — vectorized as a
    keepdims row-mean instead of the reference's per-row Python loop
    (modulation/models.py:51-53).
  * H is whatever the caller supplies; the reference builds it from the
    *un-normalized* constructor impulse response (simulation/models.py:263-266
    — a documented quirk the pipeline preserves).
"""

from __future__ import annotations

import jax.numpy as jnp

from ofdm_tpu.config import EqualizationMethod
from ofdm_tpu.ops import cplx
from ofdm_tpu.ops.cplx import CArray, Complexish

_EPS = 1e-10


def zero_forcing(rx: Complexish, h_freq: Complexish) -> Complexish:
    if isinstance(h_freq, CArray):
        is_zero = (h_freq.re == 0) & (h_freq.im == 0)
        h = cplx.where(is_zero, CArray(jnp.full_like(h_freq.re, _EPS), jnp.zeros_like(h_freq.im)), h_freq)
    else:
        h = jnp.where(h_freq == 0, jnp.asarray(_EPS, h_freq.dtype), h_freq)
    return rx / h


def mmse(rx: Complexish, h_freq: Complexish, snr_db) -> Complexish:
    snr_linear = 10.0 ** (jnp.asarray(snr_db, jnp.float32) / 10.0)
    channel_gain = jnp.mean(cplx.abs2(h_freq))  # scalar, static per run
    # Per-row noise-variance estimate (equalization/models.py:39-49).
    signal_power = cplx.mean_abs2(rx, axis=-1, keepdims=True)
    noise_variance = signal_power / snr_linear / channel_gain
    h_abs2 = cplx.abs2(h_freq)
    gain = 1.0 / (h_abs2 + noise_variance)  # (..., N) real
    return rx * cplx.scale(cplx.conj(h_freq), gain)


def equalize(
    rx: Complexish,
    h_freq: Complexish,
    method: EqualizationMethod,
    snr_db: float,
) -> Complexish:
    """Strategy dispatch at trace time (enum is static under jit)."""
    if method == EqualizationMethod.ZF:
        return zero_forcing(rx, h_freq)
    if method == EqualizationMethod.MMSE:
        return mmse(rx, h_freq, snr_db)
    if method == EqualizationMethod.NONE:
        return rx
    raise ValueError(f"Unknown equalization method: {method}")
