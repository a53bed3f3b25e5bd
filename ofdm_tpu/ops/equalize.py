"""Per-subcarrier one-tap frequency-domain equalizers (ZF / MMSE / none).

Batched over OFDM symbols: ``rx`` is ``(..., N)``; ``H`` is ``(N,)``.

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

_EPS = 1e-10


def zero_forcing(rx: jnp.ndarray, h_freq: jnp.ndarray) -> jnp.ndarray:
    h = jnp.where(h_freq == 0, jnp.asarray(_EPS, h_freq.dtype), h_freq)
    return rx / h


def mmse(rx: jnp.ndarray, h_freq: jnp.ndarray, snr_db: jnp.ndarray | float) -> jnp.ndarray:
    snr_linear = 10.0 ** (jnp.asarray(snr_db, jnp.float32) / 10.0)
    channel_gain = jnp.mean(jnp.abs(h_freq) ** 2)  # scalar, static per run
    # Per-row noise-variance estimate (equalization/models.py:39-49).
    signal_power = jnp.mean(jnp.abs(rx) ** 2, axis=-1, keepdims=True)
    noise_variance = signal_power / snr_linear / channel_gain
    h_conj = jnp.conj(h_freq)
    h_abs2 = jnp.abs(h_freq) ** 2
    return rx * (h_conj / (h_abs2 + noise_variance.astype(h_abs2.dtype)))


def equalize(
    rx: jnp.ndarray,
    h_freq: jnp.ndarray,
    method: EqualizationMethod,
    snr_db: float,
) -> jnp.ndarray:
    """Strategy dispatch at trace time (enum is static under jit)."""
    if method == EqualizationMethod.ZF:
        return zero_forcing(rx, h_freq)
    if method == EqualizationMethod.MMSE:
        return mmse(rx, h_freq, snr_db)
    if method == EqualizationMethod.NONE:
        return rx
    raise ValueError(f"Unknown equalization method: {method}")
