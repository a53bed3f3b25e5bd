"""Batch-minor fused hot path for the fixed-mode link.

The generic pipeline works on ``(batch, time)`` arrays; with N = 64..1024
subcarriers the minor (lane) dimension is small and oddly sized (N + L pads
to 128 lanes), wasting VPU width and forcing relayouts between nearly every
op.  This module implements the same fixed-mode chunk in **batch-minor
layout**: every array is ``(time_or_freq, batch)`` with the large Monte-Carlo
batch on the 128-lane axis, so

  * the (I)DFT is a stationary-operand matmul ``F (N,N) @ X (N,B)``;
  * all elementwise/per-subcarrier ops broadcast along lanes at full width;
  * the channel's cross-symbol ISI becomes a one-lane shift: the convolution
    tail rows of symbol b spill into the head rows of symbol b+1
    (lane b+1), implemented as a pad/slice on the lane axis;
  * per-OFDM-symbol reductions (MMSE row power) are sublane reductions.

Semantics are identical to pipeline.LinkRunner.chunk_body (fixed mode,
planar engine) and test-pinned against it; the pipeline selects this path
automatically for planar fixed-mode runs.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ofdm_tpu.config import (
    EqualizationMethod,
    ModulationType,
    NoiseType,
    PrefixType,
)
from ofdm_tpu.ops import cplx
from ofdm_tpu.ops import mapping as mp
from ofdm_tpu.ops import metrics as mt
from ofdm_tpu.ops import prng
from ofdm_tpu.ops.cplx import CArray
from ofdm_tpu.ops.dft import dft_matrix

_EPS = 1e-10


def _dft_apply_T(x: CArray, n: int, inverse: bool) -> CArray:
    """Batch-minor orthonormal (I)DFT: (N, B) -> (N, B) via F @ X.

    The DFT matrix is symmetric, so left-multiplication computes the same
    transform as the row-vector convention in ops.dft.
    """
    fr, fi = dft_matrix(n, inverse)
    wr = jnp.asarray(fr, jnp.float32)
    wi = jnp.asarray(fi, jnp.float32)
    # Karatsuba with precise bf16x3 passes, stationary lhs.
    p1 = cplx.dot_precise(wr, x.re)
    p2 = cplx.dot_precise(wi, x.im)
    p3 = cplx.dot_precise(wr + wi, x.re + x.im)
    return CArray(p1 - p2, p3 - p1 - p2)


def _shift_lane(a: jnp.ndarray, fill_col: jnp.ndarray) -> jnp.ndarray:
    """Shift (R, B) one lane right: out[:, b] = a[:, b-1]; out[:, 0] = fill."""
    return jnp.concatenate([fill_col[:, None], a[:, :-1]], axis=1)


def chunk_body_batchminor(
    runner,
    key: jax.Array,
    conv_carry: CArray,
    num_syms: int,
    return_symbols: bool = False,
    snr_db: Optional[jnp.ndarray] = None,
    sqrt_power: Optional[jnp.ndarray] = None,
    measured_power: Optional[jnp.ndarray] = None,
    axis_name: Optional[str] = None,
) -> Tuple[dict, CArray]:
    """Fixed-mode chunk in (time, batch) layout; mirrors LinkRunner.chunk_body."""
    s = runner.setup
    cfg = s.cfg
    n = cfg.num_subcarriers
    L = s.prefix_length
    K = len(s.taps)
    B = num_syms
    const = s.const

    if snr_db is None:
        snr_db = jnp.float32(cfg.snr_db)
    if sqrt_power is None:
        sqrt_power = jnp.asarray(np.sqrt(s.power_allocation), jnp.float32)

    taps = cplx.from_complex(s.taps)
    h_freq_col = cplx.from_complex(s.h_freq[:, None])  # (N, 1) broadcast over lanes

    kbits, knoise = jax.random.split(key)

    # --- TX: indices -> symbols, (N, B) ------------------------------------
    tx_idx = prng.uniform_indices(kbits, (n, B), np.uint32(const.order - 1))
    symbols = mp.encode_indices_planar(tx_idx, const)
    if cfg.apply_power_allocation:
        symbols = cplx.scale(symbols, sqrt_power[:, None])

    # --- modulate -------------------------------------------------------------
    if cfg.modulation_type == ModulationType.OFDM:
        x = _dft_apply_T(symbols, n, inverse=True)
    else:  # SC-FDE: symbols are already time domain
        x = symbols
    if L > 0 and cfg.prefix_type == PrefixType.CYCLIC:
        blocks = cplx.concat([x[n - L :, :], x], axis=0)  # (N+L, B)
    elif L > 0 and cfg.prefix_type == PrefixType.ZERO:
        blocks = CArray(
            jnp.pad(x.re, ((0, L), (0, 0))), jnp.pad(x.im, ((0, L), (0, 0)))
        )
    else:
        blocks = x
    T = n + L

    papr_peak, papr_sum, papr_count = mt.papr_stats(blocks)

    # --- channel: stream convolution along sublanes + lane-shifted ISI --------
    # Full per-symbol convolution y_full (T+K-1, B) via unrolled shifts.
    if K == 1:
        y = taps[0] * blocks
        new_carry = cplx.zeros((0,), blocks)
    else:
        y_full = cplx.zeros((T + K - 1, B), blocks)
        for k in range(K):
            y_full = cplx.at_add(y_full, (slice(k, k + T), slice(None)), taps[k] * blocks)
        body = y_full[:T, :]
        tail = y_full[T:, :]  # (K-1, B): spill into the NEXT symbol (lane b+1)
        heads = CArray(
            _shift_lane(tail.re, conv_carry.re), _shift_lane(tail.im, conv_carry.im)
        )
        y = cplx.at_add(body, (slice(0, K - 1), slice(None)), heads)
        new_carry = tail[:, -1]  # last symbol's tail -> next chunk

    # --- AWGN -------------------------------------------------------------------
    if cfg.noise_type == NoiseType.AWGN:
        power = measured_power
        if power is None:
            power = cplx.mean_abs2(y)
            if axis_name is not None:
                power = jax.lax.pmean(power, axis_name)
        snr_linear = 10.0 ** (snr_db / 10.0)
        sigma = jnp.sqrt(power / snr_linear / 2.0)
        z0, z1 = prng.normal_planes(knoise, y.shape)
        y = y + CArray(sigma * z0, sigma * z1)

    # --- RX ------------------------------------------------------------------------
    if L > 0 and cfg.prefix_type == PrefixType.CYCLIC:
        rx = y[L:, :]
    elif L > 0 and cfg.prefix_type == PrefixType.ZERO:
        rx = cplx.at_add(y[:n, :], (slice(0, L), slice(None)), y[n:, :])
    else:
        rx = y
    freq = _dft_apply_T(rx, n, inverse=False)

    # Equalize (per-subcarrier rows broadcast over lanes).
    method = cfg.equalization_method
    if method == EqualizationMethod.ZF:
        is_zero = (h_freq_col.re == 0) & (h_freq_col.im == 0)
        h = cplx.where(
            is_zero,
            CArray(jnp.full_like(h_freq_col.re, _EPS), jnp.zeros_like(h_freq_col.im)),
            h_freq_col,
        )
        eqd = freq / h
    elif method == EqualizationMethod.MMSE:
        snr_linear = 10.0 ** (snr_db / 10.0)
        channel_gain = jnp.mean(h_freq_col.abs2())
        # Per-OFDM-symbol (= per-lane) signal power: mean over subcarriers.
        signal_power = jnp.mean(freq.abs2(), axis=0, keepdims=True)  # (1, B)
        noise_variance = signal_power / snr_linear / channel_gain
        gain = 1.0 / (h_freq_col.abs2() + noise_variance)  # (N, B)
        eqd = freq * cplx.scale(h_freq_col.conj(), gain)
    else:
        eqd = freq

    data = _dft_apply_T(eqd, n, inverse=True) if (
        cfg.modulation_type == ModulationType.SC_OFDM
    ) else eqd

    if cfg.normalize_before_demap:
        avg = cplx.mean_abs2(data)
        data = cplx.where(avg > 1e-10, data / jnp.sqrt(avg), data)

    rx_idx = mp.decode_hard_planar(data, const)

    stats = {
        "bit_errors": mt.index_bit_errors(tx_idx, rx_idx, const.bits_per_symbol),
        "symbol_errors": mt.symbol_errors(tx_idx, rx_idx),
        "papr_peak": papr_peak,
        "papr_sum": papr_sum,
        "papr_count": jnp.asarray(papr_count, jnp.float32),
    }
    if return_symbols:
        # Serial order = symbol-major: transpose back to (B, N) then flatten.
        stats["received_symbols"] = CArray(data.re.T, data.im.T).reshape(-1)
    return stats, new_carry
