"""Channel transmission: stream FIR convolution over batched blocks + AWGN.

The reference convolves the *entire serial sample stream* with the channel
impulse response and truncates to the input length (channel/models.py:46-62),
so block k's first ``order`` samples depend on block k-1's tail — inter-block
ISI is physically modeled and absorbed by the guard interval.

TPU-native equivalent (SURVEY §2.11 item 5, §7.2 step 3): convolve each block
row independently (the tap loop is unrolled at trace time — channels here are
a handful of taps, so this is a fused VPU elementwise pipeline, not a matmul),
then add each row's convolution tail into the head of the next row.  A
``carry`` threads the tail across scan chunks / shard halos so the result is
*bit-identical* to the unsharded stream convolution.

AWGN (noise/models.py:13-22): the noise power is derived from the *measured
post-channel signal power*, noise = sqrt(P_n/2) * (N(0,1) + 1j N(0,1)).
The reference measures power over the whole stream; under chunked execution
we measure per chunk (statistically identical for >=10^4 samples; exact when
symbols_per_chunk=0).  Multi-device sweeps psum the power estimate first so
every shard uses the global measurement.

All ops are generic over native complex arrays and planar CArray.  On the
planar path Gaussian noise comes from a Box-Muller transform over raw PRNG
bits (the target TPU backend lacks the normal-sampling lowering).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ofdm_tpu.ops import cplx
from ofdm_tpu.ops.cplx import CArray, Complexish


def convolve_blocks(
    blocks: Complexish,
    taps: Complexish,
    carry: Optional[Complexish] = None,
) -> Tuple[Complexish, Complexish]:
    """Stream-convolve ``blocks`` (B, T) with ``taps`` (K,), K-1 <= T.

    Returns ``(out, new_carry)`` where ``out`` equals
    ``np.convolve(concat(prev_stream, blocks.ravel()), taps, "full")`` restricted
    to this chunk's sample positions, and ``new_carry`` is the (K-1,) tail to
    feed into the next chunk.  ``carry=None`` means stream start (zeros).
    """
    B, T = blocks.shape
    K = taps.shape[0]
    if K - 1 > T:
        raise ValueError(f"Channel order {K - 1} exceeds block length {T}.")
    # Match tap dtype to the signal: f64 host taps scattered into a c64
    # stream otherwise trip JAX's unsafe-cast scatter FutureWarning.
    if not isinstance(taps, CArray) and not isinstance(blocks, CArray):
        taps = jnp.asarray(taps, dtype=jnp.asarray(blocks).dtype)

    if K == 1:
        out = taps[0] * blocks
        return out, cplx.zeros((0,), blocks)

    # Full per-row convolution via trace-time-unrolled shifted accumulation:
    # y_full[b, n] = sum_k taps[k] * blocks[b, n - k],   n in [0, T + K - 2].
    y_full = cplx.zeros((B, T + K - 1), blocks)
    for k in range(K):
        y_full = cplx.at_add(y_full, (slice(None), slice(k, k + T)), taps[k] * blocks)

    body = y_full[:, :T]
    tail = y_full[:, T:]  # (B, K-1): spill into the next row

    if carry is None:
        carry = cplx.zeros((K - 1,), blocks)
    heads = cplx.concat([carry[None, :], tail[:-1]], axis=0)  # (B, K-1)
    out = cplx.at_add(body, (slice(None), slice(0, K - 1)), heads)
    return out, tail[-1]


def _standard_normal_pair(key: jax.Array, shape) -> CArray:
    """Two iid N(0,1) planes as a CArray (hardware PRNG kernel on TPU)."""
    from ofdm_tpu.ops import prng

    z0, z1 = prng.normal_planes(key, shape)
    return CArray(z0, z1)


def awgn(
    key: jax.Array,
    signal: Complexish,
    snr_db: float,
    measured_power: Optional[jnp.ndarray] = None,
    axis_name: Optional[str] = None,
) -> Complexish:
    """Add complex AWGN scaled off the measured signal power.

    ``measured_power`` overrides the local estimate (colored-noise
    experiments).  ``axis_name`` pmean-reduces the power estimate over a mesh
    axis so every shard of a sharded sweep uses the *global* measurement —
    matching the reference's whole-stream semantics (noise/models.py:14-16).
    """
    if measured_power is None:
        measured_power = cplx.mean_abs2(signal)
        if axis_name is not None:
            measured_power = jax.lax.pmean(measured_power, axis_name)
    snr_linear = 10.0 ** (jnp.asarray(snr_db, jnp.float32) / 10.0)
    noise_power = measured_power / snr_linear

    if isinstance(signal, CArray):
        sigma = jnp.sqrt(noise_power / 2.0).astype(signal.re.dtype)
        z = _standard_normal_pair(key, signal.shape)
        return signal + CArray(sigma * z.re, sigma * z.im)

    kr, ki = jax.random.split(key)
    real_dtype = jnp.real(signal).dtype
    sigma = jnp.sqrt(noise_power / 2.0).astype(real_dtype)
    noise = sigma * (
        jax.random.normal(kr, signal.shape, real_dtype)
        + 1j * jax.random.normal(ki, signal.shape, real_dtype)
    )
    return signal + noise


def transmit(
    key: jax.Array,
    blocks: Complexish,
    taps: Complexish,
    snr_db: float,
    add_noise: bool = True,
    carry: Optional[Complexish] = None,
    measured_power: Optional[jnp.ndarray] = None,
    axis_name: Optional[str] = None,
) -> Tuple[Complexish, Complexish]:
    """Channel transmit = stream convolution + (optional) AWGN.

    ``taps`` must already be unit-energy normalized
    (ofdm_tpu.models.channels.normalize_impulse_response), matching
    ChannelModel's constructor semantics (channel/models.py:37-44).
    """
    convolved, new_carry = convolve_blocks(blocks, taps, carry)
    if add_noise:
        convolved = awgn(key, convolved, snr_db, measured_power, axis_name)
    return convolved, new_carry
