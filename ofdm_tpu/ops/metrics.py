"""Link metrics: BER/SER error counting, PAPR — as fused reductions.

Replaces the reference's Python-level ``sum(b1 != b2 for ...)`` over millions
of bits (simulation/models.py:596-608, SURVEY §2.11 item 7) with XOR+sum
reductions; under sharded sweeps the integer counters `psum` across devices.

SER semantics: the reference re-encodes the received bits and compares symbol
arrays (simulation/models.py:604-608).  Re-encoding is a deterministic map
from bit-words to points, so comparing transmitted vs received *table indices*
is exactly equivalent and avoids a second gather.

PAPR (simulation/models.py:519-524): 10*log10(max|x|^2 / mean|x|^2) over the
whole modulated (with-prefix) matrix; under chunking we carry the running
max / sum and finalize on host.
"""

from __future__ import annotations

import jax.numpy as jnp


def bit_errors(tx_bits: jnp.ndarray, rx_bits: jnp.ndarray) -> jnp.ndarray:
    """Count differing bits (uint8 arrays of any equal shape) -> int32 scalar.

    int32 is exact for chunks < 2^31 bits; the host driver accumulates chunk
    counts in Python integers (arbitrary precision), so total runs can exceed
    2^31 bits without overflow.
    """
    return jnp.sum((tx_bits != rx_bits).astype(jnp.int32))


def index_bit_errors(
    tx_idx: jnp.ndarray, rx_idx: jnp.ndarray, max_bits: int
) -> jnp.ndarray:
    """Bit errors between MSB-first index words: popcount(tx ^ rx), summed.

    The constellation index IS the bit word (mapping is index-transparent),
    so this equals the reference's per-bit comparison without materializing
    bit tensors.  Valid because both indices are < 2^b per position; the XOR
    then has no bits above position b-1, so a fixed ``max_bits`` unroll is
    exact even with per-position widths (adaptive mode).
    """
    x = tx_idx ^ rx_idx
    total = jnp.zeros((), jnp.int32)
    for j in range(max_bits):
        total = total + jnp.sum((x >> j) & 1, dtype=jnp.int32)
    return total


def symbol_errors(tx_idx: jnp.ndarray, rx_idx: jnp.ndarray) -> jnp.ndarray:
    """Count differing constellation indices -> int32 scalar (see bit_errors)."""
    return jnp.sum((tx_idx != rx_idx).astype(jnp.int32))


def papr_stats(signal):
    """Running PAPR ingredients for a chunk: (peak_power, power_sum, count)."""
    from ofdm_tpu.ops import cplx

    p = cplx.abs2(signal)
    return jnp.max(p), jnp.sum(p), p.size


def ber_confidence_interval(errors: int, total_bits: int, z: float = 1.96):
    """(low, high) Wilson score interval for a BER estimate.

    SURVEY §4.3(b): BER-curve statistical-equivalence tests should use
    binomial confidence intervals rather than ad-hoc |delta| thresholds.
    Wilson is well-behaved at the low error counts of high-SNR points.
    """
    import numpy as np

    if total_bits <= 0:
        return (0.0, 1.0)
    p = errors / total_bits
    n = total_bits
    denom = 1.0 + z * z / n
    center = (p + z * z / (2 * n)) / denom
    half = (z / denom) * np.sqrt(p * (1 - p) / n + z * z / (4 * n * n))
    return (max(0.0, center - half), min(1.0, center + half))


def ber_equivalent(
    errors_a: int, bits_a: int, errors_b: int, bits_b: int, z: float = 1.96
) -> bool:
    """True when two BER estimates' confidence intervals overlap."""
    lo_a, hi_a = ber_confidence_interval(errors_a, bits_a, z)
    lo_b, hi_b = ber_confidence_interval(errors_b, bits_b, z)
    return hi_a >= lo_b and hi_b >= lo_a


def papr_db(peak_power, power_sum, count) -> float:
    """Finalize PAPR in dB from accumulated stats."""
    import numpy as np

    avg = float(power_sum) / float(count)
    if avg <= 0:
        return float("inf")
    return 10.0 * float(np.log10(float(peak_power) / avg))
