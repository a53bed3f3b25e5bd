"""Metrics tests: error counters, PAPR, binomial confidence intervals."""

import jax.numpy as jnp
import numpy as np

from ofdm_tpu.ops import cplx
from ofdm_tpu.ops import metrics as mt


def test_bit_and_symbol_errors():
    tx = jnp.asarray([0, 1, 1, 0], jnp.uint8)
    rx = jnp.asarray([0, 1, 0, 1], jnp.uint8)
    assert int(mt.bit_errors(tx, rx)) == 2
    assert int(mt.symbol_errors(tx, rx)) == 2


def test_index_bit_errors_popcount():
    tx = jnp.asarray([[0b101010, 0b000000]], jnp.int32)
    rx = jnp.asarray([[0b101001, 0b111111]], jnp.int32)
    # xor = 0b000011 (2 bits) and 0b111111 (6 bits)
    assert int(mt.index_bit_errors(tx, rx, 6)) == 8


def test_index_bit_errors_equals_bitwise_comparison():
    rng = np.random.RandomState(0)
    b = 6
    tx = rng.randint(0, 64, size=(100, 64))
    rx = rng.randint(0, 64, size=(100, 64))
    expected = sum(
        bin(int(a) ^ int(c)).count("1") for a, c in zip(tx.reshape(-1), rx.reshape(-1))
    )
    got = int(mt.index_bit_errors(jnp.asarray(tx, jnp.int32), jnp.asarray(rx, jnp.int32), b))
    assert got == expected


def test_papr():
    sig = jnp.asarray(np.array([1.0, 1.0, 2.0, 0.0]), jnp.complex64)
    peak, total, count = mt.papr_stats(sig)
    # powers: 1,1,4,0 -> peak 4, mean 1.5 -> 10log10(8/3)
    assert mt.papr_db(float(peak), float(total), int(count)) == \
        np.float64(10 * np.log10(4 / 1.5))
    # planar path
    peak2, total2, count2 = mt.papr_stats(cplx.from_complex(np.array([1.0, 2.0j])))
    assert float(peak2) == 4.0


def test_wilson_interval_properties():
    lo, hi = mt.ber_confidence_interval(19, 1000)
    assert lo < 0.019 < hi
    # Shrinks with more data.
    lo2, hi2 = mt.ber_confidence_interval(1900, 100000)
    assert (hi2 - lo2) < (hi - lo)
    # Zero errors still gives a sensible upper bound.
    lo3, hi3 = mt.ber_confidence_interval(0, 10000)
    assert lo3 == 0.0 and 0 < hi3 < 0.001
    assert mt.ber_confidence_interval(0, 0) == (0.0, 1.0)


def test_ber_equivalent():
    assert mt.ber_equivalent(190, 10000, 200, 10000)
    assert not mt.ber_equivalent(100, 10000, 500, 10000)


def test_device_stat_accumulator_exactness():
    """pipeline._acc_add/_acc_totals: the int32 lo/hi counter split is
    EXACT for totals far past 2^31, and the Kahan-compensated PAPR sum
    tracks the f64 reference at f32-ulp scale."""
    import jax
    import jax.numpy as jnp

    from ofdm_tpu.pipeline import _acc_add, _acc_init, _acc_totals

    rng = np.random.default_rng(5)
    n_chunks = 400
    # Counts near the int32 per-chunk ceiling: totals reach ~4e11 >> 2^31.
    be = rng.integers(0, 2**31 - 1, size=n_chunks, dtype=np.int64)
    se = rng.integers(0, 2**31 - 1, size=n_chunks, dtype=np.int64)
    ps = rng.uniform(0.0, 1e6, size=n_chunks).astype(np.float32)
    pc = rng.uniform(0.0, 2**24, size=n_chunks).astype(np.float32)

    def fold(acc, xs):
        stats = {
            "bit_errors": xs[0].astype(jnp.int32),
            "symbol_errors": xs[1].astype(jnp.int32),
            "papr_peak": xs[2],
            "papr_sum": xs[2],
            "papr_count": xs[3],
        }
        return _acc_add(acc, stats), None

    acc, _ = jax.lax.scan(
        fold,
        _acc_init(),
        (
            jnp.asarray(be, jnp.int32),
            jnp.asarray(se, jnp.int32),
            jnp.asarray(ps),
            jnp.asarray(pc),
        ),
    )
    got_be, got_se, got_peak, got_sum, got_count = _acc_totals(acc)
    assert got_be == int(be.sum())  # exact despite >2^31 total
    assert got_se == int(se.sum())
    assert got_peak == float(np.max(ps))
    np.testing.assert_allclose(got_sum, float(np.sum(ps, dtype=np.float64)), rtol=1e-6)
    np.testing.assert_allclose(
        got_count, float(np.sum(pc, dtype=np.float64)), rtol=1e-6
    )


def test_acc_single_transfer_fetch_matches_totals():
    """_acc_fetch/_stats_fetch (one packed device->host transfer) must equal
    _acc_totals exactly — int counters travel bitcast, Kahan terms intact."""
    import jax.numpy as jnp

    from ofdm_tpu.pipeline import (
        _acc_add, _acc_fetch, _acc_init, _acc_totals, _stats_fetch,
    )

    stats = {
        "bit_errors": jnp.int32(2**30 + 12345),
        "symbol_errors": jnp.int32(2**24 + 7),
        "papr_peak": jnp.float32(8.25),
        "papr_sum": jnp.float32(3.5e8),
        "papr_count": jnp.float32(1 << 22),
    }
    acc = _acc_init()
    for _ in range(3):
        acc = _acc_add(acc, stats)
    assert _acc_fetch(acc) == _acc_totals(acc)
    want = (2**30 + 12345, 2**24 + 7, 8.25, 3.5e8, 1 << 22)
    assert _stats_fetch(stats) == want
