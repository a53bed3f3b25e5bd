"""Constellation mapping tests: reference parity + TPU decode equivalence.

Mirrors the reference test themes (tests/ofdm_based_systems/constellation/
test_models.py: Gray round trips, unit average power, encode->decode round
trips for orders 4/16/64, noisy decode tolerance) and adds exact table parity
against the reference implementation when it is available (SURVEY §4.3 (a)).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ofdm_tpu.ops import mapping as mp

from conftest import has_reference

QAM_ORDERS = [4, 16, 64, 256, 1024, 4096]
PSK_ORDERS = [2, 4, 8, 16, 32]


# ---------------------------------------------------------------------------
# Gray code
# ---------------------------------------------------------------------------


def test_gray_code_round_trip():
    i = np.arange(4096)
    g = mp.gray_code(i)
    assert np.array_equal(mp.inverse_gray_code(g), i)
    # Adjacent Gray words differ in exactly one bit.
    diff = g[1:] ^ g[:-1]
    assert np.all(np.bitwise_count(diff.astype(np.uint64)) == 1)


# ---------------------------------------------------------------------------
# Table construction parity vs the reference implementation
# ---------------------------------------------------------------------------


@pytest.mark.skipif(not has_reference(), reason="reference tree not mounted")
@pytest.mark.parametrize("order", QAM_ORDERS[:4])
def test_qam_table_matches_reference(order):
    from ofdm_based_systems.constellation.models import QAMConstellationMapper

    ref = QAMConstellationMapper(order=order)
    ours = mp.qam_constellation(order)
    np.testing.assert_allclose(ours.table, ref.constellation, rtol=0, atol=1e-12)


@pytest.mark.skipif(not has_reference(), reason="reference tree not mounted")
@pytest.mark.parametrize("order", PSK_ORDERS)
def test_psk_table_matches_reference(order):
    from ofdm_based_systems.constellation.models import PSKConstellationMapper

    ref = PSKConstellationMapper(order=order)
    ours = mp.psk_constellation(order)
    np.testing.assert_allclose(ours.table, ref.constellation, rtol=0, atol=1e-12)


@pytest.mark.skipif(not has_reference(), reason="reference tree not mounted")
@pytest.mark.parametrize(
    "kind,order", [("QAM", 16), ("QAM", 64), ("PSK", 8)]
)
def test_encode_decode_matches_reference_bitstream(kind, order):
    """Full bits->symbols->bits parity against the reference mapper."""
    from io import BytesIO

    from ofdm_based_systems.constellation.models import (
        PSKConstellationMapper,
        QAMConstellationMapper,
    )

    cls = QAMConstellationMapper if kind == "QAM" else PSKConstellationMapper
    ref_mapper = cls(order=order)
    const = mp.make_constellation(kind, order)
    b = const.bits_per_symbol

    rng = np.random.RandomState(0)
    nbits = b * 256
    bits = rng.randint(0, 2, size=nbits).astype(np.uint8)

    # Reference encode expects a byte stream (MSB-first packed).
    assert nbits % 8 == 0
    packed = np.packbits(bits)
    ref_syms = ref_mapper.encode(BytesIO(packed.tobytes()))

    ours_syms = mp.encode(jnp.asarray(bits).reshape(-1, b), const, dtype=jnp.complex128)
    np.testing.assert_allclose(np.asarray(ours_syms), ref_syms, atol=1e-12)

    # Decode noisy symbols both ways; compare recovered bits.
    noisy = ref_syms + 0.05 * (rng.randn(len(ref_syms)) + 1j * rng.randn(len(ref_syms)))
    ref_bits_stream = ref_mapper.decode(noisy)
    ref_bits = np.unpackbits(np.frombuffer(ref_bits_stream.read(), dtype=np.uint8))[:nbits]

    ours_bits = mp.decode_bits(jnp.asarray(noisy), const).reshape(-1)
    np.testing.assert_array_equal(np.asarray(ours_bits), ref_bits)


# ---------------------------------------------------------------------------
# Self-contained properties
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("order", QAM_ORDERS)
def test_qam_unit_average_power(order):
    const = mp.qam_constellation(order)
    assert np.isclose(np.mean(np.abs(const.table) ** 2), 1.0, atol=1e-12)
    # All points distinct.
    assert len(np.unique(const.table)) == order


@pytest.mark.parametrize("order", PSK_ORDERS)
def test_psk_unit_amplitude_equal_spacing(order):
    const = mp.psk_constellation(order)
    np.testing.assert_allclose(np.abs(const.table), 1.0, atol=1e-12)
    angles = np.sort(np.angle(const.table))
    spacing = np.diff(angles)
    np.testing.assert_allclose(spacing, 2 * np.pi / order, atol=1e-9)


@pytest.mark.parametrize(
    "kind,order",
    [("QAM", 4), ("QAM", 16), ("QAM", 64), ("QAM", 256), ("PSK", 2), ("PSK", 8), ("PSK", 16)],
)
def test_encode_decode_round_trip(kind, order):
    const = mp.make_constellation(kind, order)
    b = const.bits_per_symbol
    key = jax.random.PRNGKey(0)
    bits = jax.random.randint(key, (512, b), 0, 2, dtype=jnp.uint8)
    syms = mp.encode(bits, const)
    out = mp.decode_bits(syms, const)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(bits))


@pytest.mark.parametrize(
    "kind,order",
    [("QAM", 4), ("QAM", 16), ("QAM", 64), ("QAM", 256), ("PSK", 2), ("PSK", 8), ("PSK", 32)],
)
def test_hard_slicer_equals_nn(kind, order):
    """The O(1) slicer and the O(M) NN argmin agree on noisy symbols."""
    const = mp.make_constellation(kind, order)
    rng = np.random.RandomState(1)
    idx = rng.randint(0, order, size=4096)
    noise = 0.3 * (rng.randn(4096) + 1j * rng.randn(4096))
    y = jnp.asarray(const.table[idx] + noise, jnp.complex64)
    nn = np.asarray(mp.decode_nn(y, const))
    hard = np.asarray(mp.decode_hard(y, const))
    # NN and slicer agree except at exact decision-boundary ties.
    agree = np.mean(nn == hard)
    assert agree == 1.0, f"slicer/NN disagreement rate {1-agree}"


def test_decode_nn_exact_points():
    const = mp.qam_constellation(16)
    y = jnp.asarray(const.table, jnp.complex64)
    idx = np.asarray(mp.decode_nn(y, const))
    np.testing.assert_array_equal(idx, np.arange(16))


def test_bits_indices_round_trip():
    idx = jnp.arange(64, dtype=jnp.int32)
    bits = mp.indices_to_bits(idx, 6)
    back = mp.bits_to_indices(bits, 6)
    np.testing.assert_array_equal(np.asarray(back), np.asarray(idx))


# ---------------------------------------------------------------------------
# Gap-function bit loading
# ---------------------------------------------------------------------------


@pytest.mark.skipif(not has_reference(), reason="reference tree not mounted")
def test_bit_loading_matches_reference():
    from ofdm_based_systems.constellation.models import (
        PSKConstellationMapper,
        QAMConstellationMapper,
    )

    snrs = np.array([0.0, 0.5, 1.0, 3.0, 10.0, 31.6, 100.0, 1000.0, 1e4, 1e5])
    for ser in (1e-2, 1e-3, 1e-5):
        ref_qam = np.array(
            [QAMConstellationMapper.calculate_bit_loading_order(ser, s) for s in snrs]
        )
        np.testing.assert_array_equal(mp.qam_bit_loading_orders(ser, snrs), ref_qam)
        ref_psk = np.array(
            [PSKConstellationMapper.calculate_bit_loading_order(ser, s) for s in snrs]
        )
        np.testing.assert_array_equal(mp.psk_bit_loading_orders(ser, snrs), ref_psk)


def test_qam_bit_loading_even_and_monotone():
    orders = mp.qam_bit_loading_orders(1e-3, np.logspace(-1, 5, 50))
    bits = np.where(orders > 0, np.log2(np.maximum(orders, 1)), 0)
    assert np.all(bits % 2 == 0)
    assert np.all(np.diff(orders) >= 0)
