"""Adaptive-mapper tests: vectorized encode/decode vs the reference's loops.

Mirrors tests/integration/test_adaptive_modulation.py themes plus exact
encode/decode parity against the reference AdaptiveConstellationMapper.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from ofdm_tpu.ops import adaptive as ad
from ofdm_tpu.ops import mapping as mp

from conftest import has_reference

ORDERS = np.array([4, 16, 64, 0, 16, 4, 256, 0], dtype=np.int64)


def test_mapper_construction():
    m = ad.make_adaptive_mapper("QAM", ORDERS)
    np.testing.assert_array_equal(m.bits_per_subcarrier, [2, 4, 6, 0, 4, 2, 8, 0])
    assert m.bits_per_ofdm_symbol == 26
    assert m.max_bits == 8
    assert m.name == "Adaptive-4-to-256-QAM"
    assert ad.make_adaptive_mapper("QAM", np.array([16, 16])).name == "16-QAM"


def test_all_zero_orders_raises():
    with pytest.raises(ValueError):
        ad.make_adaptive_mapper("QAM", np.zeros(4, dtype=np.int64))


def test_encode_decode_round_trip():
    m = ad.make_adaptive_mapper("QAM", ORDERS)
    rng = np.random.RandomState(0)
    bits = jnp.asarray(rng.randint(0, 2, size=(32, m.bits_per_ofdm_symbol)), jnp.uint8)
    syms, idx = ad.encode(bits, m)
    assert syms.shape == (32, 8)
    # Inactive subcarriers transmit zero.
    np.testing.assert_allclose(np.asarray(syms[:, [3, 7]]), 0)
    out_bits, out_idx = ad.decode(syms, m)
    np.testing.assert_array_equal(np.asarray(out_bits), np.asarray(bits))
    np.testing.assert_array_equal(np.asarray(out_idx), np.asarray(idx))


def test_encode_uses_per_subcarrier_tables():
    m = ad.make_adaptive_mapper("QAM", ORDERS)
    rng = np.random.RandomState(1)
    bits = jnp.asarray(rng.randint(0, 2, size=(8, m.bits_per_ofdm_symbol)), jnp.uint8)
    syms, idx = ad.encode(bits, m, dtype=jnp.complex128)
    offsets = np.concatenate([[0], np.cumsum(m.bits_per_subcarrier)[:-1]])
    for k, order in enumerate(ORDERS):
        if order == 0:
            continue
        const = mp.make_constellation("QAM", int(order))
        b = const.bits_per_symbol
        sub_bits = np.asarray(bits)[:, offsets[k] : offsets[k] + b]
        expect_idx = sub_bits.dot(1 << np.arange(b - 1, -1, -1))
        np.testing.assert_array_equal(np.asarray(idx[:, k]), expect_idx)
        np.testing.assert_allclose(
            np.asarray(syms[:, k]), const.table[expect_idx], atol=1e-12
        )


@pytest.mark.skipif(not has_reference(), reason="reference tree not mounted")
def test_matches_reference_adaptive_mapper():
    from ofdm_based_systems.constellation.adaptive import AdaptiveConstellationMapper
    from ofdm_based_systems.constellation.models import QAMConstellationMapper

    ref = AdaptiveConstellationMapper(
        constellation_orders=ORDERS,
        base_mapper_class=QAMConstellationMapper,
        num_subcarriers=len(ORDERS),
    )
    m = ad.make_adaptive_mapper("QAM", ORDERS)
    np.testing.assert_array_equal(ref.get_bits_per_subcarrier(), m.bits_per_subcarrier)
    assert ref.constellation_name == m.name
    np.testing.assert_allclose(ref.constellation, m.composite_constellation, atol=1e-12)

    rng = np.random.RandomState(2)
    nsym = 4
    bits = rng.randint(0, 2, size=nsym * m.bits_per_ofdm_symbol).astype(np.uint8)
    ref_syms = ref.encode(list(bits.tolist()))
    ours_syms, _ = ad.encode(
        jnp.asarray(bits).reshape(nsym, -1), m, dtype=jnp.complex128
    )
    np.testing.assert_allclose(np.asarray(ours_syms).reshape(-1), ref_syms, atol=1e-12)

    # Decode noisy symbols identically.
    noisy = ref_syms + 0.02 * (rng.randn(len(ref_syms)) + 1j * rng.randn(len(ref_syms)))
    ref_stream = ref.decode(noisy)
    raw = np.frombuffer(ref_stream.read(), dtype=np.uint8)
    ref_bits = np.unpackbits(raw)[: len(bits)]
    ours_bits, _ = ad.decode(jnp.asarray(noisy).reshape(nsym, -1), m)
    np.testing.assert_array_equal(np.asarray(ours_bits).reshape(-1), ref_bits)


def test_psk_adaptive():
    orders = np.array([2, 4, 8, 0], dtype=np.int64)
    m = ad.make_adaptive_mapper("PSK", orders)
    rng = np.random.RandomState(3)
    bits = jnp.asarray(rng.randint(0, 2, size=(16, m.bits_per_ofdm_symbol)), jnp.uint8)
    syms, _ = ad.encode(bits, m)
    out_bits, _ = ad.decode(syms, m)
    np.testing.assert_array_equal(np.asarray(out_bits), np.asarray(bits))
