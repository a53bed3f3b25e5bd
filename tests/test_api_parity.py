"""API-completeness tests: framing, coding options, capacity order helper."""

import jax.numpy as jnp
import numpy as np
import pytest

from ofdm_tpu.ops import adaptive as ad
from ofdm_tpu.ops import cplx
from ofdm_tpu.ops import framing
from ofdm_tpu.ops import mapping as mp

from conftest import has_reference


def test_framing_round_trip():
    x = jnp.arange(12, dtype=jnp.float32)
    p = framing.to_parallel(x, 4)
    assert p.shape == (3, 4)
    np.testing.assert_array_equal(np.asarray(framing.to_serial(p)), np.asarray(x))
    c = cplx.from_complex(np.arange(12).astype(np.complex128))
    pc = framing.to_parallel(c, 3)
    assert pc.shape == (4, 3)


def test_framing_validation():
    with pytest.raises(ValueError):
        framing.to_parallel(jnp.zeros((2, 2)), 2)
    with pytest.raises(ValueError):
        framing.to_parallel(jnp.zeros(10), 3)
    with pytest.raises(ValueError):
        framing.to_parallel(jnp.zeros(10), 0)
    with pytest.raises(ValueError):
        framing.to_serial(jnp.zeros(10))


def test_calculate_requirements():
    orders = np.array([4, 16, 64, 0], dtype=np.int64)
    total, bits = ad.calculate_requirements(orders, 1000)
    assert total == (2 + 4 + 6 + 0) * 1000 == 12000
    np.testing.assert_array_equal(bits, [2, 4, 6, 0])


@pytest.mark.skipif(not has_reference(), reason="reference tree not mounted")
def test_calculate_constellation_orders_matches_reference():
    from ofdm_based_systems.constellation.adaptive import calculate_constellation_orders
    from ofdm_based_systems.constellation.models import (
        PSKConstellationMapper,
        QAMConstellationMapper,
    )

    capacity = np.array([8.5, 6.2, 3.1, 1.5, 0.2, -0.5, 12.0])
    for scaling in (1.0, 0.85):
        ref_q = calculate_constellation_orders(capacity, 4, 256, scaling, QAMConstellationMapper)
        np.testing.assert_array_equal(
            ad.calculate_constellation_orders(capacity, 4, 256, scaling, "QAM"), ref_q
        )
        ref_p = calculate_constellation_orders(capacity, 4, 256, scaling, PSKConstellationMapper)
        np.testing.assert_array_equal(
            ad.calculate_constellation_orders(capacity, 4, 256, scaling, "PSK"), ref_p
        )


@pytest.mark.skipif(not has_reference(), reason="reference tree not mounted")
@pytest.mark.parametrize("kind,order", [("QAM", 16), ("PSK", 8)])
def test_natural_binary_coding_matches_reference(kind, order):
    from ofdm_based_systems.constellation.models import (
        NoWordCoder,
        PSKConstellationMapper,
        QAMConstellationMapper,
    )

    cls = QAMConstellationMapper if kind == "QAM" else PSKConstellationMapper
    ref = cls(order=order, word_coder=NoWordCoder)
    ours = mp.make_constellation(kind, order, coding="none")
    np.testing.assert_allclose(ours.table, ref.constellation, atol=1e-12)


@pytest.mark.parametrize("kind,order", [("QAM", 16), ("QAM", 64), ("PSK", 8)])
def test_natural_binary_round_trip_and_planar(kind, order):
    const = mp.make_constellation(kind, order, coding="none")
    idx = jnp.arange(order, dtype=jnp.int32)
    # Planar arithmetic encode matches the table.
    pts = cplx.to_numpy(mp.encode_indices_planar(idx, const))
    np.testing.assert_allclose(pts, const.table, atol=1e-6)
    # Noisy decode agrees between slicer paths.
    rng = np.random.RandomState(0)
    sym_idx = rng.randint(0, order, 2048)
    noisy = const.table[sym_idx] + 0.05 * (rng.randn(2048) + 1j * rng.randn(2048))
    a = np.asarray(mp.decode_hard(jnp.asarray(noisy, jnp.complex64), const))
    b = np.asarray(mp.decode_hard_planar(cplx.from_complex(noisy), const))
    np.testing.assert_array_equal(a, b)
    nn = np.asarray(mp.decode_nn(jnp.asarray(noisy, jnp.complex64), const))
    np.testing.assert_array_equal(a, nn)
