"""Equalizer + power-allocation tests, incl. exact reference parity.

Mirrors reference themes: ZF perfect inversion & eps-guard, MMSE noise-variance
formula, MMSE -> ZF at high SNR (equalization tests :330), waterfilling budget
conservation / constant water level / favors-good-channels
(tests/integration/test_power_allocation.py).
"""

import jax.numpy as jnp
import numpy as np
import pytest

from ofdm_tpu.config import EqualizationMethod
from ofdm_tpu.ops import allocate as al
from ofdm_tpu.ops import equalize as eq

from conftest import has_reference


def _h(n, seed=0):
    rng = np.random.RandomState(seed)
    return rng.randn(n) + 1j * rng.randn(n)


def test_zf_perfect_inversion():
    h = jnp.asarray(_h(16))
    x = jnp.asarray(_h(16, 1))
    rx = x * h
    np.testing.assert_allclose(np.asarray(eq.zero_forcing(rx, h)), np.asarray(x), atol=1e-10)


def test_zf_epsilon_guard_at_zero():
    h = jnp.asarray(np.array([0.0 + 0.0j, 1.0 + 0.0j]))
    rx = jnp.asarray(np.array([1.0 + 0.0j, 1.0 + 0.0j]))
    out = np.asarray(eq.zero_forcing(rx, h))
    np.testing.assert_allclose(out[0], 1e10, rtol=1e-6)  # 1 / 1e-10
    np.testing.assert_allclose(out[1], 1.0)


@pytest.mark.skipif(not has_reference(), reason="reference tree not mounted")
def test_mmse_matches_reference_per_row():
    from ofdm_based_systems.equalization.models import MMSEEqualizator

    rng = np.random.RandomState(2)
    n = 32
    h = _h(n, 3)
    snr_db = 17.0
    rows = rng.randn(5, n) + 1j * rng.randn(5, n)

    ref_eq = MMSEEqualizator(channel_frequency_response=h, snr_db=snr_db)
    expected = np.array([ref_eq.equalize(r) for r in rows])

    ours = eq.mmse(jnp.asarray(rows), jnp.asarray(h), snr_db)
    np.testing.assert_allclose(np.asarray(ours), expected, rtol=1e-6)


def test_mmse_approaches_zf_at_high_snr():
    h = jnp.asarray(_h(16, 4))
    rx = jnp.asarray(_h(16, 5))[None, :] * h
    zf_out = np.asarray(eq.zero_forcing(rx, h))
    mmse_out = np.asarray(eq.mmse(rx, h, 120.0))
    np.testing.assert_allclose(mmse_out, zf_out, rtol=1e-4)


def test_equalize_dispatch_none():
    rx = jnp.asarray(_h(8))
    assert eq.equalize(rx, rx, EqualizationMethod.NONE, 10.0) is rx


# ---------------------------------------------------------------------------
# Power allocation
# ---------------------------------------------------------------------------


def test_uniform_allocation():
    p = al.uniform(2.0, 8)
    np.testing.assert_allclose(p, 0.25)
    with pytest.raises(ValueError):
        al.uniform(-1.0, 8)
    with pytest.raises(ValueError):
        al.uniform(1.0, 0)


@pytest.mark.skipif(not has_reference(), reason="reference tree not mounted")
def test_waterfilling_matches_reference_exactly():
    from ofdm_based_systems.power_allocation.models import WaterfillingPowerAllocation

    rng = np.random.RandomState(7)
    for trial in range(5):
        gains = np.abs(rng.randn(64)) ** 2 + 1e-3
        noise = 10 ** (-rng.uniform(0, 3))
        total = float(rng.uniform(0.5, 64))
        ref = WaterfillingPowerAllocation(total, gains, noise).allocate()
        ours = al.waterfilling(total, gains, noise)
        np.testing.assert_allclose(ours, ref, rtol=0, atol=0)  # bit-identical


def test_waterfilling_properties():
    gains = np.array([4.0, 2.0, 1.0, 0.5, 0.1])
    p = al.waterfilling(1.0, gains, 0.1)
    # Exact budget.
    np.testing.assert_allclose(p.sum(), 1.0, atol=1e-12)
    # Favors good channels.
    assert np.all(np.diff(p) <= 1e-12)
    # Non-negative.
    assert np.all(p >= 0)
    # Constant water level over active subcarriers (floor has the 1/N factor,
    # power_allocation/models.py:161).
    floor = 0.1 / (gains * len(gains))
    lvl = (p + floor)[p > 1e-10]
    assert np.std(lvl) < 1e-6


def test_waterfilling_equal_gains_is_uniform():
    p = al.waterfilling(1.0, np.full(16, 2.0), 0.05)
    np.testing.assert_allclose(p, 1.0 / 16, atol=1e-9)


def test_waterfilling_jax_matches_host():
    rng = np.random.RandomState(11)
    gains = np.abs(rng.randn(32)) ** 2 + 1e-2
    host = al.waterfilling(4.0, gains, 0.01)
    dev = np.asarray(al.waterfilling_jax(4.0, jnp.asarray(gains), 0.01))
    np.testing.assert_allclose(dev, host, atol=2e-4)


def test_waterfilling_jax_vmappable():
    import jax

    rng = np.random.RandomState(12)
    gains = jnp.asarray(np.abs(rng.randn(8, 16)) ** 2 + 1e-2)
    batched = jax.vmap(lambda g: al.waterfilling_jax(1.0, g, 0.1))(gains)
    assert batched.shape == (8, 16)
    np.testing.assert_allclose(np.asarray(batched.sum(-1)), 1.0, atol=1e-5)


def test_capacity_and_compare():
    gains = np.array([4.0, 2.0, 1.0, 0.5])
    noise = 0.1
    u = al.uniform(1.0, 4)
    w = al.waterfilling(1.0, gains, noise)
    res = al.compare_allocations(u, w, gains, noise)
    assert res["waterfilling_capacity"] >= res["uniform_capacity"]
    assert res["capacity_gain_percent"] >= 0


def test_published_waterfilling_demo_numbers():
    """Pin the reference's published waterfilling demo (BASELINE.md rows 6-7).

    Reference WATERFILLING_IMPLEMENTATION_SUMMARY.md:89-104 records, for the
    16-subcarrier 4-tap-multipath demo at 20 dB / P_total=1.0:
    uniform capacity 47.0731 bits/use, waterfilling capacity 47.3134
    (+0.51%), water level mu=0.077658 with std~0.

    Provenance established here: the 47.3134 figure comes from the PRE-quirk
    waterfilling floor ``noise/gains`` (no xN factor).  The current reference
    code divides the floor by len(gains) too
    (/root/reference/src/ofdm_based_systems/power_allocation/models.py:161),
    which this framework replicates bit-exactly; under that floor the same
    demo yields 47.1021.  Uniform capacity and the reported water level are
    floor-independent (all 16 subcarriers allocated -> mean(P + noise/gains)
    does not depend on how the unit budget is distributed) and match the
    published values exactly.
    """
    h = np.array([1.0, 0.7, 0.4, 0.2])  # generate_channel_models.py default_multipath
    gains = np.abs(np.fft.fft(h, 16)) ** 2
    noise = 10 ** (-20 / 10)
    u = al.uniform(1.0, 16)
    assert round(al.capacity(u, gains, noise), 4) == 47.0731
    w = al.waterfilling(1.0, gains, noise)
    assert round(al.capacity(w, gains, noise), 4) == 47.1021  # current-code floor
    assert round(al.water_level(w, gains, noise), 6) == 0.077658
    # std ~ 0: the water level is flat across allocated subcarriers.
    floor = noise / (gains * len(gains))
    lvl = (w + floor)[w > 1e-10]
    assert np.std(lvl) < 1e-6
    # Published 47.3134 reproduced with the pre-quirk floor noise/gains:
    pre_floor = noise / gains
    lo, hi = 0.0, 1.0 + pre_floor.max()
    for _ in range(100):
        mu = (lo + hi) / 2
        tot = np.maximum(0.0, mu - pre_floor).sum()
        if abs(tot - 1.0) < 1e-8:
            break
        lo, hi = (lo, mu) if tot > 1.0 else (mu, hi)
    p_pre = np.maximum(0.0, mu - pre_floor)
    p_pre *= 1.0 / p_pre.sum()
    assert round(al.capacity(p_pre, gains, noise), 4) == 47.3134


@pytest.mark.skipif(not has_reference(), reason="reference tree not mounted")
def test_water_level_reporting_matches_reference():
    """Water-level formula from simulation/models.py:310-313."""
    gains = np.abs(_h(64, 13)) ** 2 + 1e-3
    noise = 10 ** (-20 / 10)
    p = al.waterfilling(64.0, gains, noise)
    lvl = al.water_level(p, gains, noise)
    floor = noise / gains
    expected = float(np.mean((p + floor)[p > 1e-10]))
    assert lvl == expected
