"""Cross-axis configuration fuzz: random strategy combinations must run.

The enum-dispatch sweep (test_reference_depth.py) varies one axis at a
time; this module samples random *combinations* of every strategy axis
(mirrors the reference's factory-dict wiring, simulation/models.py:73-103)
and asserts each prepared link runs end to end with a sane results dict —
no trace errors, no NaNs, no schema drift across the config space.
"""

import jax
import numpy as np
import pytest

from ofdm_tpu.config import (
    AdaptiveModulationMode,
    ChannelType,
    ConstellationType,
    EqualizationMethod,
    ModulationType,
    NoiseType,
    PowerAllocationType,
    PrefixType,
    SimulationConfig,
)
from ofdm_tpu import pipeline as pl

CHANNELS = [
    "flat_fading", "two_ray", "default_multipath", "Lin-Phoong_P1",
    "Lin-Phoong_P2", "rayleigh_fading", "severe_multipath",
]
REQUIRED_KEYS = (
    "bit_errors", "symbol_errors", "total_bits", "bit_error_rate",
    "symbol_error_rate", "papr_db", "allocated_power", "received_symbols",
    "constellation_plot", "transmission_time_ms", "bitrate_mbps",
    "title", "subtitle", "snr_db",
)


def _random_cfg(rng: np.random.RandomState) -> SimulationConfig:
    n = int(rng.choice([8, 16, 32, 64]))
    adaptive = rng.rand() < 0.25
    ctype = ConstellationType.QAM if (adaptive or rng.rand() < 0.5) else ConstellationType.PSK
    if ctype is ConstellationType.QAM:
        order = int(rng.choice([4, 16, 64, 256]))
    else:
        order = int(rng.choice([2, 4, 8, 16]))
    kw = dict(
        num_subcarriers=n,
        constellation_order=order,
        constellation_type=ctype,
        modulation_type=ModulationType(rng.choice(["OFDM", "SC-OFDM"])),
        prefix_type=PrefixType(rng.choice(["CYCLIC", "ZERO", "NONE"])),
        prefix_length_ratio=float(rng.choice([0.34, 0.68, 1.0, 1.34, 2.0])),
        equalization_method=EqualizationMethod(rng.choice(["ZF", "MMSE", "NONE"])),
        noise_type=NoiseType(rng.choice(["AWGN", "NONE"])),
        channel_type=ChannelType.CUSTOM,
        channel_model=str(rng.choice(CHANNELS)),
        power_allocation_type=PowerAllocationType(
            rng.choice(["UNIFORM", "WATERFILLING"])
        ),
        snr_db=float(rng.choice([5.0, 15.0, 25.0, 35.0])),
        hotpath=str(rng.choice(["matmul", "auto", "generic"])),
    )
    if adaptive:
        kw.update(
            adaptive_modulation_mode=AdaptiveModulationMode.CAPACITY_BASED,
            power_allocation_type=PowerAllocationType.WATERFILLING,
            num_symbols=24,  # OFDM symbols in adaptive mode
            num_bits=None,
        )
    else:
        # num_bits XOR num_symbols, both meanings exercised
        if rng.rand() < 0.5:
            bps = int(np.log2(order))
            kw.update(num_bits=bps * n * 24, num_symbols=None)
        else:
            kw.update(num_symbols=n * 24, num_bits=None)  # QAM symbols
    return SimulationConfig(**kw)


@pytest.mark.parametrize("seed", range(24))
def test_random_config_combination_runs(seed):
    rng = np.random.RandomState(1000 + seed)
    cfg = _random_cfg(rng)
    try:
        setup = pl.prepare(cfg)
    except ValueError as e:
        # Validator rejections on a random draw are legitimate (e.g. an
        # adaptive point whose gap function zeroes every subcarrier).
        pytest.skip(f"validator rejected draw: {e}")
    r = pl.LinkRunner(setup).run(jax.random.PRNGKey(seed), collect_symbols=64)
    for k in REQUIRED_KEYS:
        assert k in r, f"missing results key {k} for {cfg}"
    assert 0.0 <= r["bit_error_rate"] <= 0.75
    assert 0.0 <= r["symbol_error_rate"] <= 1.0
    assert np.isfinite(r["papr_db"])
    assert r["total_bits"] > 0
    # np.isfinite on complex checks both components.
    assert np.all(np.isfinite(np.asarray(r["received_symbols"])))
    # error accounting is self-consistent
    assert r["bit_errors"] <= r["total_bits"]
    np.testing.assert_allclose(
        r["bit_error_rate"], r["bit_errors"] / r["total_bits"], rtol=1e-12
    )


def test_noiseless_fuzz_points_are_exact():
    """Any noiseless + equalized random combination must decode exactly
    (the reference's deterministic-channel contract).

    Runs at matmul_passes=3 (the f32-grade bf16x3 split): noiseless ZF on
    a deep-faded channel divides the single-pass bf16 matmul perturbation
    (~6e-3) by tiny |H[k]|, so exactness is a property of the
    correctness-grade numeric mode — the same mode the parity claims are
    validated on (docs/PERFORMANCE.md, matmul_passes gate)."""
    import dataclasses

    rng = np.random.RandomState(77)
    ran = 0
    for _ in range(40):
        cfg = dataclasses.replace(_random_cfg(rng), matmul_passes=3)
        if cfg.noise_type is not NoiseType.NONE:
            continue
        if cfg.equalization_method is EqualizationMethod.NONE:
            continue
        if cfg.equalization_method is EqualizationMethod.MMSE and cfg.snr_db < 25:
            # MMSE biases symbols by |H|^2/(|H|^2+sigma^2) with sigma^2 from
            # its *assumed* SNR (reference equalization/models.py:39-63), so a
            # noiseless low-snr_db MMSE link errors by design; exactness is a
            # ZF / high-SNR-MMSE contract (the reference's own
            # test_equalize_high_snr_approaches_zf).
            continue
        if cfg.prefix_type is PrefixType.NONE:
            continue  # residual ISI is physical (CP absorbs it)
        if cfg.prefix_length_ratio < 1.0:
            continue  # short guard leaves residual ISI by design
        try:
            setup = pl.prepare(cfg)
        except ValueError:
            continue
        r = pl.LinkRunner(setup).run(jax.random.PRNGKey(ran))
        assert r["bit_error_rate"] < 0.01, (cfg, r["bit_error_rate"])
        ran += 1
        if ran >= 6:
            break
    assert ran >= 3  # the filter must leave real coverage
