"""Mesh / sharded-sweep tests on the forced 8-device CPU mesh (SURVEY §4.3c)."""

import jax
import numpy as np
import pytest

from ofdm_tpu.config import (
    AdaptiveModulationMode,
    ChannelType,
    ConstellationType,
    EqualizationMethod,
    PowerAllocationType,
    PrefixType,
    SimulationConfig,
)
from ofdm_tpu.parallel import ShardedLinkRunner, make_mesh, run_sweep
from ofdm_tpu import pipeline as pl


def _cfg(**kw):
    base = dict(
        num_symbols=64 * 800,
        num_subcarriers=64,
        constellation_order=16,
        constellation_type=ConstellationType.QAM,
        channel_type=ChannelType.CUSTOM,
        channel_model="default_multipath",
        prefix_type=PrefixType.CYCLIC,
        prefix_length_ratio=1.0,
        equalization_method=EqualizationMethod.MMSE,
        snr_db=18.0,
    )
    base.update(kw)
    return SimulationConfig(**base)


def test_mesh_uses_all_devices():
    mesh = make_mesh()
    assert mesh.devices.size == 8
    assert mesh.axis_names == ("mc",)


def test_sharded_matches_unsharded_statistically():
    cfg = _cfg()
    single = pl.LinkRunner(pl.prepare(cfg)).run(jax.random.PRNGKey(0))
    sharded = ShardedLinkRunner(pl.prepare(cfg), mesh=make_mesh()).run(
        jax.random.PRNGKey(0)
    )
    assert sharded["total_bits"] == single["total_bits"]
    assert abs(single["bit_error_rate"] - sharded["bit_error_rate"]) < 0.01
    assert abs(single["papr_db"] - sharded["papr_db"]) < 1.5


def test_sharded_planar_engine():
    cfg = _cfg(engine="planar")
    r = ShardedLinkRunner(pl.prepare(cfg), mesh=make_mesh()).run(jax.random.PRNGKey(1))
    assert 0.0 <= r["bit_error_rate"] < 0.05


def test_sharded_chunked_scan():
    cfg = _cfg(symbols_per_chunk=64 * 4)  # 200 chunks of 256, 32 per device
    r = ShardedLinkRunner(pl.prepare(cfg), mesh=make_mesh()).run(jax.random.PRNGKey(2))
    assert r["total_bits"] == cfg.num_symbols * 4
    assert 0.0 <= r["bit_error_rate"] < 0.05


def test_sharded_collect_symbols():
    cfg = _cfg()
    r = ShardedLinkRunner(pl.prepare(cfg), mesh=make_mesh()).run(
        jax.random.PRNGKey(3), collect_symbols=128
    )
    assert r["received_symbols"].shape == (128,)
    assert np.iscomplexobj(r["received_symbols"])


def test_sharded_rejects_indivisible_batch():
    cfg = _cfg(num_symbols=64 * 801)  # 801 OFDM symbols, not divisible by 8
    with pytest.raises(ValueError, match="not divisible"):
        ShardedLinkRunner(pl.prepare(cfg), mesh=make_mesh()).run(jax.random.PRNGKey(0))


def test_run_sweep_grid():
    cfg = _cfg(num_symbols=64 * 400)
    results = run_sweep(
        cfg,
        snrs=[5.0, 15.0, 25.0],
        channels=["default_multipath", "two_ray"],
        key=jax.random.PRNGKey(0),
    )
    assert len(results) == 6
    for ch in ("default_multipath", "two_ray"):
        bers = [r["bit_error_rate"] for r in results if r["channel_model"] == ch]
        assert bers[0] > bers[-1]  # improves with SNR
    assert all("wall_time_s" in r for r in results)


def test_run_sweep_adaptive_per_point():
    cfg = _cfg(
        num_symbols=None,
        num_bits=80_000,
        power_allocation_type=PowerAllocationType.WATERFILLING,
        adaptive_modulation_mode=AdaptiveModulationMode.CAPACITY_BASED,
    )
    results = run_sweep(cfg, snrs=[10.0, 20.0], sharded=False)
    assert len(results) == 2
    # Higher SNR loads more bits per OFDM symbol.
    o10 = np.array(results[0]["constellation_order_per_subcarrier"])
    o20 = np.array(results[1]["constellation_order_per_subcarrier"])
    assert o20.sum() > o10.sum()
