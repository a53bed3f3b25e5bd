"""Whole-grid single-dispatch sweep (LinkRunner.run_grid / run_sweep(grid=)).

The reference sweeps SNR points with a sequential host loop
(main.py:234-248); on a remote-relay TPU backend each dispatch costs
~140 ms, so the TPU-native form scans the SNR axis *inside* the compiled
executable (SNR and the waterfilling sqrt-power rows are already traced
arguments).  These tests pin the grid's contract: bit-identical counters to
the looped form it replaces, on the XLA path, the fused Pallas path
(interpret mode), and the sharded runner on a CPU mesh.
"""

import jax
import numpy as np

from ofdm_tpu import pipeline as pl
from ofdm_tpu.config import (
    ChannelType,
    EqualizationMethod,
    NoiseType,
    PowerAllocationType,
    PrefixType,
    SimulationConfig,
)
from ofdm_tpu.parallel import ShardedLinkRunner, make_mesh, run_sweep


def _cfg(**kw):
    base = dict(
        num_symbols=64 * 96,
        num_subcarriers=64,
        constellation_order=16,
        channel_type=ChannelType.CUSTOM,
        channel_model="Lin-Phoong_P1",
        prefix_type=PrefixType.CYCLIC,
        prefix_length_ratio=1.0,
        equalization_method=EqualizationMethod.MMSE,
        snr_db=20.0,
        noise_type=NoiseType.AWGN,
        engine="planar",
        hotpath="matmul",
    )
    base.update(kw)
    return SimulationConfig(**base)


def _assert_point_equal(g, l):
    assert g["bit_errors"] == l["bit_errors"]
    assert g["symbol_errors"] == l["symbol_errors"]
    assert abs(g["papr_db"] - l["papr_db"]) < 1e-9
    assert g["snr_db"] == l["snr_db"]
    assert g["allocated_power"] == l["allocated_power"]


def test_grid_xla_bitexact_vs_looped():
    """Grid == host loop of run() with fold_in(key, offset+p) point keys,
    including a remainder chunk continuing each point's conv carry."""
    runner = pl.LinkRunner(pl.prepare(_cfg(symbols_per_chunk=40)))  # 2 full + rem 16
    key = jax.random.PRNGKey(7)
    snrs = [10.0, 20.0, 30.0]
    grid = runner.run_grid(key, snrs, key_offset=5)
    loop = [
        runner.run(jax.random.fold_in(key, 5 + p), snr_db=s)
        for p, s in enumerate(snrs)
    ]
    assert grid[0]["bit_errors"] > 0  # the comparison is non-trivial
    for g, l in zip(grid, loop):
        _assert_point_equal(g, l)
        assert g["grid_points"] == 3


def test_grid_waterfilling_per_point_power():
    """Waterfilling recomputes the allocation per SNR point; the grid passes
    per-point sqrt-power rows as scan inputs and must match the loop."""
    runner = pl.LinkRunner(
        pl.prepare(_cfg(power_allocation_type=PowerAllocationType.WATERFILLING))
    )
    key = jax.random.PRNGKey(3)
    snrs = [5.0, 25.0]
    grid = runner.run_grid(key, snrs)
    loop = [
        runner.run(jax.random.fold_in(key, p), snr_db=s)
        for p, s in enumerate(snrs)
    ]
    for g, l in zip(grid, loop):
        _assert_point_equal(g, l)
    # the two points genuinely used different allocations
    assert grid[0]["allocated_power"] != grid[1]["allocated_power"]


def test_grid_pallas_kernel_selected():
    """The grid executable keeps the fused Pallas hot path (interpret mode:
    zeroed emulator PRNG + no noise decodes exactly through the kernel)."""
    cfg = _cfg(
        num_symbols=64 * 2048,
        constellation_order=64,
        channel_model="Lin-Phoong_P2",
        noise_type=NoiseType.NONE,
        equalization_method=EqualizationMethod.ZF,
        hotpath="pallas",
        matmul_passes=3,
    )
    runner = pl.LinkRunner(pl.prepare(cfg))
    runner._interpret = True
    grid = runner.run_grid(jax.random.PRNGKey(0), [10.0, 30.0])
    for g in grid:
        assert g["hotpath_used"] == "pallas"
        assert g["bit_errors"] == 0
        assert g["symbol_errors"] == 0
        assert g["grid_points"] == 2


def test_sharded_grid_bitexact_vs_looped_sharded():
    """ShardedLinkRunner.run_grid == looped sharded runs on a CPU mesh
    (fused kernel in interpret mode, one shard_map dispatch for the grid)."""
    cfg = _cfg(
        num_symbols=64 * 4 * 1024,  # 1024 OFDM symbols per device = 1 tile
        constellation_order=64,
        channel_model="Lin-Phoong_P2",
        noise_type=NoiseType.NONE,
        equalization_method=EqualizationMethod.ZF,
        hotpath="pallas",
        matmul_passes=3,
    )
    mesh = make_mesh(num_devices=4)
    runner = ShardedLinkRunner(pl.prepare(cfg), mesh=mesh)
    runner._interpret = True
    key = jax.random.PRNGKey(1)
    snrs = [15.0, 30.0]
    grid = runner.run_grid(key, snrs)
    loop = [
        runner.run(jax.random.fold_in(key, p), snr_db=s)
        for p, s in enumerate(snrs)
    ]
    for g, l in zip(grid, loop):
        _assert_point_equal(g, l)
        assert g["hotpath_used"] == "pallas"


def test_run_sweep_grid_matches_looped():
    """run_sweep(grid=True) is bit-identical to run_sweep(grid=False) —
    the grid uses the same fold_in(key, point_index) streams."""
    cfg = _cfg(symbols_per_chunk=48)
    key = jax.random.PRNGKey(11)
    snrs = [10.0, 20.0]
    channels = ["Lin-Phoong_P1", "two_ray"]
    a = run_sweep(cfg, snrs=snrs, channels=channels, key=key, sharded=False, grid=True)
    b = run_sweep(cfg, snrs=snrs, channels=channels, key=key, sharded=False, grid=False)
    assert len(a) == len(b) == 4
    for g, l in zip(a, b):
        _assert_point_equal(g, l)
        assert g["channel_model"] == l["channel_model"]


def _adaptive_runner(snr, runner_cls=pl.LinkRunner, mesh=None):
    from ofdm_tpu.config import AdaptiveModulationMode

    cfg = SimulationConfig(
        num_symbols=1024 * (4 if mesh is not None else 1),
        num_subcarriers=64,
        constellation_order=16,
        channel_type=ChannelType.CUSTOM,
        channel_model="default_multipath",
        prefix_type=PrefixType.CYCLIC,
        prefix_length_ratio=1.0,
        equalization_method=EqualizationMethod.MMSE,
        power_allocation_type=PowerAllocationType.WATERFILLING,
        adaptive_modulation_mode=AdaptiveModulationMode.CAPACITY_BASED,
        snr_db=snr,
        engine="planar",
        hotpath="pallas",
        matmul_passes=3,
        noise_type=NoiseType.NONE,
    )
    r = (
        runner_cls(pl.prepare(cfg), mesh=mesh)
        if mesh is not None
        else runner_cls(pl.prepare(cfg))
    )
    r._interpret = True
    return r


def test_adaptive_grid_multi_bitexact_vs_looped():
    """run_grid_multi == host loop of per-point adaptive runs.

    The per-point kernel consts (SNR-dependent order/equalizer rows) travel
    as stacked scan inputs; PAPR is deterministic in interpret mode and
    differs between the points' bit loadings, so equality per point proves
    each point's consts reached the kernel (not a broadcast mixup)."""
    snrs = [15.0, 20.0]
    runners = [_adaptive_runner(s) for s in snrs]
    key = jax.random.PRNGKey(4)
    grid = pl.run_grid_multi(runners, key, snrs)
    assert grid is not None
    loop = [r.run(jax.random.fold_in(key, p)) for p, r in enumerate(runners)]
    for g, l in zip(grid, loop):
        _assert_point_equal(g, l)
        assert g["hotpath_used"] == "pallas"
        assert (
            g["constellation_order_per_subcarrier"]
            == l["constellation_order_per_subcarrier"]
        )
    assert grid[0]["papr_db"] != grid[1]["papr_db"]
    assert (
        grid[0]["constellation_order_per_subcarrier"]
        != grid[1]["constellation_order_per_subcarrier"]
    )


def test_adaptive_grid_multi_sharded():
    """Sharded adaptive multi-grid on a 4-device CPU mesh == looped sharded."""
    snrs = [15.0, 20.0]
    mesh = make_mesh(num_devices=4)
    runners = [
        _adaptive_runner(s, runner_cls=ShardedLinkRunner, mesh=mesh) for s in snrs
    ]
    key = jax.random.PRNGKey(9)
    grid = pl.run_grid_multi(runners, key, snrs)
    assert grid is not None
    loop = [r.run(jax.random.fold_in(key, p)) for p, r in enumerate(runners)]
    for g, l in zip(grid, loop):
        _assert_point_equal(g, l)
        assert g["hotpath_used"] == "pallas"


def test_grid_adaptive_raises():
    from ofdm_tpu.config import AdaptiveModulationMode, ConstellationType

    cfg = _cfg(
        adaptive_modulation_mode=AdaptiveModulationMode.CAPACITY_BASED,
        constellation_type=ConstellationType.QAM,
        num_symbols=None,
        num_bits=64 * 96 * 4,
    )
    runner = pl.LinkRunner(pl.prepare(cfg))
    try:
        runner.run_grid(jax.random.PRNGKey(0), [10.0, 20.0])
    except ValueError:
        return
    raise AssertionError("adaptive run_grid must raise")
