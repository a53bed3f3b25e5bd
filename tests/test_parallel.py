"""Mesh / sharded-sweep tests on the forced 8-device CPU mesh (SURVEY §4.3c)."""

import jax
import jax.numpy as jnp
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


def test_sharded_selects_pallas_kernel():
    """The fused Pallas kernel runs under shard_map (VERDICT r1 item 1).

    Mosaic interpret mode on a 4-device CPU mesh (this 4-core host deadlocks
    running 8 concurrent emulator shard bodies; 4 exercises the same
    shard_map + psum + kernel plumbing): zeroed emulator PRNG makes every
    shard transmit index-0 symbols, so with noise off the linear chain must
    decode exactly (0 errors) *through the sharded path*, and the results
    dict must record the pallas hot path.
    """
    from ofdm_tpu.config import NoiseType

    cfg = _cfg(
        num_symbols=64 * 4 * 1024,  # 1024 OFDM symbols per device = 1 tile
        constellation_order=64,
        channel_model="Lin-Phoong_P2",
        noise_type=NoiseType.NONE,
        equalization_method=EqualizationMethod.ZF,
        engine="planar",
        hotpath="pallas",
        matmul_passes=3,
    )
    runner = ShardedLinkRunner(pl.prepare(cfg), mesh=make_mesh(num_devices=4))
    runner._interpret = True
    r = runner.run(jax.random.PRNGKey(0))
    assert r["hotpath_used"] == "pallas"
    assert r["matmul_passes_used"] == 3
    assert r["bit_errors"] == 0
    assert r["symbol_errors"] == 0
    assert runner._pallas_chunk_multiple() == 4 * 1024


def test_sharded_pallas_scan_inside_shard_map():
    """Multi-chunk fused-kernel runs scan INSIDE shard_map (collectives per run).

    Exercises `_build_shard_pallas_scan`: 2 chunks of 1 tile per device on a
    4-device interpret-mode mesh.  Zeroed emulator PRNG + noise off means the
    linear chain must decode exactly through the scanned sharded path, and
    the per-chunk stacked counters must still sum correctly on the host.
    """
    from ofdm_tpu.config import NoiseType

    cfg = _cfg(
        num_symbols=64 * 4 * 2048,  # 2048 OFDM symbols/device = 2 chunks
        symbols_per_chunk=64 * 4 * 1024,
        constellation_order=64,
        channel_model="Lin-Phoong_P2",
        noise_type=NoiseType.NONE,
        equalization_method=EqualizationMethod.ZF,
        engine="planar",
        hotpath="pallas",
        matmul_passes=3,
    )
    runner = ShardedLinkRunner(pl.prepare(cfg), mesh=make_mesh(num_devices=4))
    runner._interpret = True
    r = runner.run(jax.random.PRNGKey(0))
    assert r["hotpath_used"] == "pallas"
    assert r["bit_errors"] == 0
    assert r["symbol_errors"] == 0
    assert r["total_bits"] == cfg.num_symbols * 6


def test_sharded_rejects_indivisible_batch():
    cfg = _cfg(num_symbols=64 * 801)  # 801 OFDM symbols, not divisible by 8
    with pytest.raises(ValueError, match="not divisible"):
        ShardedLinkRunner(pl.prepare(cfg), mesh=make_mesh()).run(jax.random.PRNGKey(0))


def _random_planar_blocks(rng, b, t):
    from ofdm_tpu.ops.cplx import CArray

    return CArray(
        jnp.asarray(rng.normal(size=(b, t)), jnp.float32),
        jnp.asarray(rng.normal(size=(b, t)), jnp.float32),
    )


def test_halo_matmul_conv_bitexact_vs_unsharded():
    """ppermute halo stream conv == unsharded conv, bit-for-bit (VERDICT r1 item 5)."""
    from functools import partial

    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    from ofdm_tpu.models import channels as chm
    from ofdm_tpu.ops import linops
    from ofdm_tpu.ops.cplx import CArray
    from ofdm_tpu.parallel import halo
    from ofdm_tpu.parallel.mesh import MC_AXIS

    taps = chm.normalize_impulse_response(chm.get_channel("default_multipath"))
    T = 24
    t0m, t1m = linops.conv_matrices(taps, T)
    t0 = (jnp.asarray(t0m.real, jnp.float32), jnp.asarray(t0m.imag, jnp.float32))
    t1 = (jnp.asarray(t1m.real, jnp.float32), jnp.asarray(t1m.imag, jnp.float32))

    rng = np.random.default_rng(11)
    blocks = _random_planar_blocks(rng, 8 * 5, T)  # 5 blocks per shard
    carry = _random_planar_blocks(rng, 1, T)[0]  # nonzero previous-chunk row

    want, want_carry = linops.convolve(blocks, t0, t1, carry)

    mesh = make_mesh()
    fn = jax.jit(shard_map(
        lambda b, c: halo.convolve_stream_sharded(b, t0, t1, c, MC_AXIS),
        mesh=mesh,
        in_specs=(CArray(P(MC_AXIS), P(MC_AXIS)), CArray(P(), P())),
        out_specs=(CArray(P(MC_AXIS), P(MC_AXIS)), CArray(P(), P())),
    ))
    got, got_carry = fn(blocks, carry)

    np.testing.assert_array_equal(np.asarray(got.re), np.asarray(want.re))
    np.testing.assert_array_equal(np.asarray(got.im), np.asarray(want.im))
    np.testing.assert_array_equal(np.asarray(got_carry.re), np.asarray(want_carry.re))
    np.testing.assert_array_equal(np.asarray(got_carry.im), np.asarray(want_carry.im))


def test_halo_taps_conv_bitexact_vs_unsharded():
    from functools import partial

    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    from ofdm_tpu.models import channels as chm
    from ofdm_tpu.ops import channel as ch
    from ofdm_tpu.ops import cplx
    from ofdm_tpu.ops.cplx import CArray
    from ofdm_tpu.parallel import halo
    from ofdm_tpu.parallel.mesh import MC_AXIS

    taps = cplx.from_complex(
        chm.normalize_impulse_response(chm.get_channel("severe_multipath"))
    )
    K = taps.shape[0]
    rng = np.random.default_rng(5)
    blocks = _random_planar_blocks(rng, 8 * 3, 32)
    carry = _random_planar_blocks(rng, 1, K - 1)[0]

    # jit the reference too: XLA's elementwise fusion (FMA contraction) must
    # match on both sides for a bit-exact comparison.
    want, want_carry = jax.jit(lambda b, c: ch.convolve_blocks(b, taps, c))(blocks, carry)

    mesh = make_mesh()
    fn = jax.jit(shard_map(
        lambda b, c: halo.convolve_taps_sharded(b, taps, c, MC_AXIS),
        mesh=mesh,
        in_specs=(CArray(P(MC_AXIS), P(MC_AXIS)), CArray(P(), P())),
        out_specs=(CArray(P(MC_AXIS), P(MC_AXIS)), CArray(P(), P())),
    ))
    got, got_carry = fn(blocks, carry)

    np.testing.assert_array_equal(np.asarray(got.re), np.asarray(want.re))
    np.testing.assert_array_equal(np.asarray(got.im), np.asarray(want.im))
    np.testing.assert_array_equal(np.asarray(got_carry.re), np.asarray(want_carry.re))
    np.testing.assert_array_equal(np.asarray(got_carry.im), np.asarray(want_carry.im))


def test_halo_runner_end_to_end():
    """stream_mode="halo": contiguous-stream sharded run works end to end."""
    from ofdm_tpu.config import NoiseType

    cfg = _cfg(engine="planar", noise_type=NoiseType.NONE,
               equalization_method=EqualizationMethod.ZF)
    runner = ShardedLinkRunner(pl.prepare(cfg), mesh=make_mesh(), stream_mode="halo")
    r = runner.run(jax.random.PRNGKey(0))
    assert r["hotpath_used"] == "xla"  # halo mode never claims the fused kernel
    assert r["bit_error_rate"] == 0.0  # noise off, CP+ZF: exact recovery
    # Chunked halo run: the replicated global carry round-trips chunks.
    cfg2 = _cfg(engine="planar", symbols_per_chunk=64 * 2)
    r2 = ShardedLinkRunner(pl.prepare(cfg2), mesh=make_mesh(), stream_mode="halo").run(
        jax.random.PRNGKey(1)
    )
    assert 0.0 <= r2["bit_error_rate"] < 0.05


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


def test_carry_probe_matches_kernel_carry():
    """pallas_link.make_carry_probe reproduces the chunk kernel's carry OUT
    bitwise — the property that lets halo sharding exchange the halo row
    BEFORE the chunk kernels run (round 4)."""
    from ofdm_tpu.config import NoiseType
    from ofdm_tpu.ops import pallas_link

    for kw in (
        # mm (CP short guard, packed lanes at 64 sc)
        dict(prefix_length_ratio=0.5, noise_type=NoiseType.NONE,
             equalization_method=EqualizationMethod.ZF),
        # ZP 3-matmul chain
        dict(prefix_type=PrefixType.ZERO, prefix_length_ratio=1.0),
        # adaptive QAM (order rows enter the probe's encode)
        dict(prefix_length_ratio=0.5,
             power_allocation_type=PowerAllocationType.WATERFILLING,
             adaptive_modulation_mode=AdaptiveModulationMode.CAPACITY_BASED),
    ):
        cfg = _cfg(engine="planar", hotpath="pallas", matmul_passes=3,
                   num_symbols=64 * 1024, symbols_per_chunk=1024, **kw)
        runner = pl.LinkRunner(pl.prepare(cfg))
        runner._interpret = True
        lifted = pallas_link.make_pallas_chunk_lifted(runner, 1024, interpret=True)
        assert lifted is not None, kw
        fn, consts, spec = lifted
        assert spec.conv != "diag", kw
        probe = pallas_link.make_carry_probe(runner, 1024, interpret=True)
        assert probe is not None, kw
        pfn, pconsts = probe
        key = jax.random.PRNGKey(3)
        sp = jnp.ones(64, jnp.float32)
        _, carry = fn(key, runner._init_carry(), jnp.float32(18.0), sp, consts)
        probed = pfn(key, sp, pconsts)
        np.testing.assert_array_equal(np.asarray(carry.re), np.asarray(probed.re))
        np.testing.assert_array_equal(np.asarray(carry.im), np.asarray(probed.im))


def test_halo_fused_kernel_matches_chained_emulation():
    """stream_mode="halo" now keeps the fused kernel: the sharded run's
    counters equal a single-device emulation of the shard-major stream
    (kernel chunks chained shard-by-shard with the same fold_in keys) —
    the kernel-path analog of the XLA halo bit-exactness tests."""
    from ofdm_tpu.config import NoiseType
    from ofdm_tpu.ops import pallas_link
    from ofdm_tpu.parallel.mesh import make_mesh

    # 4-device submesh: the interpret-mode kernel blocks a host thread per
    # concurrent shard, and more virtual devices than physical cores wedge
    # the CPU client's pool (same bound as __graft_entry__.dryrun_multichip).
    ndev = 4
    n_ofdm = 1024 * ndev  # one global chunk: 1024 per shard (= the grid tile)
    cfg = _cfg(engine="planar", hotpath="pallas", matmul_passes=3,
               prefix_length_ratio=0.5, noise_type=NoiseType.NONE,
               equalization_method=EqualizationMethod.MMSE, snr_db=8.0,
               num_symbols=64 * n_ofdm)
    runner = ShardedLinkRunner(
        pl.prepare(cfg), mesh=make_mesh(num_devices=ndev), stream_mode="halo"
    )
    runner._interpret = True
    lifted = runner._shard_lifted(n_ofdm)
    assert lifted is not None, "halo mode must keep the fused kernel here"
    fn, consts, spec, local, probe = lifted
    assert probe is not None and spec.conv == "mm" and local == 1024
    r = runner.run(jax.random.PRNGKey(5))
    assert r["hotpath_used"] == "pallas"

    # Single-device emulation of the same shard-major stream.
    key = jax.random.PRNGKey(5)
    carry = pl.LinkRunner(pl.prepare(cfg))._init_carry()  # unsharded (T,) zeros
    be = se = 0
    for chunk_i in range(1):
        for d in range(ndev):
            k = jax.random.fold_in(jax.random.fold_in(key, chunk_i), d)
            stats, carry = fn(k, carry, jnp.float32(8.0), jnp.ones(64, jnp.float32), consts)
            be += int(stats["bit_errors"])
            se += int(stats["symbol_errors"])
    assert r["bit_errors"] == be
    assert r["symbol_errors"] == se


def test_halo_diag_keeps_fused_kernel_probeless():
    """ISI-free (diag) links keep the fused kernel under halo sharding with
    NO probe/exchange (round 5): the carry is vestigial (no ISI path
    consumes it), so the independent wiring is bit-identical to the
    chained contiguous stream — pinned here as exact count equality
    between halo and independent mode on the same key."""
    from ofdm_tpu.config import NoiseType
    from ofdm_tpu.parallel.mesh import make_mesh
    from ofdm_tpu.ops import pallas_link

    ndev = 4
    cfg = _cfg(engine="planar", hotpath="pallas", matmul_passes=3,
               noise_type=NoiseType.NONE, snr_db=8.0,
               equalization_method=EqualizationMethod.MMSE,
               num_symbols=64 * 1024 * ndev)
    mesh = make_mesh(num_devices=ndev)
    halo = ShardedLinkRunner(pl.prepare(cfg), mesh=mesh, stream_mode="halo")
    halo._interpret = True
    assert pallas_link.supports(halo, interpret=True)
    lifted = halo._shard_lifted(1024 * ndev)
    assert lifted is not None
    _, _, spec, _, probe = lifted
    assert spec.conv == "diag" and probe is None
    indep = ShardedLinkRunner(pl.prepare(cfg), mesh=mesh)
    indep._interpret = True
    rh = halo.run(jax.random.PRNGKey(6))
    ri = indep.run(jax.random.PRNGKey(6))
    assert rh["hotpath_used"] == "pallas"
    assert rh["bit_errors"] == ri["bit_errors"]
    assert rh["symbol_errors"] == ri["symbol_errors"]


def test_halo_fixed_grid_one_dispatch():
    """run_grid in halo mode: the whole fixed-mode SNR sweep runs in one
    shard_map dispatch with the probe->ppermute->kernel chunk wiring, and
    every point equals the looped halo run bit-exactly (also covers the
    (consts, probe_consts) in_specs wiring of `_grid_scan`)."""
    from ofdm_tpu.config import NoiseType
    from ofdm_tpu.parallel.mesh import make_mesh

    ndev = 4
    cfg = _cfg(engine="planar", hotpath="pallas", matmul_passes=3,
               prefix_length_ratio=0.5, noise_type=NoiseType.NONE,
               equalization_method=EqualizationMethod.MMSE,
               num_symbols=64 * 1024 * ndev)
    runner = ShardedLinkRunner(
        pl.prepare(cfg), mesh=make_mesh(num_devices=ndev), stream_mode="halo"
    )
    runner._interpret = True
    key = jax.random.PRNGKey(7)
    snrs = [6.0, 12.0]
    grid = runner.run_grid(key, snrs)
    for p, (g, snr) in enumerate(zip(grid, snrs)):
        assert g["hotpath_used"] == "pallas"
        loop = runner.run(jax.random.fold_in(key, p), snr_db=snr)
        assert g["bit_errors"] == loop["bit_errors"], (p, g["bit_errors"], loop["bit_errors"])
        assert g["symbol_errors"] == loop["symbol_errors"]


def test_sharded_collect_symbols_bitwise_dump():
    """Sharded run(collect_symbols=...) on the fused path renders BITWISE
    counted symbols (VERDICT r4 item 7): each shard's chunk-0 tile-0 dump
    plane gathers along the shard axis.  Halo mode makes the check
    shard-resolving even under the emulator's zeroed PRNG: shard 0 sees
    the zero initial carry while shards d>0 consume probe rows, so their
    planes differ — a wrong gather order or carry wiring cannot pass.
    SC-FDE is used because its constant index-0 TIME plane has a nonzero
    tail (an OFDM constant spectrum's IDFT is impulse-like — tail lanes
    exactly zero — which would make the carry invisible)."""
    from ofdm_tpu.config import ModulationType, NoiseType
    from ofdm_tpu.ops import pallas_link
    from ofdm_tpu.parallel.mesh import make_mesh

    ndev = 4
    cfg = _cfg(engine="planar", hotpath="pallas", matmul_passes=3,
               constellation_order=4, modulation_type=ModulationType.SC_OFDM,
               prefix_length_ratio=0.34, noise_type=NoiseType.NONE,
               equalization_method=EqualizationMethod.ZF, snr_db=8.0,
               num_symbols=64 * 1024 * ndev)
    runner = ShardedLinkRunner(
        pl.prepare(cfg), mesh=make_mesh(num_devices=ndev), stream_mode="halo"
    )
    runner._interpret = True
    key = jax.random.PRNGKey(11)
    res = runner.run(key, collect_symbols=ndev * 1024 * 64)
    assert res["hotpath_used"] == "pallas"
    got = np.asarray(res["received_symbols"])
    assert got.shape == (ndev * 1024 * 64,)

    # Per-shard emulation of the same capture: shard d's key is
    # fold_in(fold_in(key, chunk=0), d); its carry is the left neighbor's
    # probe row (shard 0: the zero initial carry) — _halo_kernel_step.
    fn, consts, _spec = pallas_link.make_pallas_dump_lifted(
        runner, 1024, interpret=True
    )
    pfn, pconsts = pallas_link.make_carry_probe(runner, 1024, interpret=True)
    zero_carry = pl.LinkRunner(pl.prepare(cfg))._init_carry()
    sp = jnp.ones(64, jnp.float32)
    key0 = jax.random.fold_in(key, 0)
    parts = []
    for d in range(ndev):
        k = jax.random.fold_in(key0, d)
        carry = (
            zero_carry if d == 0
            else pfn(jax.random.fold_in(key0, d - 1), sp, pconsts)
        )
        stats, _ = fn(k, carry, jnp.float32(8.0), sp, consts)
        sym = stats["received_symbols"]
        parts.append(np.asarray(sym.re) + 1j * np.asarray(sym.im))
    want = np.concatenate(parts)
    np.testing.assert_array_equal(got, want)
    # Shard-resolving: the zero-carry plane differs from the probe-carry one.
    assert not np.array_equal(parts[0], parts[1])


def test_halo_adaptive_grid_matches_looped():
    """run_grid_multi in halo mode: per-point probe consts (adaptive order
    rows) ride the stacked-consts tree, so the adaptive sweep keeps both
    the one-dispatch grid AND the halo fused kernel — bit-exact vs looped
    sharded halo runs."""
    from ofdm_tpu.config import NoiseType
    from ofdm_tpu.parallel.mesh import make_mesh
    from ofdm_tpu.pipeline import run_grid_multi

    ndev = 4
    mesh = make_mesh(num_devices=ndev)
    key = jax.random.PRNGKey(8)
    snrs = [15.0, 20.0]
    runners = []
    for snr in snrs:
        cfg = _cfg(
            engine="planar", hotpath="pallas", matmul_passes=3,
            prefix_length_ratio=0.5, noise_type=NoiseType.NONE,
            num_symbols=1024 * ndev, num_bits=None, snr_db=snr,
            power_allocation_type=PowerAllocationType.WATERFILLING,
            adaptive_modulation_mode=AdaptiveModulationMode.CAPACITY_BASED,
        )
        r = ShardedLinkRunner(pl.prepare(cfg), mesh=mesh, stream_mode="halo")
        r._interpret = True
        runners.append(r)
    # The lift must carry (consts, probe_consts) — i.e. not fall back.
    lift = runners[0]._grid_multi_lift(1024 * ndev)
    assert lift is not None and isinstance(lift[1], tuple) and len(lift[1]) == 2
    grid = run_grid_multi(runners, key, snrs)
    for p, (g, r) in enumerate(zip(grid, runners)):
        assert g["hotpath_used"] == "pallas"
        loop = r.run(jax.random.fold_in(key, p))
        assert g["bit_errors"] == loop["bit_errors"], p
        assert g["symbol_errors"] == loop["symbol_errors"], p
