"""Round-5 wide-bench investigation (VERDICT r4 weak item 1).

Reproduces bench.py's wide diagnostic (1024 sc, 64-QAM, CP 1.0,
severe_multipath, MMSE, 30 dB) at two campaign sizes with per-rep walls,
plus the lr cell (1024 sc ZP-MMSE) — so the claimed 24.5M wide wall and
27.2M lr marginal are driver-witnessable or falsified.  The size pair
also yields a run-size-differenced marginal rate per cell.

Usage:  python tools/wide_bench_probe.py [reps]
"""

import sys
import time

import jax

sys.path.insert(0, "/root/repo")

from ofdm_tpu.config import (
    ChannelType,
    ConstellationType,
    EqualizationMethod,
    PrefixType,
    SimulationConfig,
)
from ofdm_tpu.pipeline import LinkRunner, prepare


def cfg_for(n_ofdm, prefix, ratio):
    return SimulationConfig(
        num_symbols=1024 * n_ofdm,
        num_subcarriers=1024,
        constellation_order=64,
        constellation_type=ConstellationType.QAM,
        channel_type=ChannelType.CUSTOM,
        channel_model="severe_multipath",
        prefix_type=prefix,
        prefix_length_ratio=ratio,
        equalization_method=EqualizationMethod.MMSE,
        snr_db=30.0,
        symbols_per_chunk=1 << 17,
    )


def run_cell(name, prefix, ratio, sizes, reps):
    key = jax.random.PRNGKey(0)
    runners = {sz: LinkRunner(prepare(cfg_for(sz, prefix, ratio))) for sz in sizes}
    t0 = time.perf_counter()
    runners[sizes[0]].run(key, snr_db=25.0)
    print(f"{name}: compile+first {time.perf_counter()-t0:.1f}s", flush=True)
    best_wall = {}
    for sz in sizes:
        r = runners[sz]
        walls = []
        for rep in range(reps):
            res = r.run(jax.random.fold_in(key, 100 + rep), snr_db=30.0)
            walls.append(res["transmission_time_ms"] / 1000.0)
            print(
                f"{name} 2^{sz.bit_length()-1} rep{rep}: "
                f"{res['ofdm_symbols_per_s']/1e6:.2f}M syms/s "
                f"wall {walls[-1]:.3f}s "
                f"hot={res['hotpath_used']} ber={res['bit_error_rate']:.6f}",
                flush=True,
            )
        best_wall[sz] = min(walls)
        print(
            f"{name} 2^{sz.bit_length()-1}: best {sz/best_wall[sz]/1e6:.2f}M",
            flush=True,
        )
    if len(sizes) >= 2:
        a, b = sizes[0], sizes[1]
        dt = best_wall[a] - best_wall[b]
        if dt > 0:
            print(
                f"{name} marginal ({a}-{b} syms / best-wall diff {dt:.3f}s): "
                f"{(a - b) / dt / 1e6:.2f}M syms/s",
                flush=True,
            )


def main():
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    run_cell("wide-CP1.0-diag", PrefixType.CYCLIC, 1.0, [1 << 27, 1 << 24], reps)
    run_cell("lr-ZP1.0", PrefixType.ZERO, 1.0, [1 << 26, 1 << 23], reps)


if __name__ == "__main__":
    main()
