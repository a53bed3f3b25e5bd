"""Pod-scale Monte-Carlo sweep: 10^9+ QAM symbols, 1024 subcarriers, sharded.

BASELINE configs[4] driver: the full SNR grid over a wide-band link, with the
OFDM-symbol batch sharded over every available chip (multi-host via
`jax.distributed` when launched per-process on a pod — see
ofdm_tpu.parallel.mesh.distributed_init).  On one chip this still runs — it
just takes num_devices times longer.

Defaults are sized for a quick demo; pass --full for the 10^9-symbol run.
"""

# Allow running straight from a source checkout (no install needed).
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import argparse
import time

import jax

from ofdm_tpu.config import (
    ChannelType,
    EqualizationMethod,
    PrefixType,
    SimulationConfig,
)
from ofdm_tpu.parallel import ShardedLinkRunner, distributed_init, make_mesh
from ofdm_tpu.pipeline import prepare


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--full", action="store_true",
                        help="10^9+ QAM symbols per point (configs[4] scale)")
    parser.add_argument("--subcarriers", type=int, default=1024)
    args = parser.parse_args()

    distributed_init()
    mesh = make_mesh()
    n_dev = mesh.devices.size
    print(f"Mesh: {n_dev} device(s) — {mesh.shape}")

    n = args.subcarriers
    qam_per_point = (1 << 30) if args.full else (1 << 24)  # 1.07e9 / 16.8M
    num_ofdm = qam_per_point // n
    num_ofdm -= num_ofdm % n_dev  # divisible across the mesh

    cfg = SimulationConfig(
        num_symbols=num_ofdm * n,
        num_subcarriers=n,
        constellation_order=64,
        channel_type=ChannelType.CUSTOM,
        channel_model="severe_multipath",
        prefix_type=PrefixType.CYCLIC,
        prefix_length_ratio=1.0,
        equalization_method=EqualizationMethod.MMSE,
        snr_db=20.0,
        symbols_per_chunk=min(num_ofdm, 8192 * n_dev),
    )
    runner = ShardedLinkRunner(prepare(cfg), mesh=mesh)
    key = jax.random.PRNGKey(0)

    print(f"{num_ofdm:,} OFDM symbols x {n} subcarriers per point "
          f"({cfg.num_symbols:,} QAM symbols, {cfg.num_symbols * 6:,} bits)")
    snrs = (0.0, 10.0, 20.0, 30.0)
    # Whole grid in ONE dispatch: the SNR axis scans inside the sharded
    # executable (LinkRunner.run_grid), so the sweep pays the ~140 ms relay
    # dispatch latency once instead of once per point.
    t0 = time.perf_counter()
    rs = runner.run_grid(key, snrs)
    dt = time.perf_counter() - t0
    for r in rs:
        print(f"  SNR {r['snr_db']:5.1f} dB: BER {r['bit_error_rate']:.2e}  "
              f"{r['ofdm_symbols_per_s']:,.0f} OFDM syms/s")
    print(f"  grid wall {dt:.1f}s for {len(rs)} points "
          f"({cfg.num_symbols * len(rs) / dt / 1e6:,.1f}M QAM syms/s aggregate, "
          f"one dispatch)")


if __name__ == "__main__":
    main()
