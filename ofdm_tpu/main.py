"""CLI runner: config JSON -> sharded SNR sweep -> CSV/plots/summary.

TPU-native equivalent of the reference entry point (`main.py:347-397` +
`SimulationRunner`, main.py:197-344): loads the same JSON settings format,
fans the SNR grid out (sharded over all local devices), upserts the BER CSV
per point, saves structured constellation PNGs and the BER-vs-SNR curve,
and prints summary statistics.  Unlike the reference (hardcoded paths,
main.py:351-354) paths are proper CLI flags.

Usage:
    python -m ofdm_tpu.main [--settings config/settings.json]
                            [--simulation-settings config/simulation_settings.json]
                            [--results-dir results] [--images-dir images]
                            [--no-shard] [--resume] [--collect-symbols N]
"""

from __future__ import annotations

import argparse
import os
import sys
from pathlib import Path
from typing import Optional

import jax


def main(argv=None) -> int:
    parser = argparse.ArgumentParser(description="ofdm_tpu simulation runner")
    parser.add_argument("--settings", default="config/settings.json")
    parser.add_argument("--simulation-settings", default="config/simulation_settings.json")
    parser.add_argument("--results-dir", default="results")
    parser.add_argument("--images-dir", default="images")
    parser.add_argument("--doc-figures-dir", default="docs/figures")
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument(
        "--no-shard", action="store_true", help="run single-device (no mesh)"
    )
    parser.add_argument(
        "--no-grid",
        action="store_true",
        help="dispatch each SNR point separately instead of scanning the "
        "whole grid inside one executable (finer-grained CSV resume, "
        "one ~140 ms relay round trip per point)",
    )
    parser.add_argument(
        "--resume",
        action="store_true",
        help="skip (simulation, snr) points already present in the BER CSV",
    )
    parser.add_argument(
        "--collect-symbols",
        type=int,
        default=32768,
        help="received-symbol sample size for constellation plots (0 = no plots)",
    )
    args = parser.parse_args(argv)

    from ofdm_tpu.config import ChannelType, Settings, SimulationConfig
    from ofdm_tpu.parallel import distributed_init, run_sweep
    from ofdm_tpu.pipeline import prepare
    from ofdm_tpu.utils.report import ResultsManager

    distributed_init()

    try:
        settings: Optional[Settings] = None
        if os.path.exists(args.settings):
            settings = Settings.from_json(args.settings)
            print("=" * 80)
            print(f"  {settings.project_name} v{settings.version}")
            print("=" * 80)
        configs = SimulationConfig.from_json(args.simulation_settings)
    except FileNotFoundError as exc:
        print(f"Error: Configuration file not found - {exc}")
        return 1

    base = configs[0]
    snrs = [c.snr_db for c in configs]

    # Channel name for the per-channel image directory (main.py:357-365).
    channel_name = "default"
    if base.channel_type == ChannelType.CUSTOM and base.channel_model:
        channel_name = Path(base.channel_model).stem
    elif base.channel_type == ChannelType.FLAT:
        channel_name = "flat"

    manager = ResultsManager(
        results_dir=args.results_dir,
        images_dir=args.images_dir,
        channel_name=channel_name,
        doc_figures_dir=args.doc_figures_dir,
    )

    if args.resume:
        done = set(manager.completed_points(base.title.replace(" ", "_")))
        skipped = [s for s in snrs if s in done]
        snrs = [s for s in snrs if s not in done]
        if skipped:
            print(f"--resume: skipping {len(skipped)} completed point(s): {skipped}")
        if not snrs:
            print("--resume: nothing to do")
            return 0

    print(f"Devices: {jax.devices()}")
    print(f"Running {len(snrs)} SNR point(s) on channel '{channel_name}'\n")

    results = run_sweep(
        base,
        snrs=snrs,
        key=jax.random.PRNGKey(args.seed),
        sharded=not args.no_shard,
        collect_symbols=args.collect_symbols,
        results_manager=manager,
        grid=not args.no_grid,
    )

    # Constellation plots + BER curve (SimulationRunner.process_results,
    # main.py:251-344).
    saved = 0
    for r in results:
        if r.get("received_symbols") is not None:
            setup = prepare(base.replace(snr_db=r["snr_db"]))
            if manager.save_constellation_plot(r, setup.constellation_points):
                saved += 1
    if saved:
        print(f"  Saved {saved} constellation plot(s) under {manager.images_dir}")
    plot_path = manager.plot_ber_vs_snr(results)
    print(f"  BER vs SNR plot: {plot_path}")
    print(f"  BER CSV: {manager.csv_path}")

    print("\n" + "=" * 80)
    print("  Summary Statistics")
    print("=" * 80)
    bers = [r["bit_error_rate"] for r in results]
    paprs = [r["papr_db"] for r in results]
    rates = [r["ofdm_symbols_per_s"] for r in results]
    print(f"  SNR Range: {min(r['snr_db'] for r in results):.1f} dB to "
          f"{max(r['snr_db'] for r in results):.1f} dB")
    print(f"  BER Range: {min(bers):.6e} to {max(bers):.6e}")
    print(f"  Average PAPR: {sum(paprs) / len(paprs):.2f} dB")
    print(f"  Peak throughput: {max(rates):,.0f} OFDM symbols/s")
    print("=" * 80)
    return 0


if __name__ == "__main__":  # pragma: no cover
    sys.exit(main())
