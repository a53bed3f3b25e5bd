"""Live BER-plot watcher: re-render the curve whenever the CSV changes.

Equivalent of the reference's separate-process plot refresher
(`update_ber_vs_snr_plot.py:13-101`): polls results/ber_results.csv mtime
every second and re-renders a grouped semilogy plot; `--mode clear` resets
the CSV.

Usage:
    python -m ofdm_tpu.utils.watch [--results results/ber_results.csv]
                                   [--output results/ber_vs_snr_live.png]
                                   [--mode update|clear] [--interval 1.0]
                                   [--once]
"""

from __future__ import annotations

import argparse
import os
import time

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt  # noqa: E402
import pandas as pd  # noqa: E402


def render_ber_plot(csv_path: str, output_path: str) -> bool:
    """Render the grouped semilogy BER plot; returns True if rendered."""
    if not os.path.exists(csv_path):
        return False
    df = pd.read_csv(csv_path)
    if df.empty:
        return False
    plt.figure(figsize=(10, 6))
    for name, group in df.groupby("simulation_name"):
        group = group.sort_values("snr_db")
        plt.semilogy(group["snr_db"], group["bit_error_rate"], marker="o", label=name)
    plt.xlabel("SNR (dB)")
    plt.ylabel("Bit Error Rate (BER)")
    plt.title("BER vs SNR (live)")
    plt.grid(True, which="both", linestyle="--", linewidth=0.5, alpha=0.7)
    plt.legend(fontsize=9)
    plt.tight_layout()
    plt.savefig(output_path, dpi=150)
    plt.close()
    return True


def watch(csv_path: str, output_path: str, interval: float = 1.0, once: bool = False) -> None:
    """Poll the CSV mtime; re-render on change (update_ber_vs_snr_plot.py:13-63)."""
    last_mtime = 0.0
    while True:
        try:
            if os.path.exists(csv_path):
                mtime = os.path.getmtime(csv_path)
                if mtime != last_mtime:
                    if render_ber_plot(csv_path, output_path):
                        print(f"updated {output_path}")
                    last_mtime = mtime
        except Exception as exc:  # keep watching through transient IO races
            print(f"watcher retry: {exc}")
        if once:
            return
        time.sleep(interval)


def clear_results_file(csv_path: str) -> None:
    """Reset the CSV to headers only (update_ber_vs_snr_plot.py:65-81)."""
    pd.DataFrame(columns=["simulation_name", "snr_db", "bit_error_rate"]).to_csv(
        csv_path, index=False
    )
    print(f"cleared {csv_path}")


def main() -> int:
    parser = argparse.ArgumentParser(description="BER vs SNR Plot Updater")
    parser.add_argument("--results", default="results/ber_results.csv")
    parser.add_argument("--output", default="results/ber_vs_snr_live.png")
    parser.add_argument("--mode", choices=["update", "clear"], default="update")
    parser.add_argument("--interval", type=float, default=1.0)
    parser.add_argument("--once", action="store_true", help="render once and exit")
    args = parser.parse_args()
    if args.mode == "clear":
        clear_results_file(args.results)
        return 0
    watch(args.results, args.output, args.interval, once=args.once)
    return 0


if __name__ == "__main__":  # pragma: no cover
    raise SystemExit(main())
