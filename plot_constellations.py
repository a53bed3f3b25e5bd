"""Standalone labeled constellation plotter CLI.

Equivalent of the reference's plot_constellations.py:25-193: draw a QAM or
PSK constellation with bit labels and a symbol-power colormap.

Usage:
    python plot_constellations.py --type QAM --order 16 [--output out.png]
"""

from __future__ import annotations

import argparse

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt  # noqa: E402
import numpy as np  # noqa: E402

from ofdm_tpu.ops.mapping import make_constellation  # noqa: E402


def plot_constellation(kind: str, order: int, output: str | None = None) -> str:
    const = make_constellation(kind, order)
    table = const.table
    b = const.bits_per_symbol
    power = np.abs(table) ** 2

    fig, ax = plt.subplots(figsize=(9, 9))
    sc = ax.scatter(table.real, table.imag, c=power, cmap="viridis", s=120,
                    edgecolor="black", linewidth=0.8, zorder=3)
    for i, point in enumerate(table):
        ax.annotate(
            format(i, f"0{b}b"),
            (point.real, point.imag),
            textcoords="offset points",
            xytext=(0, 9),
            ha="center",
            fontsize=max(5, 10 - b),
        )
    fig.colorbar(sc, ax=ax, label="Symbol power |s|^2", shrink=0.8)
    ax.set_title(f"{const.name} constellation (Gray-coded, unit average power)")
    ax.set_xlabel("In-Phase")
    ax.set_ylabel("Quadrature")
    ax.axhline(0, color="gray", lw=0.5)
    ax.axvline(0, color="gray", lw=0.5)
    ax.grid(True, linestyle=":", alpha=0.5)
    ax.set_aspect("equal")
    fig.tight_layout()

    path = output or f"constellation_{order}{kind}.png"
    fig.savefig(path, dpi=150)
    plt.close(fig)
    return path


def main() -> int:
    parser = argparse.ArgumentParser(description="Plot labeled constellations")
    parser.add_argument("--type", choices=["QAM", "PSK"], default="QAM")
    parser.add_argument("--order", type=int, default=16)
    parser.add_argument("--output", default=None)
    args = parser.parse_args()
    path = plot_constellation(args.type, args.order, args.output)
    print(f"Saved {path}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
