"""Plotting utilities (host-side matplotlib).

Functional equivalents of the reference's `utils/visualization.py` four
public functions (utils/__init__.py:3-15):

  * order-distribution bar chart        (visualization.py:17-106)
  * combined constellation + distribution figure (:109-263)
  * waterfilling water-level diagram    (:266-360)
  * adaptive constellation diagram colored by order (:363-575)

Same signatures and figure layouts; rendering code is new.
"""

from __future__ import annotations

from typing import Optional, Tuple

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt  # noqa: E402
import numpy as np  # noqa: E402
from matplotlib import cm  # noqa: E402
from matplotlib.figure import Figure  # noqa: E402
from numpy.typing import NDArray  # noqa: E402


def _order_bars(ax, constellation_orders: NDArray[np.int64]) -> None:
    active = constellation_orders[constellation_orders > 0]
    unique_orders, counts = np.unique(active, return_counts=True)
    colors = cm.viridis(np.linspace(0, 1, max(len(unique_orders), 1)))
    bars = ax.bar(range(len(unique_orders)), counts, color=colors, edgecolor="black")
    ax.set_xlabel("Constellation Order (M-QAM/PSK)")
    ax.set_ylabel("Number of Subcarriers")
    ax.set_xticks(range(len(unique_orders)))
    ax.set_xticklabels([f"{int(o)}" for o in unique_orders])
    ax.grid(True, axis="y", alpha=0.3)
    for bar, count in zip(bars, counts):
        ax.text(
            bar.get_x() + bar.get_width() / 2.0,
            bar.get_height(),
            f"{int(count)}",
            ha="center",
            va="bottom",
            fontsize=9,
        )


def _stats_box(ax, constellation_orders: NDArray[np.int64], num_subcarriers: int) -> None:
    active = int(np.sum(constellation_orders > 0))
    inactive = int(np.sum(constellation_orders == 0))
    avg = float(np.mean(constellation_orders[constellation_orders > 0])) if active else 0.0
    text = (
        f"Total Subcarriers: {num_subcarriers}\n"
        f"Active: {active}\nInactive: {inactive}\nAvg Order: {avg:.1f}"
    )
    ax.text(
        0.98,
        0.98,
        text,
        transform=ax.transAxes,
        fontsize=9,
        va="top",
        ha="right",
        bbox=dict(facecolor="white", alpha=0.8),
    )


def plot_constellation_order_distribution(
    constellation_orders: NDArray[np.int64],
    num_subcarriers: int,
    figsize: Tuple[float, float] = (10, 6),
    title: str = "Constellation Order Distribution",
) -> Figure:
    """Bar chart of constellation orders across subcarriers."""
    fig, ax = plt.subplots(figsize=figsize)
    _order_bars(ax, np.asarray(constellation_orders))
    ax.set_title(title)
    _stats_box(ax, np.asarray(constellation_orders), num_subcarriers)
    fig.tight_layout()
    return fig


def _constellation_scatter(
    ax,
    received: NDArray[np.complex128],
    ideal: NDArray[np.complex128],
    ber: float,
    snr_db: float,
    papr_db: float,
    title: str,
) -> None:
    ax.scatter(received.real, received.imag, color="blue", marker=".", alpha=0.1,
               label="Received Symbols")
    ax.scatter(ideal.real, ideal.imag, color="red", marker="o", s=50,
               label="Ideal Constellation Points")
    ax.set_title(title)
    ax.set_xlabel("In-Phase")
    ax.set_ylabel("Quadrature")
    ax.axhline(0, color="black", lw=0.5)
    ax.axvline(0, color="black", lw=0.5)
    ax.legend(loc="upper right")
    ax.grid(True)
    ax.set_xlim(-1.5, 1.5)
    ax.set_ylim(-1.5, 1.5)
    ax.set_aspect("equal")
    ax.text(
        0.05,
        0.95,
        f"BER: {ber:.6f}\nSNR: {snr_db} dB\nPAPR: {papr_db:.2f} dB",
        transform=ax.transAxes,
        fontsize=10,
        va="top",
        bbox=dict(facecolor="white", alpha=0.8),
    )


def plot_combined_constellation_analysis(
    constellation_orders: NDArray[np.int64],
    demodulated_symbols: NDArray[np.complex128],
    ideal_constellation_points: NDArray[np.complex128],
    num_subcarriers: int,
    ber: float,
    snr_db: float,
    papr_db: float,
    figsize: Tuple[float, float] = (16, 8),
    title_prefix: str = "Adaptive Modulation",
) -> Figure:
    """Two-panel figure: constellation + order distribution (adaptive mode)."""
    fig = plt.figure(figsize=figsize)
    ax1 = plt.subplot(1, 2, 1)
    _constellation_scatter(
        ax1,
        np.asarray(demodulated_symbols),
        np.asarray(ideal_constellation_points),
        ber,
        snr_db,
        papr_db,
        f"Constellation Diagram ({title_prefix})",
    )
    ax2 = plt.subplot(1, 2, 2)
    _order_bars(ax2, np.asarray(constellation_orders))
    ax2.set_title("Constellation Order Distribution")
    _stats_box(ax2, np.asarray(constellation_orders), num_subcarriers)
    fig.tight_layout()
    return fig


def render_results_constellation(
    results: dict,
    ideal_points: NDArray[np.complex128],
    constellation_orders: NDArray[np.int64],
    num_subcarriers: int,
    adaptive: bool,
):
    """Rendered constellation figure for ``results["constellation_plot"]``.

    Drop-in analog of the reference's in-run rendering
    (simulation/models.py:630-796): fixed mode draws the single
    received-vs-ideal scatter with the BER/SNR/PAPR text box; adaptive mode
    the two-panel scatter + order-distribution figure.  Returns a PIL image
    like the reference (saved through a PNG buffer).  On TPU this runs off
    the hot path, only when LinkRunner.run(render_constellation=True).
    """
    from io import BytesIO

    from PIL import Image

    received = results.get("received_symbols")
    received = (
        np.zeros(0, np.complex128) if received is None else np.asarray(received)
    )
    ber = float(results["bit_error_rate"])
    snr_db = results["snr_db"]
    papr_db = float(results["papr_db"])
    if adaptive:
        fig = plot_combined_constellation_analysis(
            np.asarray(constellation_orders),
            received,
            np.asarray(ideal_points),
            num_subcarriers,
            ber,
            snr_db,
            papr_db,
        )
    else:
        fig = plt.figure(figsize=(8, 8))
        _constellation_scatter(
            fig.gca(), received, np.asarray(ideal_points), ber, snr_db, papr_db,
            str(results["title"]),
        )
        fig.tight_layout()
    buf = BytesIO()
    fig.savefig(buf, format="png")
    buf.seek(0)
    image = Image.open(buf)
    image.load()
    plt.close(fig)
    return image


def plot_water_level_diagram(
    power_allocation: NDArray[np.float64],
    channel_gains: NDArray[np.float64],
    noise_power: float,
    water_level: Optional[float] = None,
    figsize: Tuple[float, float] = (12, 6),
    title: str = "Waterfilling Power Allocation",
) -> Figure:
    """Stacked-bar waterfilling diagram: noise floor + allocated power + mu line."""
    power_allocation = np.asarray(power_allocation, dtype=np.float64)
    channel_gains = np.asarray(channel_gains, dtype=np.float64)
    fig, ax = plt.subplots(figsize=figsize)
    idx = np.arange(len(power_allocation))
    noise_floor = noise_power / channel_gains
    ax.bar(idx, noise_floor, color="lightcoral", label="Noise Floor (N0/|H|^2)",
           edgecolor="darkred", linewidth=0.5)
    ax.bar(idx, power_allocation, bottom=noise_floor, color="steelblue",
           label="Allocated Power", edgecolor="navy", linewidth=0.5)
    if water_level is not None:
        ax.axhline(water_level, color="darkgreen", linestyle="--", linewidth=2,
                   label=f"Water Level (mu = {water_level:.4f})")
    ax.set_xlabel("Subcarrier Index")
    ax.set_ylabel("Power Level")
    ax.set_title(title)
    ax.legend(loc="upper right")
    ax.grid(True, axis="y", alpha=0.3)
    fig.tight_layout()
    return fig


def plot_adaptive_constellation_diagram(
    received_symbols: NDArray[np.complex128],
    constellation_orders: NDArray[np.int64],
    constellation_title: str,
    num_subcarriers: int,
    ber: float,
    ser: float,
    snr_db: float,
    papr_db: float,
    figsize: Tuple[float, float] = (14, 6),
    title_prefix: str = "Adaptive Modulation",
) -> Figure:
    """Constellation diagram with received symbols color-coded by order."""
    from ofdm_tpu.ops.mapping import make_constellation

    received_symbols = np.asarray(received_symbols)
    constellation_orders = np.asarray(constellation_orders)
    fig, (ax1, ax2) = plt.subplots(1, 2, figsize=figsize)

    orders_per_symbol = np.tile(
        constellation_orders, len(received_symbols) // num_subcarriers + 1
    )[: len(received_symbols)]
    unique_orders = [int(o) for o in np.unique(constellation_orders) if o > 0]
    colors = cm.viridis(np.linspace(0, 1, max(len(unique_orders), 1)))

    kind = "QAM" if "QAM" in constellation_title.upper() else "PSK"
    for color, order in zip(colors, unique_orders):
        mask = orders_per_symbol == order
        pts = received_symbols[mask]
        ax1.scatter(pts.real, pts.imag, color=color, marker=".", alpha=0.15,
                    label=f"{order}-{kind}")
        ideal = make_constellation(kind, order).table
        ax1.scatter(ideal.real, ideal.imag, color=color, marker="o", s=40,
                    edgecolor="black", linewidth=0.5)
    ax1.set_title(f"{title_prefix}: {constellation_title}")
    ax1.set_xlabel("In-Phase")
    ax1.set_ylabel("Quadrature")
    ax1.axhline(0, color="black", lw=0.5)
    ax1.axvline(0, color="black", lw=0.5)
    ax1.legend(loc="upper right", fontsize=8)
    ax1.grid(True)
    ax1.set_aspect("equal")
    ax1.text(
        0.05,
        0.95,
        f"BER: {ber:.6f}\nSER: {ser:.6f}\nSNR: {snr_db} dB\nPAPR: {papr_db:.2f} dB",
        transform=ax1.transAxes,
        fontsize=9,
        va="top",
        bbox=dict(facecolor="white", alpha=0.8),
    )

    _order_bars(ax2, constellation_orders)
    ax2.set_title("Constellation Order Distribution")
    _stats_box(ax2, constellation_orders, num_subcarriers)
    fig.tight_layout()
    return fig
