"""Result management: CSV upsert, structured image names, BER plots.

Drop-in behavioral equivalent of the reference `ResultsManager`
(main.py:19-194): same CSV schema/upsert-by-(simulation_name, snr_db)
semantics (crude grid-level resume, SURVEY §5), same structured PNG filename
grammar `{CP|ZP}-{OFDM|SC-OFDM}-{ZF|MMSE}-{order}{QAM|PSK}-{WF|UNIFORM}-
SNR{x_y}dB.png` (main.py:129-144, IMAGE_ORGANIZATION.md:29-68), same
per-channel image directories and docs/figures mirroring (main.py:40-67).

The constellation figure itself is rendered here from the pipeline's sampled
received symbols (the reference renders inside Simulation.run,
simulation/models.py:629-796 — on TPU we keep plotting off the hot path).
"""

from __future__ import annotations

import shutil
from pathlib import Path
from typing import Any, Dict, List, Optional, Union

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt  # noqa: E402
import numpy as np  # noqa: E402
import pandas as pd  # noqa: E402

from ofdm_tpu.utils.visualization import (  # noqa: E402
    _constellation_scatter,
    plot_combined_constellation_analysis,
)

# Output-format parity spec for the BER curve PNG.  Downstream consumers of
# the reference's figures (docs mirroring, report LaTeX) expect this exact
# look, so the knobs live here as data rather than inline styling calls;
# values were transcribed from the rendered reference output (main.py:146-194).
BER_CURVE_STYLE: Dict[str, Any] = {
    "figsize": (10, 6),
    "line": {"marker": "o", "linestyle": "-", "color": "blue", "label": "BER vs SNR"},
    "xlabel": ("SNR (dB)", 12),
    "ylabel": ("Bit Error Rate (BER)", 12),
    "title": ("BER vs SNR Performance", 14),
    "grid": {"which": "both", "linestyle": "--", "linewidth": 0.5, "alpha": 0.7},
    "legend_fontsize": 11,
    "dpi": 150,
}


def _render_ber_curve(snrs, bers):
    style = BER_CURVE_STYLE
    fig, ax = plt.subplots(figsize=style["figsize"])
    ax.semilogy(snrs, bers, **style["line"])
    for setter, key in ((ax.set_xlabel, "xlabel"), (ax.set_ylabel, "ylabel")):
        text, size = style[key]
        setter(text, fontsize=size)
    title, title_size = style["title"]
    ax.set_title(title, fontsize=title_size, fontweight="bold")
    ax.grid(True, **style["grid"])
    ax.legend(fontsize=style["legend_fontsize"])
    fig.tight_layout()
    return fig


class ResultsManager:
    """CSV + image output management (reference main.py:19-194 semantics)."""

    def __init__(
        self,
        results_dir: str = "results",
        images_dir: str = "images",
        channel_name: str = "default",
        doc_figures_dir: Union[str, Path, None] = "docs/figures",
    ):
        self.results_dir = Path(results_dir)
        self.channel_name = channel_name
        self.images_dir = Path(images_dir) / channel_name
        self.csv_path = self.results_dir / "ber_results.csv"
        self.doc_figures_dir: Optional[Path] = (
            Path(doc_figures_dir) if doc_figures_dir else None
        )
        self.doc_channel_dir: Optional[Path] = None

        self.results_dir.mkdir(parents=True, exist_ok=True)
        self.images_dir.mkdir(parents=True, exist_ok=True)
        if self.doc_figures_dir:
            self.doc_figures_dir.mkdir(parents=True, exist_ok=True)
            self.doc_channel_dir = self.doc_figures_dir / self.channel_name
            self.doc_channel_dir.mkdir(parents=True, exist_ok=True)

    # -- docs mirroring (main.py:53-67) -------------------------------------
    def _mirror_to_docs(self, source_path: Path) -> Optional[Path]:
        if not self.doc_channel_dir or not source_path.exists():
            return None
        try:
            relative = source_path.relative_to(self.images_dir)
        except ValueError:
            relative = Path(source_path.name)
        destination = self.doc_channel_dir / relative
        destination.parent.mkdir(parents=True, exist_ok=True)
        shutil.copy2(source_path, destination)
        return destination

    # -- CSV upsert (main.py:69-101) -----------------------------------------
    def update_ber_csv(
        self, simulation_name: str, snr_db: float, bit_error_rate: float
    ) -> None:
        if self.csv_path.exists():
            df = pd.read_csv(self.csv_path)
        else:
            df = pd.DataFrame(columns=["simulation_name", "snr_db", "bit_error_rate"])
        mask = (df["simulation_name"] == simulation_name) & (df["snr_db"] == snr_db)
        if mask.any():
            df.loc[mask, "bit_error_rate"] = bit_error_rate
        else:
            row = {
                "simulation_name": simulation_name,
                "snr_db": snr_db,
                "bit_error_rate": bit_error_rate,
            }
            df = pd.concat([df, pd.DataFrame([row])], ignore_index=True)
        df.to_csv(self.csv_path, index=False)

    def completed_points(self, simulation_name: str) -> List[float]:
        """SNRs already recorded for a simulation — grid-level resume."""
        if not self.csv_path.exists():
            return []
        df = pd.read_csv(self.csv_path)
        return df[df["simulation_name"] == simulation_name]["snr_db"].tolist()

    # -- structured image name (main.py:129-144) -------------------------------
    @staticmethod
    def image_filename(result: Dict[str, Any], suffix: str = "") -> str:
        snr_str = f"{result['snr_db']:.1f}".replace(".", "_")
        tail = suffix if suffix else f"SNR{snr_str}dB"
        return (
            f"{result.get('prefix_acronym', 'NONE')}-"
            f"{result.get('modulator_type', 'OFDM')}-"
            f"{result.get('equalizator_type', 'NONE')}-"
            f"{result.get('constellation_order', 16)}"
            f"{result.get('constellation_scheme', 'QAM')}-"
            f"{result.get('power_allocation_acronym', 'UNIFORM')}-"
            f"{tail}.png"
        )

    # -- constellation plot (simulation/models.py:629-796 layouts) -------------
    def save_constellation_plot(
        self, result: Dict[str, Any], ideal_points: np.ndarray
    ) -> Optional[Path]:
        received = result.get("received_symbols")
        if received is None:
            return None
        is_adaptive = result.get("adaptive_modulation_mode") == "CAPACITY_BASED"
        if is_adaptive:
            fig = plot_combined_constellation_analysis(
                np.asarray(result["constellation_order_per_subcarrier"]),
                received,
                ideal_points,
                result["num_subcarriers"],
                result["bit_error_rate"],
                result["snr_db"],
                result["papr_db"],
            )
        else:
            fig, ax = plt.subplots(figsize=(8, 8))
            _constellation_scatter(
                ax,
                np.asarray(received),
                np.asarray(ideal_points),
                result["bit_error_rate"],
                result["snr_db"],
                result["papr_db"],
                result.get("title", ""),
            )
            fig.tight_layout()
        filepath = self.images_dir / self.image_filename(result)
        fig.savefig(filepath, format="png")
        plt.close(fig)
        self._mirror_to_docs(filepath)
        return filepath

    # -- BER-vs-SNR curve (main.py:146-194) -------------------------------------
    def plot_ber_vs_snr(self, results: List[Dict[str, Any]]) -> Path:
        bers = [r["bit_error_rate"] for r in results if "bit_error_rate" in r]
        snrs = [r["snr_db"] for r in results if "snr_db" in r]
        if not bers or not snrs:
            return self.images_dir / "ber_vs_snr.png"
        filename = (
            self.image_filename(results[0], suffix="BER_vs_SNR")
            if results
            else "ber_vs_snr.png"
        )
        fig = _render_ber_curve(snrs, bers)
        filepath = self.images_dir / filename
        fig.savefig(filepath, dpi=BER_CURVE_STYLE["dpi"])
        plt.close(fig)
        self._mirror_to_docs(filepath)
        return filepath

    # -- streaming hook for run_sweep -------------------------------------------
    def record(self, result: Dict[str, Any]) -> None:
        """Upsert one completed point (checkpoint for resumable sweeps)."""
        name = result.get("title", "unknown").replace(" ", "_")
        self.update_ber_csv(name, result["snr_db"], result["bit_error_rate"])
