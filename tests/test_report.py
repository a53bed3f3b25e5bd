"""Reporting / CLI tests: CSV upsert, filenames, plots, watcher, main()."""

import os

import numpy as np
import pandas as pd
import pytest

from ofdm_tpu.utils.report import ResultsManager
from ofdm_tpu.utils import watch as watchmod
from ofdm_tpu.utils import (
    plot_adaptive_constellation_diagram,
    plot_combined_constellation_analysis,
    plot_constellation_order_distribution,
    plot_water_level_diagram,
)


def _result(snr=20.0, ber=0.01, received=None):
    return {
        "prefix_acronym": "CP",
        "modulator_type": "OFDM",
        "equalizator_type": "MMSE",
        "constellation_order": 16,
        "constellation_scheme": "QAM",
        "power_allocation_acronym": "UNIFORM",
        "adaptive_modulation_mode": "FIXED",
        "snr_db": snr,
        "bit_error_rate": ber,
        "papr_db": 10.0,
        "num_subcarriers": 64,
        "constellation_order_per_subcarrier": [16] * 64,
        "title": "CP-OFDM-MMSE",
        "received_symbols": received,
    }


def test_csv_upsert_semantics(tmp_path):
    m = ResultsManager(
        results_dir=str(tmp_path / "results"),
        images_dir=str(tmp_path / "images"),
        channel_name="testchan",
        doc_figures_dir=None,
    )
    m.update_ber_csv("sim_a", 10.0, 0.1)
    m.update_ber_csv("sim_a", 20.0, 0.01)
    m.update_ber_csv("sim_b", 10.0, 0.2)
    # Upsert: same key overwrites (main.py:83-101).
    m.update_ber_csv("sim_a", 10.0, 0.05)
    df = pd.read_csv(m.csv_path)
    assert len(df) == 3
    row = df[(df.simulation_name == "sim_a") & (df.snr_db == 10.0)]
    assert float(row.bit_error_rate.iloc[0]) == 0.05
    assert sorted(m.completed_points("sim_a")) == [10.0, 20.0]


def test_structured_image_filename():
    name = ResultsManager.image_filename(_result(snr=30.5))
    assert name == "CP-OFDM-MMSE-16QAM-UNIFORM-SNR30_5dB.png"


def test_constellation_plot_and_mirror(tmp_path):
    m = ResultsManager(
        results_dir=str(tmp_path / "results"),
        images_dir=str(tmp_path / "images"),
        channel_name="chan",
        doc_figures_dir=str(tmp_path / "docs"),
    )
    rng = np.random.RandomState(0)
    received = rng.randn(500) + 1j * rng.randn(500)
    ideal = rng.randn(16) + 1j * rng.randn(16)
    path = m.save_constellation_plot(_result(received=received), ideal)
    assert path.exists()
    assert (tmp_path / "docs" / "chan" / path.name).exists()
    # No symbols -> no plot.
    assert m.save_constellation_plot(_result(received=None), ideal) is None


def test_ber_plot(tmp_path):
    m = ResultsManager(
        results_dir=str(tmp_path / "r"),
        images_dir=str(tmp_path / "i"),
        channel_name="c",
        doc_figures_dir=None,
    )
    results = [_result(snr=s, ber=10 ** (-s / 10)) for s in (5.0, 10.0, 15.0)]
    path = m.plot_ber_vs_snr(results)
    assert path.exists()
    assert path.name == "CP-OFDM-MMSE-16QAM-UNIFORM-BER_vs_SNR.png"


def test_viz_functions_render():
    orders = np.array([4, 16, 64, 0] * 16, dtype=np.int64)
    rng = np.random.RandomState(1)
    received = rng.randn(640) + 1j * rng.randn(640)
    ideal = rng.randn(84) + 1j * rng.randn(84)
    figs = [
        plot_constellation_order_distribution(orders, 64),
        plot_combined_constellation_analysis(orders, received, ideal, 64, 0.01, 20.0, 10.0),
        plot_water_level_diagram(np.abs(rng.randn(64)), np.abs(rng.randn(64)) + 0.1, 0.01, 0.5),
        plot_adaptive_constellation_diagram(
            received, orders, "Adaptive-4-to-64-QAM", 64, 0.01, 0.02, 20.0, 10.0
        ),
    ]
    import matplotlib.pyplot as plt

    for f in figs:
        assert f is not None
        plt.close(f)


def test_channel_plots_tool(tmp_path):
    """utils/channel_plots mirrors the reference's channel-plots.py (:1-29)."""
    from ofdm_tpu.utils.channel_plots import main, plot_channel_response

    out = tmp_path / "resp.png"
    assert main(["Lin-Phoong_P2", "--out", str(out)]) == 0
    assert out.stat().st_size > 1000
    # default = the reference script's example taps
    out2 = tmp_path / "resp2.png"
    assert main(["--n", "256", "--out", str(out2)]) == 0
    fig = plot_channel_response(np.array([1.0, 0.5j]), n=64)
    import matplotlib.pyplot as plt

    plt.close(fig)


def test_watcher_render_and_clear(tmp_path):
    csv = tmp_path / "ber.csv"
    out = tmp_path / "live.png"
    pd.DataFrame(
        {
            "simulation_name": ["a", "a", "b"],
            "snr_db": [5.0, 10.0, 5.0],
            "bit_error_rate": [0.1, 0.01, 0.2],
        }
    ).to_csv(csv, index=False)
    assert watchmod.render_ber_plot(str(csv), str(out))
    assert out.exists()
    watchmod.watch(str(csv), str(out), once=True)
    watchmod.clear_results_file(str(csv))
    df = pd.read_csv(csv)
    assert len(df) == 0
    assert not watchmod.render_ber_plot(str(csv), str(out))  # empty -> no render


def test_cli_main_end_to_end(tmp_path):
    """Full CLI flow with a reference-format settings file (fast sizes)."""
    import json

    from ofdm_tpu import main as climain

    settings = {
        "project_name": "ofdm_tpu test",
        "version": "0.0.1",
        "debug": False,
    }
    sim_settings = {
        "num_bands": 64,
        "signal_noise_ratios": [5, 25],
        "channel_model_path": "two_ray",
        "channel_type": "CUSTOM",
        "num_symbols": 64 * 160,
        "constellation_order": 4,
        "constellation_type": "QAM",
        "noise_type": "AWGN",
        "prefix_length_ratio": 1.0,
        "prefix_type": "CYCLIC",
        "modulation_type": "OFDM",
        "equalization_method": "ZF",
        "power_allocation_type": "UNIFORM",
    }
    (tmp_path / "settings.json").write_text(json.dumps(settings))
    (tmp_path / "sim.json").write_text(json.dumps(sim_settings))

    rc = climain.main(
        [
            "--settings", str(tmp_path / "settings.json"),
            "--simulation-settings", str(tmp_path / "sim.json"),
            "--results-dir", str(tmp_path / "results"),
            "--images-dir", str(tmp_path / "images"),
            "--doc-figures-dir", str(tmp_path / "docs"),
            "--collect-symbols", "256",
        ]
    )
    assert rc == 0
    df = pd.read_csv(tmp_path / "results" / "ber_results.csv")
    assert len(df) == 2
    imgs = os.listdir(tmp_path / "images" / "two_ray")
    assert any("SNR5_0dB" in f for f in imgs)
    assert any("BER_vs_SNR" in f for f in imgs)

    # --resume skips completed points.
    rc = climain.main(
        [
            "--settings", str(tmp_path / "settings.json"),
            "--simulation-settings", str(tmp_path / "sim.json"),
            "--results-dir", str(tmp_path / "results"),
            "--images-dir", str(tmp_path / "images"),
            "--doc-figures-dir", str(tmp_path / "docs"),
            "--resume",
        ]
    )
    assert rc == 0


def test_cli_missing_config_returns_error(tmp_path):
    from ofdm_tpu import main as climain

    rc = climain.main(["--simulation-settings", str(tmp_path / "nope.json")])
    assert rc == 1
