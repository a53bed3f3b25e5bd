"""Examples + asset smoke tests: every shipped script runs end to end."""

import json
import os
import runpy
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_config_assets_load():
    from ofdm_tpu.config import Settings, SimulationConfig

    s = Settings.from_json(os.path.join(REPO, "config/settings.json"))
    assert s.project_name
    for name in (
        "simulation_settings.json",
        "simulation_settings_adaptive.json",
        "simulation_settings_waterfilling.json",
        "simulation_settings_custom_channel.json",
        "simulation_settings_fixed_waterfilling.json",
        "simulation_settings_test.json",
        "simulation_settings_pod_scale.json",
    ):
        cfgs = SimulationConfig.from_json(os.path.join(REPO, "config", name))
        assert len(cfgs) >= 1, name


def test_channel_npy_assets_match_builtin():
    from ofdm_tpu.models import channels as chm

    for name in chm.list_channels():
        path = os.path.join(REPO, "config/channel_models", f"{name}.npy")
        assert os.path.exists(path), path
        np.testing.assert_allclose(np.load(path), chm.get_channel(name))


def test_reference_config_files_parse():
    """Our loader accepts the reference's own JSON settings files."""
    from ofdm_tpu.config import SimulationConfig

    ref_cfg = "/root/reference/config"
    if not os.path.isdir(ref_cfg):
        pytest.skip("reference tree not mounted")
    for name in os.listdir(ref_cfg):
        if name.endswith(".json") and name != "settings.json":
            cfgs = SimulationConfig.from_json(os.path.join(ref_cfg, name))
            assert len(cfgs) >= 1, name


def test_plot_constellations_cli(tmp_path):
    sys.path.insert(0, REPO)
    from plot_constellations import plot_constellation

    out = plot_constellation("QAM", 16, str(tmp_path / "c.png"))
    assert os.path.exists(out)
    out = plot_constellation("PSK", 8, str(tmp_path / "p.png"))
    assert os.path.exists(out)


@pytest.mark.parametrize(
    "script",
    ["generate_channel_models", "waterfilling_demo", "plot_waterfilling_diagram"],
)
def test_light_examples_run(script, tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    os.makedirs("config/channel_models", exist_ok=True)
    runpy.run_path(os.path.join(REPO, "examples", f"{script}.py"), run_name="__main__")


def test_bit_loading_walkthrough_runs(tmp_path, monkeypatch):
    """The notebook's script form runs end to end and hits its design SER."""
    import matplotlib

    matplotlib.use("Agg")
    monkeypatch.setattr(
        sys,
        "argv",
        [
            "bit_loading_walkthrough.py",
            "--num-ofdm-symbols",
            "64",
            "--out",
            str(tmp_path),
        ],
    )
    runpy.run_path(
        os.path.join(REPO, "examples", "bit_loading_walkthrough.py"),
        run_name="__main__",
    )
    assert os.path.exists(tmp_path / "bit_loading_constellation.png")
    assert os.path.exists(tmp_path / "bit_loading_water_level.png")


def test_bit_loading_notebook_cells_execute():
    """notebook/bit_loading.ipynb stays honest: every code cell executes
    in order and the final metrics land near the gap-function design SER."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    with open(os.path.join(REPO, "notebook", "bit_loading.ipynb")) as f:
        nb = json.load(f)
    ns: dict = {}
    try:
        for cell in nb["cells"]:
            if cell["cell_type"] != "code":
                continue
            exec(compile("".join(cell["source"]), "bit_loading.ipynb", "exec"), ns)
    finally:
        plt.close("all")
    # The notebook's design target is SER 1e-3; 156 OFDM symbols of a
    # ~30-subcarrier-wide adaptive layout give a few thousand symbol
    # draws, so allow a generous Monte-Carlo band.
    assert 0.0 <= ns["ser"] < 2e-2
    assert ns["ber"] < ns["ser"] or ns["ser"] == 0.0
    assert ns["mapper"].bits_per_ofdm_symbol > 0
