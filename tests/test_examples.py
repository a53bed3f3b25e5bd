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
