"""Configuration-layer tests: validators, enum coercion, JSON loading.

Mirrors the reference's configuration coverage (the pydantic validators at
configuration/models.py:119-151 and the settings fan-out tested in
tests/ofdm_based_systems/simulation/test_models.py:122-259).
"""

import dataclasses
import json
import os

import pytest

from ofdm_tpu.config import (
    AdaptiveModulationMode,
    ChannelType,
    ConstellationType,
    EqualizationMethod,
    ModulationType,
    NoiseType,
    PowerAllocationType,
    PrefixType,
    Settings,
    SimulationConfig,
)

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


# --- validators (reference configuration/models.py:119-151) ---------------


def test_num_bits_xor_num_symbols():
    with pytest.raises(ValueError, match="Either num_bits or num_symbols"):
        SimulationConfig()
    with pytest.raises(ValueError, match="Only one of"):
        SimulationConfig(num_bits=100, num_symbols=100)
    # each alone is fine
    SimulationConfig(num_bits=100)
    SimulationConfig(num_symbols=100)


def test_prefix_length_ratio_bounds():
    for ok in (0.0, 0.34, 1.0, 2.0):
        SimulationConfig(num_bits=8, prefix_length_ratio=ok)
    for bad in (-0.01, 2.01, 100.0):
        with pytest.raises(ValueError, match="prefix_length_ratio"):
            SimulationConfig(num_bits=8, prefix_length_ratio=bad)


def test_constellation_order_bounds_power_of_two():
    for ok in (2, 4, 64, 4096):
        SimulationConfig(num_bits=8, min_constellation_order=ok,
                         max_constellation_order=ok)
    with pytest.raises(ValueError, match="between 2 and 4096"):
        SimulationConfig(num_bits=8, min_constellation_order=1)
    with pytest.raises(ValueError, match="between 2 and 4096"):
        SimulationConfig(num_bits=8, max_constellation_order=8192)
    with pytest.raises(ValueError, match="power of 2"):
        SimulationConfig(num_bits=8, min_constellation_order=6)
    with pytest.raises(ValueError, match="power of 2"):
        SimulationConfig(num_bits=8, constellation_order=24)


def test_desired_ser_open_interval():
    SimulationConfig(num_bits=8, desired_symbol_error_rate=1e-6)
    SimulationConfig(num_bits=8, desired_symbol_error_rate=0.499)
    for bad in (0.0, 0.5, 0.7, -1e-3):
        with pytest.raises(ValueError, match="desired_symbol_error_rate"):
            SimulationConfig(num_bits=8, desired_symbol_error_rate=bad)


def test_num_subcarriers_positive():
    with pytest.raises(ValueError, match="num_subcarriers"):
        SimulationConfig(num_bits=8, num_subcarriers=0)


def test_matmul_passes_validation():
    SimulationConfig(num_bits=8, matmul_passes=1)
    SimulationConfig(num_bits=8, matmul_passes=3)
    SimulationConfig(num_bits=8, matmul_passes="auto")
    with pytest.raises(ValueError, match="matmul_passes"):
        SimulationConfig(num_bits=8, matmul_passes=2)


# --- enum coercion ----------------------------------------------------------


def test_enum_fields_accept_strings_by_value_and_name():
    c = SimulationConfig(
        num_bits=8,
        constellation_type="PSK",
        modulation_type="SC-OFDM",          # by value
        prefix_type="ZERO",
        equalization_method="ZF",
        noise_type="NONE",
        power_allocation_type="WATERFILLING",
        adaptive_modulation_mode="CAPACITY_BASED",
        channel_type="CUSTOM",
    )
    assert c.constellation_type is ConstellationType.PSK
    assert c.modulation_type is ModulationType.SC_OFDM
    assert c.prefix_type is PrefixType.ZERO
    assert c.equalization_method is EqualizationMethod.ZF
    assert c.noise_type is NoiseType.NONE
    assert c.power_allocation_type is PowerAllocationType.WATERFILLING
    assert c.adaptive_modulation_mode is AdaptiveModulationMode.CAPACITY_BASED
    assert c.channel_type is ChannelType.CUSTOM
    # by enum NAME too (SC_OFDM vs value "SC-OFDM")
    c2 = SimulationConfig(num_bits=8, modulation_type="SC_OFDM")
    assert c2.modulation_type is ModulationType.SC_OFDM


def test_enum_field_rejects_unknown_value():
    with pytest.raises(ValueError, match="constellation_type"):
        SimulationConfig(num_bits=8, constellation_type="APSK")


def test_config_is_frozen_and_hashable():
    c = SimulationConfig(num_bits=8)
    with pytest.raises(dataclasses.FrozenInstanceError):
        c.snr_db = 10.0
    assert hash(c) == hash(SimulationConfig(num_bits=8))
    assert c == SimulationConfig(num_bits=8)
    assert c != c.replace(snr_db=c.snr_db + 1)


# --- title/subtitle (reference simulation/models.py:435-442) ---------------


def test_title_subtitle_grammar():
    c = SimulationConfig(
        num_bits=8, prefix_type="CYCLIC", modulation_type="OFDM",
        equalization_method="MMSE", constellation_order=64,
        constellation_type="QAM", snr_db=30.0,
        power_allocation_type="UNIFORM",
    )
    assert c.title == "CP-OFDM-MMSE"
    assert c.subtitle == "64QAM-SNR30.0dB-UNIFORM"
    zp = c.replace(prefix_type=PrefixType.ZERO, equalization_method="ZF")
    assert zp.title == "ZP-OFDM-ZF"


# --- JSON loading (reference configuration/models.py:21-28, fan-out at
#     simulation/models.py:190-212) ------------------------------------------


def test_from_json_fans_out_per_snr(tmp_path):
    data = {
        "num_bands": 32,
        "num_bits": 4096,
        "constellation_order": 64,
        "constellation_type": "QAM",
        "modulation_type": "OFDM",
        "prefix_type": "CYCLIC",
        "prefix_length_ratio": 1.0,
        "equalization_method": "MMSE",
        "noise_type": "AWGN",
        "signal_noise_ratios": [0, 10, 20, 30],
        "an_unknown_future_key": 123,  # pydantic-style ignore
    }
    p = tmp_path / "settings.json"
    p.write_text(json.dumps(data))
    cfgs = SimulationConfig.from_json(str(p))
    assert len(cfgs) == 4
    assert [c.snr_db for c in cfgs] == [0.0, 10.0, 20.0, 30.0]
    assert all(c.num_subcarriers == 32 for c in cfgs)
    assert all(c.constellation_order == 64 for c in cfgs)
    # shared everything but snr
    assert len({c.replace(snr_db=0.0) for c in cfgs}) == 1


def test_from_json_custom_channel_path_only_when_custom(tmp_path):
    base = {"num_bits": 64, "signal_noise_ratios": [20],
            "channel_model_path": "config/channel_models/two_ray.npy"}
    p = tmp_path / "a.json"
    p.write_text(json.dumps({**base, "channel_type": "CUSTOM"}))
    (c,) = SimulationConfig.from_json(str(p))
    assert c.channel_type is ChannelType.CUSTOM
    assert c.channel_model.endswith("two_ray.npy")
    p.write_text(json.dumps({**base, "channel_type": "FLAT"}))
    (c,) = SimulationConfig.from_json(str(p))
    assert c.channel_model is None


def test_from_json_missing_file():
    with pytest.raises(FileNotFoundError):
        SimulationConfig.from_json("/nonexistent/settings.json")
    with pytest.raises(FileNotFoundError):
        Settings.from_json("/nonexistent/settings.json")


def test_settings_from_json_ignores_unknown_keys(tmp_path):
    p = tmp_path / "settings.json"
    p.write_text(json.dumps({"project_name": "x", "version": "1.0",
                             "debug": True, "extra": "ignored"}))
    s = Settings.from_json(str(p))
    assert (s.project_name, s.version, s.debug) == ("x", "1.0", True)
    assert "Debug Mode: True" in str(s)


def test_all_shipped_configs_load():
    cfg_dir = os.path.join(REPO, "config")
    names = [n for n in os.listdir(cfg_dir) if n.endswith(".json")
             and n != "settings.json"]
    assert len(names) >= 7
    for name in names:
        cfgs = SimulationConfig.from_json(os.path.join(cfg_dir, name))
        assert len(cfgs) >= 1


def test_bits_per_symbol():
    assert SimulationConfig(num_bits=8, constellation_order=2).bits_per_symbol == 1
    assert SimulationConfig(num_bits=8, constellation_order=64).bits_per_symbol == 6
    assert SimulationConfig(num_bits=8, constellation_order=4096).bits_per_symbol == 12
