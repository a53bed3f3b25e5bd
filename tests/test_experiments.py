"""Noise-bump experiment tests (BASELINE configs[3] reproduction)."""

import numpy as np
import pytest

from ofdm_tpu.experiments import noise_bump as nb


def test_noise_profile_shape():
    p = nb.create_noise_profile(64, 3.0)
    assert p.shape == (64,)
    np.testing.assert_allclose(p[:48], 1.0)
    np.testing.assert_allclose(p[48:], 10 ** 0.3)
    np.testing.assert_allclose(nb.create_noise_profile(64, 0.0), 1.0)


def test_scenario_power_floor_and_budget():
    gains = np.abs(np.random.RandomState(0).randn(64)) ** 2 + 1e-3
    prof = nb.create_noise_profile(64, 6.0)
    p = nb.scenario_power(nb.SCENARIOS[2], gains, prof, snr_db=10.0)
    assert np.all(p >= 1e-4 / 2)  # floor applied before renormalization
    np.testing.assert_allclose(p.sum(), 1.0, atol=1e-12)
    u = nb.scenario_power(nb.SCENARIOS[0], gains, prof, snr_db=10.0)
    np.testing.assert_allclose(u, 1.0 / 64)


def test_experiment_matches_reference_curves(tmp_path):
    """BER curves statistically match the reference experiment's.

    Reference values measured from /root/reference's
    examples/waterfilling_noise_bump_experiment.py pipeline at B=512 OFDM
    symbols, SNR {0, 15, 30} dB (seed 42): see commit history.
    """
    res = nb.run_noise_bump_experiment(
        snr_values=(0.0, 15.0, 30.0),
        num_ofdm_symbols=512,
        results_dir=str(tmp_path),
        save_plots=False,
    )
    expected = {
        "Baseline (Uniform Power, +3 dB bump)": [0.4868, 0.4078, 0.1495],
        "Water-filling (+3 dB noise bump)": [0.4907, 0.4367, 0.1578],
        "Water-filling (+6 dB noise bump)": [0.4913, 0.4404, 0.1727],
    }
    for name, ref in expected.items():
        ours = res[name]
        for a, b in zip(ours, ref):
            assert abs(a - b) < 0.02, (name, ours, ref)
    # CSVs were written per scenario.
    assert (tmp_path / "ber_uniform_waterfilling_study.csv").exists()
    assert (tmp_path / "ber_wf_plus6_waterfilling_study.csv").exists()


def test_experiment_plots(tmp_path):
    nb.run_noise_bump_experiment(
        snr_values=(10.0,),
        num_ofdm_symbols=64,
        output_dir=str(tmp_path / "imgs"),
        results_dir=str(tmp_path / "res"),
        save_plots=True,
    )
    assert (tmp_path / "imgs" / "CP-OFDM-WF-3dB" / "CP-OFDM-WF-3dB-SNR10dB.png").exists()
    assert (tmp_path / "imgs" / "CP-OFDM-waterfilling-ber-comparison.png").exists()
