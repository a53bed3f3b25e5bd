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


def test_fused_link_matches_oracle_interpret():
    """The fused noise-bump campaign (_FusedLink: in-kernel colored noise +
    compensation + normalization, scanned chunks) reproduces the numpy
    replay of the emulator's deterministic chain — certifies the scan/acc
    wiring on top of the chunk oracle in test_pallas_link."""
    import jax
    import jax.numpy as jnp
    from ofdm_tpu.ops import cplx
    from ofdm_tpu.ops import mapping as mp

    fused = nb._FusedLink(2048, 64, 64, "Lin-Phoong_P2", chunk=1024, interpret=True)
    scenario = nb.SCENARIOS[1]
    profile = nb.create_noise_profile(64, scenario.noise_bump_db)
    snr = 20.0
    ber = fused.run_point(jax.random.PRNGKey(0), scenario, profile, snr)

    # numpy replay (see test_pallas_link.test_noise_bump_kernel_matches_oracle)
    h2 = np.abs(fused.runner.setup.h_freq) ** 2
    power = nb.scenario_power(scenario, h2, profile, snr)
    sqrt_power = np.sqrt(power).astype(np.float32)
    inv = sqrt_power.copy()
    inv[inv < 1e-10] = 1.0
    noise_std = np.sqrt(10 ** (-snr / 10) * profile / 2.0).astype(np.float32)
    const = mp.make_constellation("QAM", 64)
    p0 = complex(const.table[0])
    rad = np.float32(np.sqrt(-2.0 * np.log(np.float32(2.0**-24))))
    # MMSE at the kernel: data = (y*conj(h)) / (|h|^2 + nv) with nv from the
    # per-row mean |y|^2; y = sqrt_power * p0 * h (no channel noise).
    h = np.asarray(fused.runner.setup.h_freq, np.complex64)
    y = (sqrt_power * p0).astype(np.complex64) * h
    sp_mean = np.float32(np.mean(np.abs(y) ** 2))
    nv = sp_mean / np.float32(10 ** (snr / 10)) / np.float32(np.mean(h2))
    data = (y * np.conj(h)) / (h2.astype(np.float32) + nv)
    data = data + noise_std * rad
    data = data * (1.0 / inv)
    avg = np.float32(np.mean(np.abs(data) ** 2))
    data = np.where(avg > 1e-10, data / np.sqrt(avg), data)
    rx = np.asarray(
        mp.decode_hard_planar(
            cplx.CArray(
                jnp.asarray(data.real, jnp.float32)[None, :],
                jnp.asarray(data.imag, jnp.float32)[None, :],
            ),
            const,
        )
    )[0]
    expected_ber = sum(bin(int(x)).count("1") for x in rx) / (64 * 6)
    assert ber == pytest.approx(expected_ber, abs=1e-12)
