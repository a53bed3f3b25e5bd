"""Channel + noise tests: stream-convolution equivalence, SNR consistency.

Mirrors reference themes from tests/ofdm_based_systems/channel/test_models.py
(unit-energy normalization, transmit length preservation, empirical SNR ~
requested) and validates the blocked/chunked convolution against
np.convolve-the-whole-stream semantics bit-for-bit.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ofdm_tpu.models import channels as chm
from ofdm_tpu.ops import channel as ch


@pytest.mark.parametrize("taps", [1, 2, 4, 8])
@pytest.mark.parametrize("shape", [(1, 16), (7, 16), (5, 71)])
def test_convolve_blocks_matches_stream_convolution(taps, shape):
    rng = np.random.RandomState(taps * 100 + shape[0])
    h = rng.randn(taps) + 1j * rng.randn(taps)
    x = rng.randn(*shape) + 1j * rng.randn(*shape)
    expected = np.convolve(x.reshape(-1), h, mode="full")[: x.size].reshape(shape)
    out, carry = ch.convolve_blocks(jnp.asarray(x), jnp.asarray(h))
    np.testing.assert_allclose(np.asarray(out), expected, atol=1e-12)
    # Carry equals the dropped global tail.
    full_tail = np.convolve(x.reshape(-1), h, mode="full")[x.size :]
    np.testing.assert_allclose(np.asarray(carry), full_tail, atol=1e-12)


def test_convolve_blocks_chunked_carry_is_exact():
    """Chunked convolution with carry == one-shot stream convolution."""
    rng = np.random.RandomState(42)
    h = jnp.asarray(rng.randn(6) + 1j * rng.randn(6))
    x = rng.randn(12, 32) + 1j * rng.randn(12, 32)
    expected = np.convolve(x.reshape(-1), np.asarray(h), mode="full")[: x.size].reshape(x.shape)

    carry = None
    outs = []
    for chunk in np.split(x, 4, axis=0):
        out, carry = ch.convolve_blocks(jnp.asarray(chunk), h, carry)
        outs.append(np.asarray(out))
    np.testing.assert_allclose(np.concatenate(outs), expected, atol=1e-12)


def test_convolve_rejects_too_short_blocks():
    with pytest.raises(ValueError):
        ch.convolve_blocks(jnp.zeros((2, 3), jnp.complex64), jnp.zeros(5, jnp.complex64))


def test_awgn_empirical_snr():
    """Measured SNR of the noisy signal ~ requested (channel test :319)."""
    key = jax.random.PRNGKey(0)
    rng = np.random.RandomState(0)
    sig = jnp.asarray((rng.randn(200_000) + 1j * rng.randn(200_000)) / np.sqrt(2), jnp.complex64)
    for snr_db in (0.0, 10.0, 20.0):
        noisy = ch.awgn(key, sig, snr_db)
        noise = np.asarray(noisy) - np.asarray(sig)
        snr_meas = 10 * np.log10(
            np.mean(np.abs(np.asarray(sig)) ** 2) / np.mean(np.abs(noise) ** 2)
        )
        assert abs(snr_meas - snr_db) < 0.1


def test_awgn_noise_power_uses_measured_signal_power():
    """Noise power scales with the *measured* signal power (noise/models.py:14-16)."""
    key = jax.random.PRNGKey(1)
    big = 3.0 * jnp.ones(100_000, jnp.complex64)
    noisy = ch.awgn(key, big, 10.0)
    noise_power = np.mean(np.abs(np.asarray(noisy - big)) ** 2)
    np.testing.assert_allclose(noise_power, 9.0 / 10.0, rtol=0.05)


def test_transmit_no_noise_passthrough():
    rng = np.random.RandomState(3)
    h = jnp.asarray(chm.normalize_impulse_response(rng.randn(4) + 1j * rng.randn(4)))
    x = jnp.asarray(rng.randn(4, 16) + 1j * rng.randn(4, 16))
    out, _ = ch.transmit(jax.random.PRNGKey(0), x, h, snr_db=10.0, add_noise=False)
    conv, _ = ch.convolve_blocks(x, h)
    np.testing.assert_allclose(np.asarray(out), np.asarray(conv))


def test_channel_model_library():
    assert set(chm.list_channels()) == {
        "Lin-Phoong_P1",
        "Lin-Phoong_P2",
        "default_multipath",
        "flat_fading",
        "rayleigh_fading",
        "severe_multipath",
        "two_ray",
    }
    for name in chm.list_channels():
        h = chm.get_channel(name)
        assert h.ndim == 1 and h.dtype == np.complex128
    # Unit-energy normalization preserves phase (channel tests).
    h = chm.normalize_impulse_response(np.array([3.0 + 4.0j]))
    np.testing.assert_allclose(abs(h[0]), 1.0)
    np.testing.assert_allclose(np.angle(h[0]), np.angle(3 + 4j))


@pytest.mark.skipif(
    not __import__("conftest").has_reference(), reason="reference tree not mounted"
)
def test_channel_assets_match_reference():
    for name in chm.list_channels():
        ref = np.load(f"/root/reference/config/channel_models/{name}.npy")
        np.testing.assert_allclose(chm.get_channel(name), ref, atol=1e-8)


def test_channel_order_and_gains():
    h = chm.get_channel("default_multipath")
    assert chm.channel_order(h) == 3
    H = chm.channel_frequency_response(h, 64)
    np.testing.assert_allclose(chm.channel_gains(h, 64), np.abs(H) ** 2)
    np.testing.assert_allclose(H, np.fft.fft(h, 64))


# ---------------------------------------------------------------------------
# Validation + extreme-input clusters mirroring the reference's
# channel/test_models.py TestChannelModelInitialization / TestEdgeCases
# ---------------------------------------------------------------------------


def test_zero_impulse_response_raises():
    """All-zero IR must be rejected at normalization (channel/test_models.py:
    test_init_with_zero_impulse_response_raises_error)."""
    with pytest.raises(ValueError):
        chm.normalize_impulse_response(np.zeros(4, dtype=np.complex128))


def test_normalize_preserves_phase():
    """Unit-energy scaling is a positive real scalar: phases untouched
    (channel/test_models.py TestNormalizeImpulseResponse)."""
    h = np.array([1 + 1j, 0.5 - 0.25j, -0.3j], dtype=np.complex128)
    hn = chm.normalize_impulse_response(h)
    np.testing.assert_allclose(np.sum(np.abs(hn) ** 2), 1.0, atol=1e-12)
    np.testing.assert_allclose(np.angle(hn), np.angle(h), atol=1e-12)
    hn2 = chm.normalize_impulse_response(hn)
    np.testing.assert_allclose(hn2, hn, atol=1e-15)  # idempotent


def test_very_long_impulse_response_stream_conv():
    """64-tap IR (channel/test_models.py test_very_long_impulse_response):
    blocked convolution still equals the truncated whole-stream form."""
    rng = np.random.default_rng(7)
    taps = rng.normal(size=64) + 1j * rng.normal(size=64)
    taps = chm.normalize_impulse_response(taps)
    x = rng.normal(size=(6, 80)) + 1j * rng.normal(size=(6, 80))
    out, _ = ch.convolve_blocks(jnp.asarray(x), jnp.asarray(taps))
    want = np.convolve(x.ravel(), taps, mode="full")[: x.size].reshape(x.shape)
    np.testing.assert_allclose(np.asarray(out), want, atol=1e-10)


def test_transmit_zero_signal():
    """A zero input stream convolves to zero; AWGN then adds noise scaled
    off the measured (zero) power — i.e. output stays exactly zero
    (channel/test_models.py test_transmit_with_zero_signal semantics)."""
    taps = jnp.asarray(chm.get_channel("Lin-Phoong_P1"))
    z = jnp.zeros((4, 16), dtype=jnp.complex128)
    out, _ = ch.transmit(jax.random.PRNGKey(0), z, taps, snr_db=20.0)
    np.testing.assert_allclose(np.asarray(out), 0.0, atol=1e-12)


@pytest.mark.parametrize("snr_db", [-20.0, 0.0, 60.0])
def test_transmit_extreme_snr_values(snr_db):
    """Extreme SNRs stay finite and scale sanely (channel/test_models.py
    test_extreme_snr_values)."""
    rng = np.random.default_rng(3)
    x = rng.normal(size=(64, 32)) + 1j * rng.normal(size=(64, 32))
    taps = jnp.asarray(chm.get_channel("two_ray"))
    out, _ = ch.transmit(jax.random.PRNGKey(1), jnp.asarray(x), taps, snr_db)
    out = np.asarray(out)
    assert np.all(np.isfinite(out))
    clean, _ = ch.transmit(
        jax.random.PRNGKey(1), jnp.asarray(x), taps, snr_db, add_noise=False
    )
    noise_power = np.mean(np.abs(out - np.asarray(clean)) ** 2)
    signal_power = np.mean(np.abs(np.asarray(clean)) ** 2)
    want = signal_power * 10 ** (-snr_db / 10.0)
    assert 0.8 * want < noise_power < 1.25 * want


def test_frequency_response_different_fft_sizes():
    """H(n_fft) agrees with the analytic DTFT sample at every size
    (channel/test_models.py TestGetFrequencyResponse)."""
    taps = chm.normalize_impulse_response(chm.get_channel("Lin-Phoong_P2"))
    for n_fft in (8, 64, 128, 1024):
        H = chm.channel_frequency_response(taps, n_fft)
        assert H.shape == (n_fft,)
        k = np.arange(n_fft)
        want = sum(
            taps[t] * np.exp(-2j * np.pi * t * k / n_fft)
            for t in range(len(taps))
        )
        np.testing.assert_allclose(H, want, atol=1e-12)
        np.testing.assert_allclose(
            chm.channel_gains(taps, n_fft), np.abs(H) ** 2, atol=1e-12
        )


def test_power_normalization_across_multiple_transmissions():
    """Unit-energy taps keep the long-run output power equal to the input
    power across repeated transmissions (channel/test_models.py
    test_power_normalization_across_multiple_transmissions)."""
    rng = np.random.default_rng(11)
    taps = jnp.asarray(chm.normalize_impulse_response(chm.get_channel("severe_multipath")))
    carry = None
    in_p = out_p = 0.0
    for _ in range(5):
        x = rng.normal(size=(64, 40)) + 1j * rng.normal(size=(64, 40))
        y, carry = ch.convolve_blocks(jnp.asarray(x), taps, carry)
        in_p += float(np.sum(np.abs(x) ** 2))
        out_p += float(np.sum(np.abs(np.asarray(y)) ** 2))
    assert abs(out_p / in_p - 1.0) < 0.05  # unit-energy channel, large N
