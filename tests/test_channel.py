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
