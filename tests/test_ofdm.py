"""OFDM core tests: prefix semantics, round trips, reference parity.

Mirrors reference test themes from tests/ofdm_based_systems/{prefix,
modulation}/test_models.py: CP/ZP add/remove semantics, IFFT orthogonality and
power preservation, OFDM and SC-FDE round trips, ZP circular-convolution
equivalence.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ofdm_tpu.config import PrefixType
from ofdm_tpu.ops import ofdm

from conftest import has_reference


def _rand_blocks(rng, b, n):
    return jnp.asarray(rng.randn(b, n) + 1j * rng.randn(b, n))


def test_cyclic_prefix_add_remove():
    rng = np.random.RandomState(0)
    x = _rand_blocks(rng, 4, 16)
    y = ofdm.add_prefix(x, PrefixType.CYCLIC, 5)
    assert y.shape == (4, 21)
    np.testing.assert_allclose(np.asarray(y[:, :5]), np.asarray(x[:, -5:]))
    np.testing.assert_allclose(np.asarray(y[:, 5:]), np.asarray(x))
    back = ofdm.remove_prefix(y, PrefixType.CYCLIC, 5)
    np.testing.assert_allclose(np.asarray(back), np.asarray(x))


def test_zero_padding_add_remove_overlap_add():
    rng = np.random.RandomState(1)
    x = _rand_blocks(rng, 3, 8)
    y = ofdm.add_prefix(x, PrefixType.ZERO, 3)
    assert y.shape == (3, 11)
    np.testing.assert_allclose(np.asarray(y[:, 8:]), 0)
    # Simulate ISI spill into the ZP tail, then overlap-add restoration.
    y = y.at[:, 8:].set(jnp.asarray(rng.randn(3, 3)))
    restored = ofdm.remove_prefix(y, PrefixType.ZERO, 3)
    expected = np.asarray(y[:, :8]).copy()
    expected[:, :3] += np.asarray(y[:, 8:])
    np.testing.assert_allclose(np.asarray(restored), expected)


@pytest.mark.skipif(not has_reference(), reason="reference tree not mounted")
def test_zp_removal_matches_reference_matrix():
    """Our O(N) overlap-add equals the reference's dense-matrix removal."""
    from ofdm_based_systems.prefix.models import ZeroPaddingPrefixScheme

    rng = np.random.RandomState(2)
    row = rng.randn(24) + 1j * rng.randn(24)
    ref = ZeroPaddingPrefixScheme(prefix_length=6).remove_prefix(row)
    ours = ofdm.remove_prefix(jnp.asarray(row)[None, :], PrefixType.ZERO, 6)[0]
    np.testing.assert_allclose(np.asarray(ours), ref, atol=1e-12)


def test_no_prefix_identity():
    rng = np.random.RandomState(3)
    x = _rand_blocks(rng, 2, 8)
    assert ofdm.add_prefix(x, PrefixType.NONE, 4) is x
    assert ofdm.remove_prefix(x, PrefixType.NONE, 4) is x
    assert ofdm.add_prefix(x, PrefixType.CYCLIC, 0) is x


def test_ifft_ortho_power_preservation():
    rng = np.random.RandomState(4)
    x = _rand_blocks(rng, 8, 64)
    t = ofdm.ifft_ortho(x, 64)
    np.testing.assert_allclose(
        np.sum(np.abs(np.asarray(t)) ** 2), np.sum(np.abs(np.asarray(x)) ** 2), rtol=1e-10
    )
    back = ofdm.fft_ortho(t, 64)
    np.testing.assert_allclose(np.asarray(back), np.asarray(x), atol=1e-12)


@pytest.mark.parametrize("prefix_type,plen", [(PrefixType.CYCLIC, 4), (PrefixType.ZERO, 4), (PrefixType.NONE, 0)])
def test_ofdm_modulate_demodulate_round_trip(prefix_type, plen):
    rng = np.random.RandomState(5)
    x = _rand_blocks(rng, 16, 32)
    tx = ofdm.ofdm_modulate(x, 32, prefix_type, plen)
    rx = ofdm.ofdm_demodulate_to_freq(tx, 32, prefix_type, plen)
    np.testing.assert_allclose(np.asarray(rx), np.asarray(x), atol=1e-10)


def test_cp_circular_convolution_equivalence():
    """CP over a multipath channel turns linear conv into circular conv:
    after prefix removal and FFT, rx = H * tx exactly (no noise)."""
    from ofdm_tpu.ops import channel as ch

    rng = np.random.RandomState(6)
    n, L = 64, 8
    h = rng.randn(4) + 1j * rng.randn(4)
    x = _rand_blocks(rng, 10, n)
    tx = ofdm.ofdm_modulate(x, n, PrefixType.CYCLIC, L)
    rx_blocks, _ = ch.convolve_blocks(tx, jnp.asarray(h))
    rx_freq = ofdm.ofdm_demodulate_to_freq(rx_blocks, n, PrefixType.CYCLIC, L)
    H = np.fft.fft(h, n)
    # Block 0's CP absorbs "missing" pre-stream history only if the stream
    # starts with zeros; blocks >= 1 see the true ISI, which CP removes.
    np.testing.assert_allclose(np.asarray(rx_freq[1:]), np.asarray(x[1:]) * H, atol=1e-9)


def test_zp_circular_convolution_equivalence():
    """ZP + overlap-add also restores circular convolution (prefix test :622)."""
    from ofdm_tpu.ops import channel as ch

    rng = np.random.RandomState(7)
    n, L = 32, 6
    h = rng.randn(5) + 1j * rng.randn(5)
    x = _rand_blocks(rng, 6, n)
    tx = ofdm.ofdm_modulate(x, n, PrefixType.ZERO, L)
    rx_blocks, _ = ch.convolve_blocks(tx, jnp.asarray(h))
    rx_freq = ofdm.ofdm_demodulate_to_freq(rx_blocks, n, PrefixType.ZERO, L)
    H = np.fft.fft(h, n)
    np.testing.assert_allclose(np.asarray(rx_freq), np.asarray(x) * H, atol=1e-9)


def test_sc_fde_round_trip_flat_channel():
    rng = np.random.RandomState(8)
    n = 16
    x = _rand_blocks(rng, 4, n)
    tx = ofdm.sc_modulate(x, PrefixType.CYCLIC, 3)
    freq = ofdm.ofdm_demodulate_to_freq(tx, n, PrefixType.CYCLIC, 3)
    out = ofdm.sc_demodulate_from_freq(freq, n)
    np.testing.assert_allclose(np.asarray(out), np.asarray(x), atol=1e-10)


def test_ct_constants_cache_is_trace_safe():
    """dft._ct_constants must cache HOST arrays: a cache entry populated
    inside one jit trace must not leak tracers into a later trace
    (regression: a second XLA-path runner's scan crashed with
    UnexpectedTracerError after another runner populated the cache)."""
    from ofdm_tpu.ops import cplx, dft

    dft._ct_constants.cache_clear()
    n = 512
    x = cplx.CArray(
        jnp.asarray(np.random.default_rng(0).normal(size=(4, n)), jnp.float32),
        jnp.zeros((4, n), jnp.float32),
    )

    @jax.jit
    def f1(a):
        return dft.ifft_ortho(a, n).re.sum()

    @jax.jit
    def f2(a):
        return dft.fft_ortho(dft.ifft_ortho(a, n), n).im.sum()

    f1(x)  # populates the cache inside f1's trace
    f2(x)  # must not see f1's tracers
    for c in dft._ct_constants(n, True)[2:]:
        assert isinstance(c, np.ndarray)
