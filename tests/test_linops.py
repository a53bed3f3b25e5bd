"""Matmul-form link operator tests: exact equivalence with the generic ops."""

import jax
import numpy as np
import pytest

from ofdm_tpu.config import (
    ChannelType,
    ConstellationType,
    EqualizationMethod,
    ModulationType,
    NoiseType,
    PrefixType,
    SimulationConfig,
)
from ofdm_tpu.ops import channel as ch
from ofdm_tpu.ops import cplx
from ofdm_tpu.ops import linops
from ofdm_tpu import pipeline as pl


def _rand(rng, *shape):
    return rng.randn(*shape) + 1j * rng.randn(*shape)


@pytest.mark.parametrize("K", [1, 2, 4, 8])
def test_toeplitz_convolve_matches_stream(K):
    rng = np.random.RandomState(K)
    T, B = 20, 9
    taps = _rand(rng, K)
    x = _rand(rng, B, T)
    t0, t1 = linops.conv_matrices(taps, T)
    t0j = (np.float32(t0.real), np.float32(t0.imag))
    t1j = (np.float32(t1.real), np.float32(t1.imag))
    import jax.numpy as jnp

    out, carry = linops.convolve(
        cplx.from_complex(x),
        (jnp.asarray(t0j[0]), jnp.asarray(t0j[1])),
        (jnp.asarray(t1j[0]), jnp.asarray(t1j[1])),
    )
    expected = np.convolve(x.reshape(-1), taps, mode="full")[: x.size].reshape(B, T)
    np.testing.assert_allclose(cplx.to_numpy(out), expected, atol=1e-4)
    np.testing.assert_allclose(cplx.to_numpy(carry), x[-1], atol=1e-6)


def test_toeplitz_convolve_chunked_carry():
    rng = np.random.RandomState(42)
    import jax.numpy as jnp

    taps = _rand(rng, 5)
    T = 16
    x = _rand(rng, 12, T)
    t0, t1 = linops.conv_matrices(taps, T)
    t0j = (jnp.asarray(t0.real, jnp.float32), jnp.asarray(t0.imag, jnp.float32))
    t1j = (jnp.asarray(t1.real, jnp.float32), jnp.asarray(t1.imag, jnp.float32))
    outs, carry = [], None
    for chunk in np.split(x, 4):
        o, carry = linops.convolve(cplx.from_complex(chunk), t0j, t1j, carry)
        outs.append(cplx.to_numpy(o))
    expected = np.convolve(x.reshape(-1), taps, "full")[: x.size].reshape(x.shape)
    np.testing.assert_allclose(np.concatenate(outs), expected, atol=1e-4)


@pytest.mark.parametrize(
    "prefix,L,modulation",
    [
        (PrefixType.CYCLIC, 4, ModulationType.OFDM),
        (PrefixType.ZERO, 4, ModulationType.OFDM),
        (PrefixType.NONE, 0, ModulationType.OFDM),
        (PrefixType.CYCLIC, 3, ModulationType.SC_OFDM),
    ],
)
def test_modulate_demodulate_match_generic(prefix, L, modulation):
    from ofdm_tpu.ops import ofdm

    rng = np.random.RandomState(7)
    n = 32
    X = cplx.from_complex(_rand(rng, 6, n))
    if modulation == ModulationType.OFDM:
        expected_blocks = ofdm.ofdm_modulate(X, n, prefix, L)
    else:
        expected_blocks = ofdm.sc_modulate(X, prefix, L)
    blocks = linops.modulate(X, n, prefix, L, modulation)
    np.testing.assert_allclose(
        cplx.to_numpy(blocks), cplx.to_numpy(expected_blocks), atol=2e-5
    )

    y = cplx.from_complex(_rand(rng, 6, n + L))
    expected_freq = ofdm.ofdm_demodulate_to_freq(y, n, prefix, L)
    freq = linops.demodulate(y, n, prefix, L)
    np.testing.assert_allclose(
        cplx.to_numpy(freq), cplx.to_numpy(expected_freq), atol=2e-5
    )


def _cfg(**kw):
    base = dict(
        num_symbols=64 * 500,
        num_subcarriers=64,
        constellation_order=16,
        channel_type=ChannelType.CUSTOM,
        channel_model="default_multipath",
        prefix_type=PrefixType.CYCLIC,
        prefix_length_ratio=1.0,
        equalization_method=EqualizationMethod.MMSE,
        snr_db=18.0,
        engine="planar",
    )
    base.update(kw)
    return SimulationConfig(**base)


@pytest.mark.parametrize(
    "kw",
    [
        dict(noise_type=NoiseType.NONE),
        dict(noise_type=NoiseType.NONE, prefix_type=PrefixType.ZERO),
        dict(noise_type=NoiseType.NONE, modulation_type=ModulationType.SC_OFDM),
        dict(
            noise_type=NoiseType.NONE,
            constellation_order=8,
            constellation_type=ConstellationType.PSK,
            channel_model="flat_fading",
        ),
    ],
)
def test_matmul_chunk_exactly_matches_generic(kw):
    """Same PRNG draws + no noise: error counts must be identical."""
    r_mm = pl.simulate(_cfg(hotpath="matmul", **kw), jax.random.PRNGKey(3))
    r_gen = pl.simulate(_cfg(hotpath="generic", **kw), jax.random.PRNGKey(3))
    assert r_mm["bit_errors"] == r_gen["bit_errors"]
    assert r_mm["symbol_errors"] == r_gen["symbol_errors"]
    assert abs(r_mm["papr_db"] - r_gen["papr_db"]) < 1e-3


def test_matmul_chunk_with_noise_statistical():
    r_mm = pl.simulate(_cfg(hotpath="matmul"), jax.random.PRNGKey(3))
    r_gen = pl.simulate(_cfg(hotpath="generic"), jax.random.PRNGKey(3))
    # Identical PRNG usage order -> identical noise draws; tiny f32 drift only.
    assert abs(r_mm["bit_error_rate"] - r_gen["bit_error_rate"]) < 0.005


def test_matmul_chunked_carry_exact():
    cfg = _cfg(hotpath="matmul", noise_type=NoiseType.NONE, symbols_per_chunk=111)
    r = pl.simulate(cfg, jax.random.PRNGKey(0))
    assert r["bit_error_rate"] == 0.0


def test_matmul_adaptive_mode():
    from ofdm_tpu.config import AdaptiveModulationMode, PowerAllocationType

    cfg = _cfg(
        num_symbols=None,
        num_bits=100_000,
        power_allocation_type=PowerAllocationType.WATERFILLING,
        adaptive_modulation_mode=AdaptiveModulationMode.CAPACITY_BASED,
        snr_db=20.0,
        hotpath="matmul",
    )
    r = pl.simulate(cfg, jax.random.PRNGKey(0))
    assert 0.0 <= r["bit_error_rate"] < 0.01


@pytest.mark.parametrize("K", [1, 2, 4, 8])
def test_merged_conv_matrix_matches_stream(K):
    """[x[b] | tail(x[b-1])] @ C equals the truncated stream convolution
    (channel/models.py:46-62 semantics), for any tap count."""
    rng = np.random.RandomState(100 + K)
    T, B = 20, 9
    taps = _rand(rng, K)
    x = _rand(rng, B, T)
    E = linops.ext_width(K, T)
    C = linops.conv_matrix_merged(taps, T)
    assert C.shape == (T + E, T)
    prev = np.vstack([np.zeros((1, T), np.complex128), x[:-1]])
    act = np.concatenate([x, prev[:, T - E:]], axis=1) if E else x
    out = act @ C
    expected = np.convolve(x.reshape(-1), taps, mode="full")[: x.size].reshape(B, T)
    np.testing.assert_allclose(out, expected, atol=1e-10)


@pytest.mark.parametrize("K", [1, 3, 6])
def test_convolve_banded_matches_dense(K):
    """The (E, T) ISI-band form equals the dense two-matmul form.

    T1's only nonzero rows are its last E = K-1 (the previous block's tail
    is all that spills into the current block), so contracting just the
    tail lanes is the same linear map — the form the pipeline hot path uses
    at wide links (pipeline._constants / linops.convolve ext)."""
    import jax.numpy as jnp

    rng = np.random.RandomState(100 + K)
    T, B = 24, 7
    taps = _rand(rng, K)
    x = _rand(rng, B, T)
    carry = _rand(rng, T)
    t0, t1 = linops.conv_matrices(taps, T)
    E = linops.ext_width(K, T)
    band = t1[T - E :, :] if E else t1[:0, :]

    def j(m):
        return (jnp.asarray(np.float32(m.real)), jnp.asarray(np.float32(m.imag)))

    xp = cplx.from_complex(x)
    cp = cplx.from_complex(carry)
    dense, carry_d = linops.convolve(xp, j(t0), j(t1), cp)
    banded, carry_b = linops.convolve(xp, j(t0), j(band), cp, ext=E)
    np.testing.assert_allclose(cplx.to_numpy(banded), cplx.to_numpy(dense), atol=1e-5)
    np.testing.assert_allclose(cplx.to_numpy(carry_b), cplx.to_numpy(carry_d))
