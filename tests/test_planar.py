"""Planar-engine tests: CArray math, MXU DFT, gather-free mapping parity.

The planar engine is the TPU hot path (the target backend has no native
complex/FFT/gather/argmax); these tests pin it to the complex engine on CPU:
same tables, same indices, same BER statistics.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ofdm_tpu.config import (
    ChannelType,
    ConstellationType,
    EqualizationMethod,
    ModulationType,
    PrefixType,
    SimulationConfig,
)
from ofdm_tpu.ops import adaptive as ad
from ofdm_tpu.ops import channel as ch
from ofdm_tpu.ops import cplx
from ofdm_tpu.ops import dft
from ofdm_tpu.ops import equalize as eq
from ofdm_tpu.ops import mapping as mp
from ofdm_tpu import pipeline as pl


def _rand_c(rng, *shape):
    return rng.randn(*shape) + 1j * rng.randn(*shape)


# ---------------------------------------------------------------------------
# CArray arithmetic
# ---------------------------------------------------------------------------


def test_carray_arithmetic_matches_numpy():
    rng = np.random.RandomState(0)
    a = _rand_c(rng, 4, 8)
    b = _rand_c(rng, 4, 8)
    ca, cb = cplx.from_complex(a), cplx.from_complex(b)
    np.testing.assert_allclose(cplx.to_numpy(ca + cb), a + b, atol=1e-6)
    np.testing.assert_allclose(cplx.to_numpy(ca - cb), a - b, atol=1e-6)
    np.testing.assert_allclose(cplx.to_numpy(ca * cb), a * b, atol=1e-5)
    np.testing.assert_allclose(cplx.to_numpy(ca / cb), a / b, atol=1e-5)
    np.testing.assert_allclose(cplx.to_numpy(ca.conj()), a.conj(), atol=1e-6)
    np.testing.assert_allclose(np.asarray(ca.abs2()), np.abs(a) ** 2, atol=1e-5)
    np.testing.assert_allclose(cplx.to_numpy(2.0 * ca), 2 * a, atol=1e-6)
    np.testing.assert_allclose(cplx.to_numpy(ca[1:, :3]), a[1:, :3], atol=1e-6)
    np.testing.assert_allclose(cplx.to_numpy(ca.reshape(8, 4)), a.reshape(8, 4), atol=1e-6)


def test_carray_is_pytree():
    x = cplx.from_complex(np.ones(4, dtype=np.complex64))
    y = jax.jit(lambda v: v * v)(x)
    np.testing.assert_allclose(cplx.to_numpy(y), np.ones(4), atol=1e-6)


# ---------------------------------------------------------------------------
# MXU DFT
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("n", [16, 64, 128, 1024])
def test_planar_dft_matches_fft(n):
    rng = np.random.RandomState(n)
    x = _rand_c(rng, 10, n)
    cx = cplx.from_complex(x)
    fwd = cplx.to_numpy(dft.fft_ortho(cx, n))
    np.testing.assert_allclose(fwd, np.fft.fft(x, axis=-1, norm="ortho"), atol=2e-4)
    inv = cplx.to_numpy(dft.ifft_ortho(cx, n))
    np.testing.assert_allclose(inv, np.fft.ifft(x, axis=-1, norm="ortho"), atol=2e-4)
    # Round trip
    rt = cplx.to_numpy(dft.fft_ortho(dft.ifft_ortho(cx, n), n))
    np.testing.assert_allclose(rt, x, atol=5e-4)


def test_dot3_split_recovers_f32_precision():
    rng = np.random.RandomState(1)
    a = jnp.asarray(rng.randn(64, 64), jnp.float32)
    b = jnp.asarray(rng.randn(64, 64), jnp.float32)
    out = np.asarray(jax.jit(cplx.dot3)(a, b))
    exact = np.asarray(a, np.float64) @ np.asarray(b, np.float64)
    assert np.max(np.abs(out - exact)) < 5e-4


# ---------------------------------------------------------------------------
# Gather-free mapping
# ---------------------------------------------------------------------------


@pytest.mark.parametrize(
    "kind,order",
    [("QAM", 4), ("QAM", 16), ("QAM", 64), ("QAM", 256), ("QAM", 1024),
     ("PSK", 2), ("PSK", 4), ("PSK", 8), ("PSK", 32)],
)
def test_planar_encode_matches_table(kind, order):
    const = mp.make_constellation(kind, order)
    idx = jnp.arange(order, dtype=jnp.int32)
    pts = cplx.to_numpy(mp.encode_indices_planar(idx, const))
    np.testing.assert_allclose(pts, const.table, atol=1e-6)


@pytest.mark.parametrize(
    "kind,order",
    [("QAM", 4), ("QAM", 64), ("QAM", 4096), ("PSK", 2), ("PSK", 16)],
)
def test_planar_decode_matches_table_path(kind, order):
    const = mp.make_constellation(kind, order)
    rng = np.random.RandomState(2)
    idx = rng.randint(0, order, size=4096)
    noisy = const.table[idx] + 0.1 * _rand_c(rng, 4096)
    a = np.asarray(mp.decode_hard(jnp.asarray(noisy, jnp.complex64), const))
    b = np.asarray(mp.decode_hard_planar(cplx.from_complex(noisy), const))
    np.testing.assert_array_equal(a, b)


def test_planar_adaptive_matches_complex_path():
    orders = np.array([4, 16, 64, 0, 16, 4, 256, 0], dtype=np.int64)
    m = ad.make_adaptive_mapper("QAM", orders)
    rng = np.random.RandomState(3)
    bits = jnp.asarray(rng.randint(0, 2, size=(32, m.bits_per_ofdm_symbol)), jnp.uint8)

    syms_c, idx_c = ad.encode(bits, m, dtype=jnp.complex128)
    syms_p, idx_p = ad.encode_planar(bits, m)
    np.testing.assert_array_equal(np.asarray(idx_p), np.asarray(idx_c))
    np.testing.assert_allclose(cplx.to_numpy(syms_p), np.asarray(syms_c), atol=1e-6)

    noisy = np.asarray(syms_c) + 0.02 * _rand_c(rng, *syms_c.shape)
    bits_c, ridx_c = ad.decode(jnp.asarray(noisy), m)
    bits_p, ridx_p = ad.decode_planar(cplx.from_complex(noisy), m)
    np.testing.assert_array_equal(np.asarray(bits_p), np.asarray(bits_c))
    np.testing.assert_array_equal(np.asarray(ridx_p), np.asarray(ridx_c))


def test_planar_adaptive_psk():
    orders = np.array([2, 4, 8, 0], dtype=np.int64)
    m = ad.make_adaptive_mapper("PSK", orders)
    rng = np.random.RandomState(4)
    bits = jnp.asarray(rng.randint(0, 2, size=(16, m.bits_per_ofdm_symbol)), jnp.uint8)
    syms, idx = ad.encode_planar(bits, m)
    out_bits, out_idx = ad.decode_planar(syms, m)
    np.testing.assert_array_equal(np.asarray(out_bits), np.asarray(bits))
    np.testing.assert_array_equal(np.asarray(out_idx), np.asarray(idx))
    syms_c, _ = ad.encode(bits, m, dtype=jnp.complex128)
    np.testing.assert_allclose(cplx.to_numpy(syms), np.asarray(syms_c), atol=1e-6)


# ---------------------------------------------------------------------------
# Channel / equalizer on planar arrays
# ---------------------------------------------------------------------------


def test_planar_convolution_matches_complex():
    rng = np.random.RandomState(5)
    h = _rand_c(rng, 5)
    x = _rand_c(rng, 6, 32)
    out_c, carry_c = ch.convolve_blocks(jnp.asarray(x), jnp.asarray(h))
    out_p, carry_p = ch.convolve_blocks(cplx.from_complex(x), cplx.from_complex(h))
    np.testing.assert_allclose(cplx.to_numpy(out_p), np.asarray(out_c), atol=1e-5)
    np.testing.assert_allclose(cplx.to_numpy(carry_p), np.asarray(carry_c), atol=1e-5)


def test_planar_equalizers_match_complex():
    rng = np.random.RandomState(6)
    h = _rand_c(rng, 16)
    rx = _rand_c(rng, 4, 16)
    for method in (EqualizationMethod.ZF, EqualizationMethod.MMSE):
        out_c = eq.equalize(jnp.asarray(rx), jnp.asarray(h), method, 17.0)
        out_p = eq.equalize(cplx.from_complex(rx), cplx.from_complex(h), method, 17.0)
        np.testing.assert_allclose(cplx.to_numpy(out_p), np.asarray(out_c), atol=1e-4)


def test_boxmuller_moments():
    z = ch._standard_normal_pair(jax.random.PRNGKey(0), (200_000,))
    for plane in (np.asarray(z.re), np.asarray(z.im)):
        assert abs(plane.mean()) < 0.01
        assert abs(plane.std() - 1.0) < 0.01
    # Planes are independent.
    corr = np.corrcoef(np.asarray(z.re), np.asarray(z.im))[0, 1]
    assert abs(corr) < 0.01


# ---------------------------------------------------------------------------
# Full pipeline: planar engine == complex engine statistically
# ---------------------------------------------------------------------------


@pytest.mark.parametrize(
    "kw",
    [
        dict(constellation_order=16, equalization_method=EqualizationMethod.MMSE),
        dict(constellation_order=64, equalization_method=EqualizationMethod.ZF),
        dict(
            constellation_order=8,
            constellation_type=ConstellationType.PSK,
            modulation_type=ModulationType.SC_OFDM,
        ),
        dict(constellation_order=16, prefix_type=PrefixType.ZERO),
    ],
)
def test_pipeline_planar_vs_complex(kw):
    base = dict(
        num_symbols=64 * 400,
        num_subcarriers=64,
        channel_type=ChannelType.CUSTOM,
        channel_model="default_multipath",
        prefix_type=PrefixType.CYCLIC,
        prefix_length_ratio=1.0,
        snr_db=18.0,
        constellation_type=ConstellationType.QAM,
    )
    base.update(kw)
    cfg_c = SimulationConfig(engine="complex", **base)
    cfg_p = SimulationConfig(engine="planar", **base)
    rc = pl.simulate(cfg_c, jax.random.PRNGKey(11))
    rp = pl.simulate(cfg_p, jax.random.PRNGKey(11))
    assert abs(rc["bit_error_rate"] - rp["bit_error_rate"]) < 0.01, (
        rc["bit_error_rate"],
        rp["bit_error_rate"],
    )
    assert abs(rc["papr_db"] - rp["papr_db"]) < 1.5


def test_pipeline_planar_adaptive():
    from ofdm_tpu.config import AdaptiveModulationMode, PowerAllocationType

    base = dict(
        num_bits=120_000,
        num_subcarriers=64,
        channel_type=ChannelType.CUSTOM,
        channel_model="default_multipath",
        equalization_method=EqualizationMethod.MMSE,
        power_allocation_type=PowerAllocationType.WATERFILLING,
        adaptive_modulation_mode=AdaptiveModulationMode.CAPACITY_BASED,
        snr_db=20.0,
    )
    rc = pl.simulate(SimulationConfig(engine="complex", **base), jax.random.PRNGKey(0))
    rp = pl.simulate(SimulationConfig(engine="planar", **base), jax.random.PRNGKey(0))
    assert rc["constellation_order_per_subcarrier"] == rp["constellation_order_per_subcarrier"]
    assert abs(rc["bit_error_rate"] - rp["bit_error_rate"]) < 0.005
