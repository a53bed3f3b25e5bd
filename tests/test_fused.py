"""Batch-minor fused hot-path tests: equivalence with the generic chunk."""

import jax
import jax.numpy as jnp
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
from ofdm_tpu.ops import fused
from ofdm_tpu import pipeline as pl


def _cfg(**kw):
    base = dict(
        num_symbols=64 * 600,
        num_subcarriers=64,
        constellation_order=16,
        constellation_type=ConstellationType.QAM,
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


def test_batchminor_dft_matches_generic():
    from ofdm_tpu.ops import dft

    rng = np.random.RandomState(0)
    x = rng.randn(64, 96) + 1j * rng.randn(64, 96)
    bm = cplx.to_numpy(fused._dft_apply_T(cplx.from_complex(x), 64, inverse=True))
    ref = np.fft.ifft(x.T, axis=-1, norm="ortho").T
    np.testing.assert_allclose(bm, ref, atol=2e-5)
    bm_f = cplx.to_numpy(fused._dft_apply_T(cplx.from_complex(x), 64, inverse=False))
    np.testing.assert_allclose(bm_f, np.fft.fft(x.T, axis=-1, norm="ortho").T, atol=2e-5)


def test_batchminor_conv_matches_stream():
    """The lane-shifted ISI equals whole-stream convolution, incl. carry."""
    rng = np.random.RandomState(1)
    K, T, B = 4, 20, 7
    taps = rng.randn(K) + 1j * rng.randn(K)
    x = rng.randn(B, T) + 1j * rng.randn(B, T)  # symbol-major reference

    expected, exp_carry = ch.convolve_blocks(
        jnp.asarray(x), jnp.asarray(taps)
    )

    # Replicate fused.py's conv section on (T, B) data.
    xt = cplx.from_complex(x.T)
    tapsc = cplx.from_complex(taps)
    y_full = cplx.zeros((T + K - 1, B), xt)
    for k in range(K):
        y_full = cplx.at_add(y_full, (slice(k, k + T), slice(None)), tapsc[k] * xt)
    body = y_full[:T, :]
    tail = y_full[T:, :]
    carry0 = cplx.zeros((K - 1,), xt)
    heads = cplx.CArray(
        fused._shift_lane(tail.re, carry0.re), fused._shift_lane(tail.im, carry0.im)
    )
    out = cplx.at_add(body, (slice(0, K - 1), slice(None)), heads)
    np.testing.assert_allclose(cplx.to_numpy(out).T, np.asarray(expected), atol=1e-5)
    np.testing.assert_allclose(cplx.to_numpy(tail[:, -1]), np.asarray(exp_carry), atol=1e-5)


@pytest.mark.parametrize(
    "kw",
    [
        dict(),
        dict(equalization_method=EqualizationMethod.ZF, constellation_order=64, snr_db=25.0),
        dict(prefix_type=PrefixType.ZERO),
        dict(modulation_type=ModulationType.SC_OFDM, constellation_order=4),
        dict(channel_model="flat_fading"),  # K == 1 path
        dict(noise_type=NoiseType.NONE),
        dict(constellation_order=8, constellation_type=ConstellationType.PSK),
    ],
)
def test_batchminor_chunk_matches_generic_statistically(kw):
    cfg_bm = _cfg(hotpath="batchminor", **kw)
    cfg_gen = _cfg(hotpath="generic", **kw)
    r_bm = pl.simulate(cfg_bm, jax.random.PRNGKey(5))
    r_gen = pl.simulate(cfg_gen, jax.random.PRNGKey(5))
    assert abs(r_bm["bit_error_rate"] - r_gen["bit_error_rate"]) < 0.012, (
        r_bm["bit_error_rate"],
        r_gen["bit_error_rate"],
    )
    # PAPR's peak is an extreme-value statistic; allow RNG-stream wobble.
    assert abs(r_bm["papr_db"] - r_gen["papr_db"]) < 2.5
    if kw.get("noise_type") == NoiseType.NONE:
        assert r_bm["bit_error_rate"] == 0.0


def test_batchminor_chunked_carry():
    cfg = _cfg(hotpath="batchminor", symbols_per_chunk=150, noise_type=NoiseType.NONE)
    r = pl.simulate(cfg, jax.random.PRNGKey(0))
    assert r["bit_error_rate"] == 0.0  # exact ISI handling across chunks


def test_batchminor_collect_symbols():
    r = pl.simulate(_cfg(hotpath="batchminor"), jax.random.PRNGKey(0), collect_symbols=100)
    assert r["received_symbols"].shape == (100,)


def test_batchminor_sharded():
    from ofdm_tpu.parallel import ShardedLinkRunner, make_mesh

    cfg = _cfg(hotpath="batchminor", num_symbols=64 * 640)
    r = ShardedLinkRunner(pl.prepare(cfg), mesh=make_mesh()).run(jax.random.PRNGKey(1))
    assert 0.0 <= r["bit_error_rate"] < 0.05
