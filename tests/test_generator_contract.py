"""Mock-based bit-source contract tests (pipeline <-> PRNG seam).

TPU analog of the reference's TestRandomBitsGeneratorMockingScenarios
(tests/ofdm_based_systems/bits_generation/test_models.py:366-405), which
patches the numpy Generator inside RandomBitsGenerator to verify the
pipeline consumes the generator *interface* correctly (shapes, masking,
and faithful propagation of known outputs through encode -> ... -> decode).

Here the seam is ``ofdm_tpu.ops.prng.uniform_indices`` (pipeline.py draws
constellation indices directly — bits and index draws coincide for
power-of-2 orders, see pipeline.chunk_body).  We monkeypatch it with a
deterministic fake, run real noiseless links on the XLA hot path, and
assert the call contract plus end-to-end exactness of the injected data.
"""

import jax
import jax.numpy as jnp
import numpy as np
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
    SimulationConfig,
)
from ofdm_tpu import pipeline as pl
from ofdm_tpu.ops import adaptive as ad
from ofdm_tpu.ops import mapping as mp


def _fake_indices(shape, mask):
    """The deterministic pattern the fake source injects (pure numpy)."""
    i = np.arange(shape[0], dtype=np.uint64)[:, None]
    j = np.arange(shape[1], dtype=np.uint64)[None, :]
    pat = (i * np.uint64(2654435761) + j * np.uint64(40503)) & np.uint64(
        0xFFFFFFFF
    )
    return (pat.astype(np.uint32) & np.asarray(mask, np.uint32)).astype(
        np.uint32
    )


@pytest.fixture
def patched_source(monkeypatch):
    """Replace prng.uniform_indices with a recording deterministic fake."""
    calls = []

    def fake(key, shape, mask):
        calls.append((tuple(int(d) for d in shape), np.asarray(mask)))
        return jnp.asarray(_fake_indices(shape, mask))

    # pipeline calls prng.uniform_indices as a module attribute, so the
    # patch is visible at trace time (each LinkRunner jits per-instance).
    monkeypatch.setattr(pl.prng, "uniform_indices", fake)
    return calls


def _cfg(**kw):
    base = dict(
        num_bits=4 * 64 * 200,
        num_subcarriers=64,
        constellation_order=16,
        constellation_type=ConstellationType.QAM,
        channel_type=ChannelType.CUSTOM,
        channel_model="flat_fading",
        prefix_type=PrefixType.CYCLIC,
        prefix_length_ratio=1.0,
        equalization_method=EqualizationMethod.ZF,
        noise_type=NoiseType.NONE,
        snr_db=30.0,
        hotpath="matmul",  # keep the traced XLA path (the seam under test)
    )
    base.update(kw)
    return SimulationConfig(**base)


def test_fixed_mode_call_contract(patched_source):
    """Fixed mode draws (num_syms, n) indices masked to order-1
    (bits_generation/models.py:18-55 contract, collapsed to index draws)."""
    cfg = _cfg()
    runner = pl.LinkRunner(pl.prepare(cfg))
    r = runner.run(jax.random.PRNGKey(0))
    B = runner.setup.num_ofdm_symbols
    assert any(
        shape == (B, 64) and mask.ndim == 0 and int(mask) == 15
        for shape, mask in patched_source
    ), patched_source
    # the injected data is noiseless + flat + ZF: decode must be exact
    assert r["bit_errors"] == 0
    assert r["symbol_errors"] == 0
    assert r["total_bits"] == cfg.num_bits


def test_injected_indices_survive_the_whole_link(patched_source):
    """The collected constellation sample equals the encode of the injected
    indices exactly (mock 'known bytes -> known bits' scenario,
    test_models.py:381-405)."""
    cfg = _cfg(num_bits=4 * 64 * 100)
    runner = pl.LinkRunner(pl.prepare(cfg))
    r = runner.run(jax.random.PRNGKey(0), collect_symbols=64 * 100)
    B = runner.setup.num_ofdm_symbols
    idx = _fake_indices((B, 64), np.uint32(15))
    expected = np.asarray(
        mp.encode_indices(jnp.asarray(idx), runner.setup.const)
    ).reshape(-1)
    got = np.asarray(r["received_symbols"]).reshape(-1)[: expected.size]
    np.testing.assert_allclose(got, expected[: got.size], atol=5e-4)
    assert r["bit_error_rate"] == 0.0


@pytest.mark.parametrize("const_val", [0, 15])
def test_constant_extreme_patterns(monkeypatch, const_val):
    """All-zeros / all-max index planes (the reference's all-0x00/0xFF byte
    scenarios) round-trip with zero errors."""

    def fake(key, shape, mask):
        return jnp.full(shape, np.uint32(const_val), jnp.uint32) & jnp.asarray(
            mask, jnp.uint32
        )

    monkeypatch.setattr(pl.prng, "uniform_indices", fake)
    runner = pl.LinkRunner(pl.prepare(_cfg(num_bits=4 * 64 * 50)))
    r = runner.run(jax.random.PRNGKey(3), collect_symbols=256)
    assert r["bit_errors"] == 0
    # a constant index plane maps to ONE constellation point
    pts = np.unique(np.round(np.asarray(r["received_symbols"]), 4))
    assert pts.size == 1


def test_adaptive_mode_masked_contract(patched_source):
    """Adaptive mode draws per-subcarrier masked indices: the mask row must
    equal ad.index_mask(amap) (orders from the gap function), and the
    injected plane decodes exactly (adaptive.py:130-265 semantics)."""
    cfg = _cfg(
        num_bits=None,
        num_symbols=200,
        power_allocation_type=PowerAllocationType.WATERFILLING,
        adaptive_modulation_mode=AdaptiveModulationMode.CAPACITY_BASED,
        channel_model="Lin-Phoong_P2",
        equalization_method=EqualizationMethod.MMSE,
        snr_db=20.0,
    )
    runner = pl.LinkRunner(pl.prepare(cfg))
    amap = runner.setup.amap
    assert amap is not None
    r = runner.run(jax.random.PRNGKey(1))
    want = np.asarray(ad.index_mask(amap))
    assert any(
        mask.shape == want.shape and np.array_equal(mask, want)
        for _, mask in patched_source
    )
    # noiseless MMSE at 20 dB: tiny residual regularization, still exact
    assert r["bit_error_rate"] == 0.0


def test_mock_does_not_leak_between_runners(patched_source):
    """A fresh runner built after the patch still sees it; the recorded
    call list grows per run (no stale jit reuse across instances)."""
    n_before = len(patched_source)
    runner = pl.LinkRunner(pl.prepare(_cfg(num_bits=4 * 64 * 10)))
    runner.run(jax.random.PRNGKey(7))
    assert len(patched_source) > n_before
