"""Low-rank ISI factorization (ops/lowrank.py) vs the linops chain.

The factored chain  y = x*D + t@Cr + t_prev@Cp  must reproduce the
banded-Toeplitz matmul chain (ops/linops.py — itself pinned against the
reference's stream convolution in test_linops.py) to f64 round-off, for
every prefix type, guard length regime, and modulation — including the
cross-block ISI path (nonzero previous-block tails).
"""

import numpy as np
import pytest

from ofdm_tpu.config import ModulationType, PrefixType
from ofdm_tpu.ops import linops, lowrank


def _rand_symbols(rng, b, n):
    return rng.standard_normal((b, n)) + 1j * rng.standard_normal((b, n))


def _linops_chain(symbols, taps, n, prefix, L, modulation, carry_row):
    """f64 numpy version of the XLA matmul chain (modulate/convolve/demod)."""
    T = n + L
    fr, fi = linops.tx_matrix(n, prefix, L, modulation)
    F = fr + 1j * fi
    blocks = symbols @ F  # (B, T)
    t0, t1 = linops.conv_matrices(np.asarray(taps, np.complex128), T)
    prev = np.concatenate([carry_row[None, :], blocks[:-1]], axis=0)
    y = blocks @ t0 + prev @ t1
    rr, ri = linops.rx_matrix(n, prefix, L)
    return y @ (rr + 1j * ri), blocks


CASES = [
    # (n, guard_ratio_L, prefix, taps, modulation)
    (16, 1, PrefixType.CYCLIC, [1.0, 0.5 - 0.2j, 0.25j, 0.1], ModulationType.OFDM),
    (16, 2, PrefixType.CYCLIC, [1.0, 0.5 - 0.2j, 0.25j, 0.1], ModulationType.OFDM),
    (16, 0, PrefixType.NONE, [1.0, 0.5 - 0.2j, 0.25j, 0.1], ModulationType.OFDM),
    (16, 1, PrefixType.ZERO, [1.0, 0.5 - 0.2j, 0.25j, 0.1], ModulationType.OFDM),
    (16, 5, PrefixType.ZERO, [1.0, 0.5 - 0.2j, 0.25j, 0.1], ModulationType.OFDM),
    (16, 1, PrefixType.CYCLIC, [1.0, 0.5 - 0.2j, 0.25j, 0.1], ModulationType.SC_OFDM),
    (16, 1, PrefixType.ZERO, [1.0, 0.5 - 0.2j, 0.25j, 0.1], ModulationType.SC_OFDM),
    (16, 3, PrefixType.CYCLIC, [0.7 + 0.1j], ModulationType.OFDM),  # flat
    (16, 2, PrefixType.ZERO, [0.7 + 0.1j], ModulationType.OFDM),
    (64, 21, PrefixType.CYCLIC, None, ModulationType.OFDM),  # long random IR
    (64, 21, PrefixType.ZERO, None, ModulationType.OFDM),
    (32, 0, PrefixType.NONE, None, ModulationType.SC_OFDM),
]


@pytest.mark.parametrize("n,L,prefix,taps,modulation", CASES)
def test_factored_chain_matches_linops(n, L, prefix, taps, modulation):
    rng = np.random.default_rng(0)
    if taps is None:
        taps = rng.standard_normal(31) + 1j * rng.standard_normal(31)
        taps = taps / np.linalg.norm(taps)
    taps = np.asarray(taps, np.complex128)
    f = lowrank.factor(taps, n, prefix, L, modulation)
    assert f is not None, "factorization residual gate tripped"
    T = n + L
    E = linops.ext_width(len(taps), T)
    assert f.E == E

    s = _rand_symbols(rng, 7, n)
    carry_row = rng.standard_normal(T) + 1j * rng.standard_normal(T)
    want, blocks = _linops_chain(s, taps, n, prefix, L, modulation, carry_row)
    got = lowrank.apply_reference(f, s, carry_row[T - E :] if E else carry_row[:0], modulation)
    np.testing.assert_allclose(got, want, rtol=1e-9, atol=1e-9)

    # The factored tail really is the block's last E time samples (the mm
    # kernel's carry quantity), so chunk carries keep their meaning.
    if E:
        np.testing.assert_allclose(s @ f.tail, blocks[:, T - E :], rtol=1e-10, atol=1e-12)


@pytest.mark.parametrize("n,L", [(16, 1), (16, 5), (16, 16), (64, 21)])
def test_zp_noise_gram_factor(n, L):
    """ZP: Gram = I + B B^H reproduces the overlap-add noise covariance."""
    f = lowrank.factor(
        np.array([1.0, 0.3 - 0.1j, 0.05j]), n, PrefixType.ZERO, L, ModulationType.OFDM
    )
    assert f is not None
    rr, ri = linops.rx_matrix(n, PrefixType.ZERO, L)
    R = rr + 1j * ri
    gram = R.conj().T @ R
    assert f.bnoise is not None
    np.testing.assert_allclose(
        np.eye(n) + f.bnoise @ f.bnoise.conj().T, gram, rtol=0, atol=1e-10
    )
    # Rank is bounded by the overlap width.
    assert f.noise_rank <= min(L, n)
    assert f.pw_scale == pytest.approx(n / (n + L))


def test_cp_noise_is_iid():
    f = lowrank.factor(
        np.array([1.0, 0.3]), 16, PrefixType.CYCLIC, 1, ModulationType.OFDM
    )
    assert f is not None and f.bnoise is None and f.pw_scale == 1.0


def test_zp_long_guard_is_pure_diag():
    """ZP with guard >= channel order: corrections vanish (circular exactly).

    The zero guard makes the block's last E time samples identically zero
    (TailM's columns are the all-zero guard columns of F_tx), so t == 0 for
    every block and both correction terms vanish — Cp itself is the exact
    prev-tail map for *arbitrary* carry vectors and need not be zero.
    """
    taps = np.array([1.0, 0.4 - 0.2j, 0.1j])
    f = lowrank.factor(taps, 16, PrefixType.ZERO, 4, ModulationType.OFDM)
    assert f is not None
    assert np.abs(f.tail).max(initial=0.0) == 0.0
    assert np.abs(f.cr).max(initial=0.0) < 1e-11


def test_correction_rank_is_tiny():
    """CP short guard: corrections have numerical rank ~ K-1-L, not n."""
    taps = np.array([1.0, 0.5, 0.25, 0.125, 0.0625])  # K=5
    n, L = 64, 2
    f = lowrank.factor(taps, n, PrefixType.CYCLIC, L, ModulationType.OFDM)
    assert f is not None
    sv = np.linalg.svd(f.tail @ f.cr, compute_uv=False)
    assert (sv > 1e-10).sum() <= len(taps) - 1 - L
