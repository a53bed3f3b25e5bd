"""Low-rank ISI factorization of the link's symbol->frequency-bin map.

The matmul-form link chain (ops/linops.py; reference
channel/models.py:46-62 + prefix/models.py + modulation/models.py) maps a
block's constellation symbols ``s`` (plus the previous block's time tail)
to unequalized frequency bins through three banded matrices.  For OFDM
that whole composite is *almost diagonal*: a cyclic (or zero) guard makes
the truncated stream convolution act circularly on every kept sample
except the first few, and the orthonormal DFT diagonalizes a circulant.
The leakage — the samples whose circular wrap is broken by a guard
shorter than the channel — lives entirely in the span of the block's
last ``E = num_taps - 1`` *time* samples.  Formally, with
``F = tx_matrix`` (N, T) and the merged conv+RX chain ``G``:

    G_intra = diag(D) + TailM @ Cr          TailM = F[:, T-E:]  (N, E)
    G_prev  =           TailM @ Cp          Cr, Cp  (E, N)

so the per-symbol chain collapses from dense (T+E)-wide matmuls to an
elementwise multiply by ``D`` plus two rank-E matmuls (E is 1-15 for
every shipped channel model, vs T = N+L up to thousands):

    y[b] = s[b] * D + t[b] @ Cr + t[b-1] @ Cp,     t[b] = s[b] @ TailM

``t[b]`` is literally the block's last E time samples, so the ISI carry
stays the same time-tail quantity the banded-Toeplitz kernel exchanges
(pallas_link mm mode, linops.ext_width) — chunk carries and halo
exchanges are unchanged in meaning.

SC-FDE symbols are time-domain, so its bins need one true DFT matmul
first: ``y = (s @ Wdft) * D + corrections`` — still two dense matmuls
(DFT in, IDFT out) instead of three, with exact f32 tails.

ZP noise coloring: the reference adds iid AWGN per *time* sample and the
ZP overlap-add sums two noisy samples into each head bin, so the
frequency-domain noise has covariance sigma^2 * Gram with
``Gram = R^H R`` (R = rx_matrix).  Gram - I is PSD of rank <= L, so

    z ~ sigma * (g1 + g2 @ B^H),   Gram = I + B B^H,  g1, g2 iid

is *exactly* the reference noise distribution (the pseudo-covariance is
zero automatically: E[g g^T] = 0 propagates through any linear map).
For CP / no prefix the strip+DFT rows are orthonormal (Gram == I) and
the iid frequency noise of the fold argument (linops.conv_rx_merged)
applies unchanged.

Everything is computed host-side in complex128 and *verified*: the
factorization residuals must reconstruct G_intra / G_prev / Gram to
~1e-11, else `factor` returns None and callers fall back to the dense
kernel path.  `apply_reference` is a pure-numpy oracle used by the tests
to pin the factored chain against the linops chain bit-for-bit (f64).
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import numpy as np

from ofdm_tpu.config import ModulationType, PrefixType
from ofdm_tpu.ops import linops
from ofdm_tpu.ops.dft import dft_matrix

_RTOL = 1e-9  # residual gate, relative to the matrix scale


class LRFactors(NamedTuple):
    """Host-side complex128 factors of one link's signal + noise maps."""

    d: np.ndarray  # (N,) diag of G_intra (the near-circulant response)
    tail: np.ndarray  # (N, E) TailM = F_tx[:, T-E:] — block's last E time samples
    cr: np.ndarray  # (E, N) own-tail correction rows
    cp: np.ndarray  # (E, N) previous-tail (ISI) correction rows
    bnoise: Optional[np.ndarray]  # (N, r) ZP noise factor B (None: iid noise)
    pw_scale: float  # measured-power estimator scale (n/T for ZP, 1 for CP)
    E: int

    @property
    def n(self) -> int:
        return self.d.shape[0]

    @property
    def noise_rank(self) -> int:
        return 0 if self.bnoise is None else self.bnoise.shape[1]


def _solve_in_span(tail: np.ndarray, target: np.ndarray) -> Optional[np.ndarray]:
    """C with tail @ C == target (least squares + residual gate), or None."""
    if tail.shape[1] == 0:
        return (
            np.zeros((0, target.shape[1]), np.complex128)
            if np.abs(target).max(initial=0.0) < 1e-11
            else None
        )
    c, *_ = np.linalg.lstsq(tail, target, rcond=None)
    scale = max(np.abs(target).max(initial=0.0), 1.0)
    if np.abs(tail @ c - target).max(initial=0.0) > _RTOL * scale:
        return None
    return c


def factor(
    taps: np.ndarray,
    n: int,
    prefix: PrefixType,
    L: int,
    modulation: ModulationType,
) -> Optional[LRFactors]:
    """Low-rank factors for one link, or None when the structure fails.

    (The residual gates should only trip on configurations outside the
    guard/prefix algebra above — they are a safety net, not a planner.)
    """
    taps = np.asarray(taps, np.complex128)
    T = n + L
    E = linops.ext_width(len(taps), T)
    fr, fi = linops.tx_matrix(n, prefix, L, modulation)
    F = fr + 1j * fi  # (N, T)
    if modulation == ModulationType.SC_OFDM:
        wr, wi = dft_matrix(n, inverse=False)
        W = wr + 1j * wi  # the bins are DFT(body); factor relative to it
    else:
        W = None

    # The same composite the mm kernel computes: data lanes through the
    # intra band, ext lanes (prev block's last E time samples) through the
    # tail rows (linops.conv_matrix_merged / conv_rx_merged).  CR below is
    # the (T, N) conv+RX part so that g_intra = F @ CR; the OFDM solve
    # never materializes g_intra (see the fast path), so CR is built in
    # O(taps * T * N) via shift-and-add for ZP instead of a dense
    # banded-Toeplitz matmul.
    zp_R = None
    if prefix == PrefixType.ZERO:
        cm = linops.conv_matrix_merged(taps, T)  # (T+E, T) (banded)
        rr, ri = linops.rx_matrix(n, prefix, L)
        R = rr + 1j * ri  # (T, N): overlap-add + DFT
        # CR = cm[:T] @ R via the band: cm[i, j] = taps[j-i] (upper band),
        # so row i sums taps[k] * R[i+k].
        CR = np.zeros((T, n), np.complex128)
        for k in range(len(taps)):
            CR[: T - k] += taps[k] * R[k:]
        cp = np.ascontiguousarray(cm[T:] @ R)  # (E, N) — exact by construction
        zp_R = R
    else:
        cmrx = linops.conv_rx_merged(taps, n, prefix, L)  # (T+E, N)
        CR = cmrx[:T]
        cp = np.ascontiguousarray(cmrx[T:])  # (E, N) — exact by construction
        # strip+DFT rows orthonormal — iid frequency noise

    # Joint per-column solve: G_intra[:, j] = D_j * basis_j + TailM @ Cr[:, j]
    # with basis_j = e_j (OFDM: the bins ARE the symbols) or W[:, j]
    # (SC-FDE: bins = DFT(body)).  The correction has nonzero *diagonal*
    # entries, so D is NOT diag(G_intra) — it comes out as the circulant
    # tap response (verified equal to the unnormalized DFT of the taps).
    # Solved in closed form by projecting out col(TailM): with
    # Qt = orth(TailM) and X~ = X - Qt Qt^H X, the least-squares D_j is
    # <basis~_j, G~_j> / ||basis~_j||^2, then Cr = pinv(TailM)(G - basis D).
    tail = np.ascontiguousarray(F[:, T - E :]) if E else np.zeros((n, 0), np.complex128)
    # Rank-aware orthonormal basis of col(TailM): ZP tails include the
    # zero-guard columns (rank < E; all-zero when L >= K-1), where a QR
    # basis would be spurious.
    if E:
        u, sv, vh = np.linalg.svd(tail, full_matrices=False)
        rk = sv > 1e-12 * max(sv.max(initial=0.0), 1.0)
        qt = u[:, rk]
    else:
        qt = np.zeros((n, 0), np.complex128)
        vh = np.zeros((0, 0), np.complex128)
        sv = np.zeros(0)
        rk = np.zeros(0, bool)
    if W is not None:
        # SC-FDE basis solve (dense; SC links never take the lr kernel —
        # this path exists for API completeness and tests).
        g_intra = F @ CR
        proj = (
            (lambda x: x - qt @ (qt.conj().T @ x)) if qt.shape[1] else (lambda x: x)
        )
        g_t = proj(g_intra)
        w_t = proj(W)
        d = np.einsum("ij,ij->j", w_t.conj(), g_t) / np.einsum(
            "ij,ij->j", w_t.conj(), w_t
        ).real
        base_d = W @ np.diag(d)
        cr = _solve_in_span(tail, g_intra - base_d)
        if cr is None:
            return None
    else:
        # OFDM fast path (round 5): everything the solve consumes is a
        # diagonal or an E-row projection of g_intra = F @ CR, so the
        # whole factorization runs in O(E * N * T) without materializing
        # the (N, N) product — giant-width factors drop from minutes to
        # ~a second.  Certified below by random probes of the full-chain
        # residual (g_intra v vs D v + TailM (Cr v)), replacing
        # _solve_in_span's dense residual gate.
        diag_g = np.einsum("jt,tj->j", F, CR)
        if qt.shape[1]:
            qtH_g = (qt.conj().T @ F) @ CR  # (rank, N)
            diag_qq = np.einsum("je,ej->j", qt, qtH_g)
            denom = 1.0 - (np.abs(qt) ** 2).sum(axis=1)
        else:
            qtH_g = np.zeros((0, n), np.complex128)
            diag_qq = np.zeros(n, np.complex128)
            denom = np.ones(n)
        d = (diag_g - diag_qq) / denom
        if E and rk.any():
            # Cr = pinv(TailM) @ (g_intra - diag(d)); pinv from the
            # rank-truncated SVD, applied as (pinv @ F) @ CR - pinv * d.
            pinv_t = (vh[rk].conj().T * (1.0 / sv[rk])[None, :]) @ qt.conj().T
            cr = (pinv_t @ F) @ CR - pinv_t * d[None, :]
        else:
            cr = np.zeros((E, n), np.complex128)
        # Probe certification of the factored chain (scale-relative).
        prng = np.random.default_rng(1)
        for _ in range(2):
            v = prng.standard_normal(n) + 1j * prng.standard_normal(n)
            lhs = F @ (CR @ v)
            rhs = d * v + (tail @ (cr @ v) if E else 0.0)
            if np.abs(lhs - rhs).max(initial=0.0) > _RTOL * max(
                1.0, np.abs(lhs).max(initial=0.0)
            ):
                return None

    bnoise = None
    pw_scale = 1.0
    if zp_R is not None:
        # ZP: R = [W_dft; S] — the body rows are the orthonormal DFT and
        # the L spill rows S fold the head overlap — so Gram = R^H R
        # = I + S^H S EXACTLY and the noise factor is B = S^H in closed
        # form.  (This replaces an O(n^3) eigendecomposition of Gram − I
        # whose noise floor once inflated the kept rank to 232 at 4096 sc;
        # the direct construction is exact, instant at any width, and
        # threshold-free.)  Verified by random probes: (R^H R) v must
        # equal v + B (B^H v) to _RTOL — certifying BOTH the body
        # orthonormality and the factor.
        S = zp_R[n:]  # (L, N) spill rows
        bnoise = np.ascontiguousarray(S.conj().T) if S.shape[0] else None
        prng = np.random.default_rng(0)
        for _ in range(2):
            v = prng.standard_normal(n) + 1j * prng.standard_normal(n)
            lhs = zp_R.conj().T @ (zp_R @ v)
            rhs = v + (
                bnoise @ (bnoise.conj().T @ v) if bnoise is not None else 0.0
            )
            if np.abs(lhs - rhs).max(initial=0.0) > _RTOL * max(
                1.0, np.abs(lhs).max(initial=0.0)
            ):
                return None
        # Freq-bin mean power measures the overlap-added window's energy
        # (n samples); the reference measures the T-sample time mean —
        # equal in expectation up to the n/T count ratio (cross terms of
        # head and spill are zero-mean).  Per-tile estimator contract, as
        # for the fold-mode kept-sample measurement (linops.conv_rx_merged).
        pw_scale = n / T
    return LRFactors(
        d=d, tail=tail, cr=cr, cp=cp, bnoise=bnoise, pw_scale=pw_scale, E=E
    )


def apply_reference(
    f: LRFactors,
    symbols: np.ndarray,
    prev_tail: np.ndarray,
    modulation: ModulationType,
) -> np.ndarray:
    """Numpy oracle: (B, N) symbols -> (B, N) unequalized bins (no noise).

    ``prev_tail`` is the (E,) time tail preceding row 0 (the chunk carry's
    last E samples).  Row b's previous tail is row b-1's own tail — the
    factored equivalent of the banded-Toeplitz prev-row matmul.
    """
    s = np.asarray(symbols, np.complex128)
    t = s @ f.tail  # (B, E): each block's last E time samples
    tp = np.concatenate([np.asarray(prev_tail, np.complex128)[None, :], t[:-1]], 0)
    if modulation == ModulationType.SC_OFDM:
        wr, wi = dft_matrix(f.n, inverse=False)
        x = s @ (wr + 1j * wi)
    else:
        x = s
    return x * f.d[None, :] + t @ f.cr + tp @ f.cp
