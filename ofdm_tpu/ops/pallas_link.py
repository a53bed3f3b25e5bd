"""Fully fused Pallas chunk kernel: the whole link step in one kernel.

One `pallas_call` executes an entire Monte-Carlo chunk for the OFDM link:
per grid step it draws a tile of random constellation indices (hardware
PRNG), maps them arithmetically, runs the matmul-form link operators
(ops/linops.py) on the MXU (bf16x3-split or single-pass bf16 — see
SimulationConfig.matmul_passes), adds Box-Muller AWGN, equalizes, demaps,
and accumulates BER/SER/PAPR partials — all without leaving VMEM
(SURVEY §7.2 step 8, the "speed-of-light pass").

For CP / no-prefix links the chain is TWO complex matmuls per symbol
("fold" mode): IDFT+guard with duplicated tail lanes, then ONE (T+E, n)
matrix that merges the banded Toeplitz convolution (intra band plus the
E = taps-1 previous-tail rows), guard strip, and DFT
(linops.conv_rx_merged) — AWGN moves to the frequency bins, where it is
EXACTLY equidistributed because the strip+DFT is unitary on the kept
samples.  ZP links keep the three-matmul chain (overlap-add sums two noisy
samples per head bin, so folded noise would correlate).  Measured effect
at 1024 subcarriers: 3.5 -> 6.7M OFDM syms/s (AWGN, MMSE), and the 64-sc
headline BER lands exactly on the reference 0.01901 (one less bf16 matmul
in the signal path).

Supported configuration (falls back to the XLA hot path otherwise):
fixed-mode square QAM or power-of-2 PSK, CAPACITY_BASED adaptive QAM
(per-subcarrier square orders as *vector* rows — the same arithmetic chain
with per-lane m/scale parameters), OFDM or SC-FDE, CP/ZP/no guard,
ZF/MMSE/none equalizer, AWGN or no noise, no TX power scaling, no pre-demap
normalization.  PSK demap is an atan2-free rotation binary search — see
`psk_sector_arith`.

Executable sharing: the kernel is built from a hashable `_Spec` of the
*static* configuration only; every data-dependent constant (link matrices,
equalizer rows, adaptive order rows, channel gain) is a runtime argument.
`make_pallas_chunk_lifted` returns the per-spec shared function plus this
runner's constant arrays, so sweeps across SNR points, channels, or
adaptive order layouts with the same shapes reuse ONE compiled executable
(pipeline._SHARED_JIT) — critical on remote-compile TPU relays where each
compile costs minutes.

Cross-symbol ISI carry: within a tile the "previous symbol" row comes from
`pltpu.roll` along sublanes; across tiles a VMEM scratch holds the last time
row (TPU grid steps run sequentially); across chunks it round-trips as a
kernel input/output.

AWGN power measurement is per tile (~Bt*T samples) rather than per chunk —
statistically identical for the tile sizes used (>= 64k samples); the bench
BER gate pins this.
"""

from __future__ import annotations

import functools
import os
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
from jax import lax
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ofdm_tpu.config import (
    EqualizationMethod,
    ModulationType,
    NoiseType,
    PrefixType,
)
from ofdm_tpu.ops import linops
from ofdm_tpu.ops.cplx import CArray

_TILE = 1024  # OFDM symbols per grid step (narrow configs; see tile_for)

# The Mosaic scoped-VMEM stack holds the staged matrix operands PLUS every
# live (tile, TE) f32 temporary.  The *default* Mosaic limit is ~16 MB, but
# this chip (v5e, 128 MiB physical VMEM) accepts a raised
# CompilerParams(vmem_limit_bytes=...) — measured: an 80 MB-resident probe
# kernel compiles and runs once the limit is set, and a 512-sc passes=1
# kernel that OOM'd at 31.77 MB under the default limit fits.  _plan sizes
# the stage set + grid tile against a budget below the raised limit
# (headroom for Mosaic internals beyond the ~13-live-plane activation
# estimate): banded-Toeplitz merged matmul ("mm") where it fits, the
# reduced-staging "mm4" next, tap-shift convolution ("taps", no (TE, T)
# matrix staged) for forced-kernel very wide links.
_VMEM_SCOPED_LIMIT = 72_000_000
_VMEM_COMPILER_LIMIT = 100 * 1024 * 1024  # vmem_limit_bytes for pallas_call
# Giant-width lr links (n >= _GIANT_LR_N) get a raised budget so the grid
# tile stays 512 instead of 256: measured 2026-08-20 (tools/lr_tile_probe),
# 4096-sc ZP-MMSE marginal 49.6 ps/bin at tile 512 (cap 116 MiB, actual
# scoped usage 105.2M reported by Mosaic) vs 51.0 at tile 256 under the
# default caps.  v5e has 128 MiB of VMEM; the raised cap applies ONLY to
# this shape (other modes' plans are unchanged under the default budget).
_GIANT_LR_N = 4096
_VMEM_SCOPED_GIANT_LR = 119_000_000  # admits 4*14*512*TE at TE ~ 4103
_VMEM_COMPILER_GIANT_LR = 116 * 1024 * 1024
# Staged-constant cap, separate from the total budget: a 51 MB stage set
# (2048-sc mm4) measured 0.09-0.15M OFDM syms/s on hardware — ~6-10x slower
# than the XLA path there (0.93M), consistent with Mosaic re-fetching the
# grid-invariant operands from HBM once staging outgrows its hoisting
# window — while a 38 MB set (1024-sc bf16x3 Karatsuba) runs fine at 1.5M
# (vs 1.06M XLA) and a 19 MB set (1024-sc passes=1) at full rate (3.8M).
# Cap between the calibration points; links whose smallest stage set
# exceeds it run the XLA matmul hot path instead.
_VMEM_STAGED_LIMIT = 40_000_000
# Grid-tile candidates, largest first.  Tiles past 1024 pay off once the
# raised VMEM limit admits their activation planes: the 64-sc headline
# config measured 97.4M OFDM syms/s marginal at tile=1024 vs 107.3M at
# 4096 (~10% — per-grid-step overhead amortization; under the old 16 MB
# default, 2048 measured *slower* from VMEM pressure and 4096 OOM'd).
# With lane packing halving the plane rows, tile=8192 measured a further
# +14% on the packed headline (456.2 -> 519.3M syms/s marginal,
# 2026-08-19) while 16384 regressed to 482.5M (VMEM pressure) — the
# ladder tops out at 8192.
_TILE_LADDER = (8192, 4096, 2048, 1024, 512, 256, 128, 64, 32)
_ACT_ROWS_MM = 14  # measured ~13 live (tile, TE) f32 planes w/ AWGN + margin
_ACT_ROWS_TAPS = 4  # the tap loop keeps shifted planes live as well
_MAX_KERNEL_TAPS = 16


def _pad8(x: int) -> int:
    return max(8, -(-x // 8) * 8)


def _plan(T: int, n: int, passes: int, is_sc: bool, n_taps: int,
          allow_taps: bool = False, fold: bool = False, diag: bool = False,
          diag_txext: bool = False, lr: bool = False, lr_rank: int = 0):
    """(tile, conv_mode) whose scoped-VMEM stack estimate fits, or None.

    "taps" is tried only when `allow_taps`: the tap-shift kernel works at
    any width but its lane rolls relayout on this backend — measured
    117.6M QAM syms/s (509s compile) vs 2.12G QAM syms/s for the XLA
    matmul-form hot path at 1024 subcarriers (single-pass bf16 + banded
    ISI matmul; docs/PERFORMANCE.md), so hotpath="auto" prefers the XLA
    path for links too wide for the "mm" kernel, while an explicit
    hotpath="pallas" keeps the single-kernel form available (e.g. for
    minimal HBM traffic under sharding)."""
    u = 3 if passes == 1 else 6  # staged bf16 matrices per complex constant
    E = max(0, min(n_taps - 1, T))  # merged-conv tail lanes (linops.ext_width)
    dft_taps = 2 * n * T + (n * n if is_sc else 0)
    dft_mm = n * (T + E) + n * T + (n * n if is_sc else 0)
    # fold (CP / no-prefix): conv and RX collapse to ONE (T+E, n) matrix
    # (linops.conv_rx_merged) — the (T+E, T) Toeplitz and (T, n) RX are
    # never staged separately, and the kernel runs 2 complex matmuls per
    # symbol instead of 3.
    mm_staged = (
        n * (T + E) + (T + E) * n + (n * n if is_sc else 0)
        if fold
        else (T + E) * T + dft_mm
    )
    # "lr": low-rank ISI factorization (ops/lowrank.py) — the whole banded
    # chain collapses to y = s*D + [t | t_prev] @ CrCp with t = s @ TailM
    # (E = taps-1 tail lanes, padded to 8), plus an exact rank-r colored
    # noise factor for ZP (z = g1 + g2 @ B^H).  Staged: TailM (n, EP),
    # CrCp (2EP, n), B^H (RP, n), D rows, and (non-txext) the TX matrix
    # for the PAPR statistic — two SKINNY matmuls per tile instead of the
    # dense (T+E)-wide chain, at any width.
    ep = _pad8(max(0, min(n_taps - 1, T)))
    # Noise factor rows: iid-noise lr links stage a zero RP=8 factor too
    # (the scheduling ballast, _fn_for_spec `colored`), so the estimate
    # always accounts at least one padded group — noise-off links
    # over-count by ~0.4 MB at 4096 sc, the safe direction (the 128-sc ZP
    # compile OOM this round came from UNDER-counting by about that much).
    rp = _pad8(max(lr_rank, 1))
    lr_staged = (
        n * ep + 2 * ep * n + rp * n + (128 * 128 if diag_txext else n * T)
    )
    for conv, staged, act_rows, TE, uu in (
        # "diag": ISI-free CP / flat links — the TX->conv->RX composite is
        # exactly diag(H) (CP turns the truncated stream convolution
        # circular once L >= K-1, and the orthonormal DFT diagonalizes a
        # circulant), so the BER chain is one elementwise complex multiply
        # by the staged h_freq rows.  The TX IDFT matmul remains ONLY to
        # produce the time-domain plane for the PAPR / measured-power
        # statistics; no conv/RX matrices are staged at all.
        # Staged estimate covers the worst-case lane-packed block-diagonal
        # TX matrix (pack^2 * n * T, pack*n <= 128) plus the MMSE segment
        # averaging matrix (<= 128^2) — both tiny next to the budget.  In
        # external-PAPR mode (diag_txext) NO TX matrices are staged at
        # all, so arbitrarily wide ISI-free links stay on the kernel.
        ("diag", 128 * 128 if diag_txext else max(1, 128 // n) ** 2 * n * T + 128 * 128, _ACT_ROWS_MM, T, u),  # OFDM only (_diag_for)
        ("lr", lr_staged, _ACT_ROWS_MM, T, u),  # OFDM only (lr_factors)
        ("mm", mm_staged, _ACT_ROWS_MM, T + E, u),
        # "mm4": the same merged-conv kernel with 4-mult complex matmuls
        # (yr = xr@r - xi@i, yi = xr@i + xi@r) instead of Karatsuba — one
        # more MXU pass per complex matmul, but only the (r, i) halves are
        # staged (2 matrices per constant instead of 3).  This is what lets
        # the fused kernel fit 1024-subcarrier links: Karatsuba's stage set
        # is ~19 MB there, the 4-mult set ~12.8 MB.  passes=1 only.
        ("mm4", mm_staged, _ACT_ROWS_MM, T + E, 2),
        ("taps", dft_taps, _ACT_ROWS_TAPS, T, u),
    ):
        if conv == "diag" and not diag:
            continue
        if conv == "lr" and not lr:
            continue
        if conv == "taps" and not (allow_taps and 0 < n_taps <= _MAX_KERNEL_TAPS):
            continue
        if conv == "mm4" and passes != 1:
            continue
        fixed = 2 * uu * staged
        if fixed > _VMEM_STAGED_LIMIT:
            continue
        scoped = (
            _VMEM_SCOPED_GIANT_LR
            if conv == "lr" and n >= _GIANT_LR_N
            else _VMEM_SCOPED_LIMIT
        )
        for tile in _TILE_LADDER:
            if fixed + 4 * act_rows * tile * TE <= scoped:
                return tile, conv
    return None


# 64-subcarrier real-ISI links stay on the lane-packed fold/mm kernels
# (measured ZP-1.0 MMSE marginals, same chip, 2026-08-20: 64 sc packed mm
# 212M vs unpacked lr 118M); from 128 subcarriers up the skinny factored
# chain wins — 128 sc: lr 65.8 vs mm 88.7 ps/bin; 256 sc: lr 58.6 vs mm
# 89.5 (the mm chain's dense matmuls grow with width while lr holds
# 36-66 ps/bin).  Tests monkeypatch this to exercise both kernels at
# CI-friendly widths.
_LR_MIN_N = 128
# Gate for the lr kernel mode (tests force it off to pin the fold/mm
# baselines).
_LR_ENABLED = True
# ISI-free links keep the pure-elementwise diag chain up to this width;
# beyond it they route through the lr factored chain (D = h_freq exactly;
# the correction matmuls carry zero rows — test-pinned).  Round-5
# measurement (same-chip, interleaved): at 64-QAM CP-1.0 MMSE the lr
# chain beats diag at 1024 sc (36.4 vs ~40 ps/bin marginal) and 2048
# (36.7 vs 47.2, and a 3.5x smaller small-run wall); at 4096 diag was
# catastrophic (~3.1 ns/bin, r4).  Links whose lr factors don't exist
# (single-tap channels: E = 0) keep diag at any width — plan_for guards.
_DIAG_MAX_N = 512


def lr_factors(runner):
    """Cached ops.lowrank factorization for a runner's link (or None).

    OFDM only (SC-FDE bins still need dense DFT matmuls — its wide links
    keep the fold/mm4 chain); `lowrank.factor` verifies the factorization
    residuals to ~1e-11 host-side, so a non-None result is load-bearing.
    """
    cached = getattr(runner, "_lr_factors_cache", "unset")
    if cached != "unset":
        return cached
    s = runner.setup
    cfg = s.cfg
    f = None
    if (
        cfg.modulation_type != ModulationType.SC_OFDM
        and cfg.num_subcarriers >= _LR_MIN_N
        # E = 0 (single-tap ZP) has no tail at all — the fold/mm chain is
        # already minimal there and the lr tail matmuls would be degenerate.
        and linops.ext_width(
            len(np.asarray(s.taps)), cfg.num_subcarriers + s.prefix_length
        )
        > 0
    ):
        from ofdm_tpu.ops import lowrank

        f = lowrank.factor(
            np.asarray(s.taps),
            cfg.num_subcarriers,
            cfg.prefix_type,
            s.prefix_length,
            cfg.modulation_type,
        )
    runner._lr_factors_cache = f
    return f


def plan_for(runner, passes: Optional[int] = None):
    """`_plan` for a runner's config; None when the kernel cannot fit."""
    s = runner.setup
    cfg = s.cfg
    isi_free = _diag_for(cfg, s)
    # ISI-free links wider than _DIAG_MAX_N prefer the lr chain (see the
    # constant's measurements) but keep diag when no lr factorization
    # exists (single-tap channels: E = 0 — the elementwise chain is the
    # only sub-dense form there).  lr_factors is computed LAZILY: links
    # that stay diag never pay the host-side factorization (adaptive
    # sweeps prepare one runner per SNR point).
    lrf = None
    if _LR_ENABLED and not (isi_free and cfg.num_subcarriers <= _DIAG_MAX_N):
        lrf = lr_factors(runner)
    diag = isi_free and (cfg.num_subcarriers <= _DIAG_MAX_N or lrf is None)
    lrf = None if diag else lrf
    return _plan(
        cfg.num_subcarriers + s.prefix_length,
        cfg.num_subcarriers,
        selected_passes(runner) if passes is None else passes,
        cfg.modulation_type == ModulationType.SC_OFDM,
        len(np.asarray(s.taps)),
        allow_taps=cfg.hotpath == "pallas",
        fold=_fold_for(cfg),
        diag=diag,
        diag_txext=(
            cfg.num_subcarriers >= 512
            and cfg.papr_stride != 1
            and not cfg.apply_power_allocation
        ),
        lr=lrf is not None,
        lr_rank=0 if lrf is None else lrf.noise_rank,
    )


def _diag_for(cfg, s) -> bool:
    """Whether the TX->conv->RX composite is exactly diagonal (= h_freq).

    CP guard >= channel order makes the truncated stream convolution
    (reference channel/models.py:46-62) act circularly on every kept
    sample, and the orthonormal DFT pair diagonalizes a circulant; a
    single-tap channel is diagonal under any fold-eligible prefix.  OFDM
    only: SC-FDE symbols are time-domain, so its freq bins still need a
    DFT matmul.  `_consts_for` re-verifies the identity numerically."""
    if cfg.modulation_type == ModulationType.SC_OFDM or not _fold_for(cfg):
        return False
    K = len(np.asarray(s.taps))
    L = s.prefix_length if cfg.prefix_type == PrefixType.CYCLIC else 0
    return K - 1 <= L


def _fold_for(cfg) -> bool:
    """Whether conv folds into RX (CP / no-prefix only — see
    linops.conv_rx_merged for the noise-equivalence argument)."""
    return cfg.prefix_type != PrefixType.ZERO


def chunk_multiple(runner) -> int:
    """Per-device chunk granularity keeping `runner` on the fused kernel.

    Capped at 1024 so small runs/chunks stay on the kernel: when the plan
    admits a larger grid tile, `_spec_for` upgrades to the largest ladder
    tile that divides the chunk (e.g. the 2^17-symbol bench chunk runs
    tile=4096; a 1024-symbol test chunk runs tile=1024)."""
    p = plan_for(runner)
    return min(p[0], _TILE) if p is not None else _TILE


_INV_2_24 = float(1.0 / 16777216.0)


def _split_const(w: np.ndarray):
    """f32 matrix -> (bf16 hi, bf16 lo) host-side split (exact hi+lo == w)."""
    w32 = np.asarray(w, np.float32)
    hi = w32.astype(jnp.bfloat16)
    lo = (w32 - np.asarray(hi, np.float32)).astype(jnp.bfloat16)
    return np.asarray(hi), np.asarray(lo)


def _complex_matrix_consts(
    re: np.ndarray, im: np.ndarray, passes: int = 3, quad: bool = False
):
    """bf16 splits of (re, im[, re+im]) for the kernel's complex matmuls.

    passes=1 returns the hi halves only ([r_hi, i_hi, s_hi]): the lo
    matrices would be staged in scoped VMEM even though the single-pass
    kernel never reads them (measured: the Mosaic stack stages every
    *operand*, not every use — a 512-sc passes=1 kernel OOM'd at 31.8M
    with all six staged), so they must not be passed at all.

    quad=True (the "mm4" wide-link mode) drops the Karatsuba sum matrix as
    well: the 4-mult complex matmul reads only [r_hi, i_hi] — one more MXU
    pass, one third less staging (what fits 1024-subcarrier links)."""
    if quad:
        return [_split_const(re)[0], _split_const(im)[0]]
    out = []
    for m in (re, im, re + im):
        hi, lo = _split_const(m)
        out.extend([hi] if passes == 1 else [hi, lo])
    return out  # [r_hi, i_hi, s_hi] | [r_hi, r_lo, i_hi, i_lo, s_hi, s_lo]


def _mm3(xh, xl, w_hi, w_lo):
    """~f32 real matmul with bf16 operands: xh/xl are bf16 splits of x."""
    d = lambda a, b: jnp.dot(a, b, preferred_element_type=jnp.float32)  # noqa: E731
    return d(xh, w_hi) + (d(xh, w_lo) + d(xl, w_hi))


def _split_act(x):
    xh = x.astype(jnp.bfloat16)
    xl = (x - xh.astype(jnp.float32)).astype(jnp.bfloat16)
    return xh, xl


def _mseg_for(method, pack: int) -> bool:
    """Whether the MMSE per-row noise estimate runs as the exact-ones
    MXU matmul (per-n-lane-segment sum, 1/n folded into the scalar nv) —
    packed rows only: the per-symbol segment means need it, and the
    packed plane is one 128-lane vreg wide so it is one MXU pass.
    Routing WIDE unpacked rows through it was measured WORSE (2026-08-20:
    1024-sc MMSE 23.2M -> 17.5M syms/s — n/128 passes plus the activation
    split cost more than the cross-lane reduce tree), so unpacked rows
    keep jnp.mean."""
    return method == EqualizationMethod.MMSE and pack > 1


def _cmatmul(xr, xi, consts, passes: int = 3, quad: bool = False):
    """Complex matmul; consts from _complex_matrix_consts
    (2 refs at quad, 3 at passes=1, 6 at passes=3).

    passes=3: Karatsuba with bf16x3 split per real matmul (~1e-5 rel err).
    passes=1: Karatsuba, single bf16 pass (~6e-3 rel err) — 3 MXU passes
    per complex matmul instead of 9; via SimulationConfig.matmul_passes.
    quad: 4-mult textbook form (yr = xr@r − xi@i, yi = xr@i + xi@r), single
    bf16 pass — 4 MXU passes but only 2 staged matrices (wide links).
    """
    if quad:
        r_hi, i_hi = consts
        d = lambda a, b: jnp.dot(a, b, preferred_element_type=jnp.float32)  # noqa: E731
        xrb = xr.astype(jnp.bfloat16)
        xib = xi.astype(jnp.bfloat16)
        return (
            d(xrb, r_hi) - d(xib, i_hi),
            d(xrb, i_hi) + d(xib, r_hi),
        )
    if passes == 1:
        r_hi, i_hi, s_hi = consts
        d = lambda a, b: jnp.dot(a, b, preferred_element_type=jnp.float32)  # noqa: E731
        p1 = d(xr.astype(jnp.bfloat16), r_hi)
        p2 = d(xi.astype(jnp.bfloat16), i_hi)
        p3 = d((xr + xi).astype(jnp.bfloat16), s_hi)
        return p1 - p2, p3 - p1 - p2
    r_hi, r_lo, i_hi, i_lo, s_hi, s_lo = consts
    xrh, xrl = _split_act(xr)
    xih, xil = _split_act(xi)
    xsh, xsl = _split_act(xr + xi)
    p1 = _mm3(xrh, xrl, r_hi, r_lo)
    p2 = _mm3(xih, xil, i_hi, i_lo)
    p3 = _mm3(xsh, xsl, s_hi, s_lo)
    return p1 - p2, p3 - p1 - p2


def _uniform24(shape):
    b = pltpu.bitcast(pltpu.prng_random_bits(shape), jnp.int32)
    return ((b >> 8) & 0xFFFFFF).astype(jnp.float32) * _INV_2_24


# Quarter-range trig for the AWGN phase and the PSK encoder.  Mosaic's
# full-range jnp.cos costs 2.59 ns/OFDM-symbol at the 64-sc headline
# config — ~30% of the entire fused kernel (slope-measured 2026-08-18 by
# timing-only kernel variants: base 8.74 ns/sym, cos removed 6.15, whole
# noise block removed 4.96).  A uniform angle on the 2^24 grid splits
# exactly into 2 quadrant bits + a 22-bit fraction t, and on the quarter
# range cos/sin are degree-5 polynomials in t^2 (near-minimax Chebyshev
# fits, max abs error 2.2e-10 / 2.7e-11 — two decades below f32 ulp, the
# same accuracy class as the library cos).  The quadrant rotation is two
# selects and two sign flips, so the whole (cos, sin) pair costs ~14 VPU
# FMA/select ops with no range-reduction divide.
_COS_Z = (0.9999999997799593, -1.2337005342705918, 0.253669322476019,
          -0.020862687553451876, 0.0009177238850913491,
          -2.3824535570835603e-05)
_SINC_Z = (1.5707963267681528, -0.6459640955781804, 0.0796926037175787,
           -0.004681657796259286, 0.0001602546914451647,
           -3.4318293237942273e-06)


def _horner(z, coefs):
    acc = jnp.full_like(z, np.float32(coefs[-1]))
    for c in coefs[-2::-1]:
        acc = acc * z + np.float32(c)
    return acc


def _cossin_u24(u):
    """(cos, sin) of theta = 2*pi*u/2^24 for int32 u in [0, 2^24).

    Exact quadrant decomposition + quarter-range minimax polynomials (see
    the coefficient comment above).  The angle grid is the same 24-bit
    lattice the previous 2*pi*uniform24 -> jnp.cos path sampled, so the
    noise distribution class is unchanged; sin comes from its own odd
    polynomial t*P(t^2), which is *more* accurate near the axes than the
    old +-sqrt(1-cos^2) (no cancellation lumpiness below 3e-4).
    """
    q = u >> 22
    t = (u & 0x3FFFFF).astype(jnp.float32) * np.float32(2.0**-22)
    z = t * t
    c = _horner(z, _COS_Z)
    s = t * _horner(z, _SINC_Z)
    swap = (q & 1) == 1
    c0 = jnp.where(swap, s, c)
    s0 = jnp.where(swap, c, s)
    c0 = jnp.where(((q ^ (q >> 1)) & 1) == 1, -c0, c0)
    s0 = jnp.where(q >= 2, -s0, s0)
    return c0, s0


def psk_sector_arith(er, ei, order: int):
    """``round(angle(z) * M / 2pi) mod M`` without atan2.

    The backend's Mosaic has no atan2, so the PSK hard decision
    (mapping.psk_index_planar semantics, reference constellation/models.py
    nearest-neighbour on the unit circle) is computed by a rotation-based
    binary search: successively test which half of the remaining arc the
    point lies in and rotate it back by the corresponding constant phasor.
    log2(M)+1 sign tests, log2(M)-2 constant complex multiplies; exact up
    to f32 rounding at sector boundaries (measure zero under noise).

    Works both inside a Pallas kernel and as plain jax/XLA ops (tested
    against arctan2 in tests/test_pallas_link.py).
    """
    m = order
    neg = ei < 0.0
    s = jnp.where(neg, m // 2, 0)
    er = jnp.where(neg, -er, er)
    ei = jnp.where(neg, -ei, ei)
    if m >= 4:
        c = er < 0.0
        s = s + jnp.where(c, m // 4, 0)
        nr = jnp.where(c, ei, er)
        ni = jnp.where(c, -er, ei)
        er, ei = nr, ni
    ang, step = np.pi / 4, m // 8
    while step >= 1:
        ca, sa = np.float32(np.cos(ang)), np.float32(np.sin(ang))
        t = ei * ca - er * sa >= 0.0
        s = s + jnp.where(t, step, 0)
        nr = er * ca + ei * sa
        ni = ei * ca - er * sa
        er = jnp.where(t, nr, er)
        ei = jnp.where(t, ni, ei)
        ang, step = ang * 0.5, step // 2
    ca, sa = np.float32(np.cos(np.pi / m)), np.float32(np.sin(np.pi / m))
    t = ei * ca - er * sa >= 0.0
    return (s + jnp.where(t, 1, 0)) & (m - 1)


def psk_sector_arith_vec(er, ei, mrow, cpm, spm, max_order: int):
    """Per-lane-order PSK sector: ``round(angle(z) * M_k/2pi) mod M_k``.

    The vector-order form of `psk_sector_arith` for adaptive PSK: ``mrow``
    is a broadcastable int32 row of per-lane orders (1 on inactive lanes —
    their sector masks to 0), ``cpm``/``spm`` are per-lane
    ``cos(pi/M_k)``/``sin(pi/M_k)`` rows for the final half-step test, and
    ``max_order`` is the static loop bound (the largest loaded order).
    The rotation constants are shared across lanes (they depend only on
    the iteration); lanes whose per-lane step has reached 0 stop both
    accumulating and rotating, so every lane lands exactly where the
    scalar search at its own order would.  Exact up to f32 rounding at
    sector boundaries, like the scalar form.
    """
    neg = ei < 0.0
    s = jnp.where(neg, mrow >> 1, 0)
    er = jnp.where(neg, -er, er)
    ei = jnp.where(neg, -ei, ei)
    if max_order >= 4:
        c = (er < 0.0) & (mrow >= 4)
        s = s + jnp.where(c, mrow >> 2, 0)
        nr = jnp.where(c, ei, er)
        ni = jnp.where(c, -er, ei)
        er, ei = nr, ni
    ang, shift = np.pi / 4, 3
    while (max_order >> shift) >= 1:
        step = mrow >> shift
        ca, sa = np.float32(np.cos(ang)), np.float32(np.sin(ang))
        t = (ei * ca - er * sa >= 0.0) & (step >= 1)
        s = s + jnp.where(t, step, 0)
        nr = er * ca + ei * sa
        ni = ei * ca - er * sa
        er = jnp.where(t, nr, er)
        ei = jnp.where(t, ni, ei)
        ang, shift = ang * 0.5, shift + 1
    t = ei * cpm - er * spm >= 0.0
    return (s + jnp.where(t, 1, 0)) & (mrow - 1)


def boxmuller_sample(seed0: int, seed1: int, shape, interpret: bool = False):
    """Sample (z0, z1) N(0,1) planes with the fused kernel's EXACT noise chain.

    Same ops in the same order as the kernel's AWGN block (hardware PRNG ->
    24-bit uniforms -> Box-Muller radius -> quarter-range polynomial phase),
    so moment-testing these planes pins the kernel noise path numerically.
    Used by bench.py's always-on moment gate (every scored bench run checks
    mean/var/3-sigma tail on the real chip) and by the deep opt-in hardware
    test (tests/test_tpu_hardware.py).  ``shape`` rows must divide by 2048
    or be <= 2048.
    """
    rows, lanes = shape
    blk = min(rows, 2048)
    if rows % blk:
        raise ValueError(f"rows {rows} not a multiple of block {blk}")

    def kern(seed_ref, z0_ref, z1_ref):
        pltpu.prng_seed(
            seed_ref[0] + pl.program_id(0) * jnp.int32(-1640531527), seed_ref[1]
        )
        rbits = pltpu.bitcast(pltpu.prng_random_bits(z0_ref.shape), jnp.int32)
        u1 = jnp.maximum(
            ((rbits >> 8) & 0xFFFFFF).astype(jnp.float32) * _INV_2_24, _INV_2_24
        )
        b2 = pltpu.bitcast(pltpu.prng_random_bits(z0_ref.shape), jnp.int32)
        rad = jnp.sqrt(-2.0 * jnp.log(u1))
        co, si = _cossin_u24((b2 >> 8) & 0xFFFFFF)
        z0_ref[:] = rad * co
        z1_ref[:] = rad * si

    return pl.pallas_call(
        kern,
        grid=(rows // blk,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)],
        out_specs=(pl.BlockSpec((blk, lanes), lambda i: (i, 0)),) * 2,
        out_shape=(jax.ShapeDtypeStruct(shape, jnp.float32),) * 2,
        interpret=pltpu.InterpretParams() if interpret else False,
    )(jnp.asarray([seed0, seed1], jnp.int32))


def selected_passes(runner) -> int:
    """bf16 split passes the fused kernel will use for `runner`'s config.

    matmul_passes="auto" picks the single bf16 pass when the constellation's
    decision half-distance is >= 0.07 (the bf16 ~6e-3 relative perturbation
    stays an order of magnitude below the slicing threshold), else the
    f32-grade bf16x3 split.  Exposed so the results dict can record which
    numeric mode produced a BER curve (ADVICE r1).
    """
    s = runner.setup
    cfg = s.cfg
    if cfg.matmul_passes != "auto":
        return int(cfg.matmul_passes)
    is_qam = cfg.constellation_type.value == "QAM"
    if s.is_adaptive:
        active = s.amap.orders[s.amap.orders > 0]
        if active.size == 0:
            return 1
        worst = int(active.max())  # largest order = smallest half-distance
        if is_qam:
            from ofdm_tpu.ops.mapping import make_constellation

            half_d = float(make_constellation("QAM", worst).scale)
        else:
            half_d = float(np.sin(np.pi / worst))
    else:
        half_d = (
            float(s.const.scale) if is_qam else float(np.sin(np.pi / cfg.constellation_order))
        )
    return 1 if half_d >= 0.07 else 3


def _adaptive_supported(s) -> bool:
    """Adaptive mode runs in-kernel for square-QAM order layouts (the
    CAPACITY_BASED QAM loader always produces even bit widths,
    mapping.qam_bit_loading_orders) and for power-of-2 PSK layouts (the
    vector-order rotation sector search, psk_sector_arith_vec)."""
    active = s.amap.orders[s.amap.orders > 0]
    if active.size == 0:
        return False
    if s.amap.kind == "QAM":
        roots = np.sqrt(active.astype(np.float64))
        return bool(np.all(np.round(roots) ** 2 == active))
    logs = np.round(np.log2(active.astype(np.float64)))
    return bool(np.all(2.0**logs == active))


def supports(runner, interpret: bool = False) -> bool:
    """Whether `runner`'s config can run the fused kernel (any TILE-multiple
    chunk size).  Used by LinkRunner.run() to round the scanned bulk down to
    a _TILE multiple instead of silently falling back to the XLA path."""
    s = runner.setup
    cfg = s.cfg
    is_qam = cfg.constellation_type.value == "QAM"
    order = cfg.constellation_order
    if plan_for(runner) is None:
        return False  # no layout fits the scoped-VMEM stack (see _plan)
    if s.is_adaptive:
        if not _adaptive_supported(s):
            return False
    else:
        if is_qam and int(np.sqrt(order)) ** 2 != order:
            return False
        if s.const.coding not in ("gray", "none"):
            return False
    # Halo (exact contiguous-stream) sharding keeps the fused kernel on
    # EVERY mode (round 5): for ISI-carrying modes each shard's
    # chunk-final carry is a pure function of its PRNG stream (the
    # kernel's carry OUT never reads the carry IN), so make_carry_probe
    # reproduces it cheaply BEFORE the chunk runs and parallel.sweep
    # ppermutes it between pallas_calls; for ISI-free diag links the
    # carry is vestigial (no ISI path consumes it), so the independent
    # wiring is already bit-identical to the chained stream and no
    # probe/exchange is needed at all.
    return not (jax.default_backend() in ("cpu", "gpu") and not interpret)


class _Spec(NamedTuple):
    """Static kernel signature — everything that shapes the compiled code.

    All data-dependent values (matrices, equalizer rows, adaptive order
    rows, channel gain) are runtime arguments, so two runners with equal
    specs share one executable (the whole point: SNR/channel/adaptive-order
    sweeps compile once)."""

    tiles: int
    tile: int  # grid-step row count (_plan)
    conv: str  # "mm" (merged-Toeplitz matmul) | "taps" (tap-shift, wide links)
    fold: bool  # conv folded into RX (CP/no-prefix): 2 matmuls, freq AWGN
    ctaps: int  # channel tap count (static loop bound; 0 in mm mode)
    ext: int  # mm mode: prev-tail lanes appended to the conv activation
    n: int
    L: int
    is_sc: bool
    mode: str  # "qam" | "psk" | "aqam" | "apsk"
    order: int  # 0 for aqam/apsk
    is_gray: bool
    bits: int  # bits per symbol; for aqam/apsk: static unroll width (max order)
    passes: int
    add_noise: bool
    method: EqualizationMethod
    interpret: bool
    # TX power scaling (config.apply_power_allocation): the traced (n,)
    # sqrt-power vector arrives as a lane-row kernel input and scales the
    # constellation points right after encode — exactly chunk_body's
    # cplx.scale(symbols, sqrt_power) (reference simulation/models.py:508,
    # applied in the experiment scripts).  Per-point waterfilling rows ride
    # the same executable (traced, like snr_db).
    apply_power: bool = False
    # Pre-demap global unit-power normalization (config.normalize_before_
    # demap; reference NORMALIZATION_FIX.md semantics).  The mean |data|^2
    # is measured per grid TILE (>= 64k samples) instead of per chunk —
    # the same estimator contract as the kernel's AWGN power measurement.
    # The QAM slicer-units fold moves from the equalizer stage to the
    # post-normalization scale (one fused multiply), so decisions match
    # chunk_body's normalize -> slice order exactly.
    normalize: bool = False
    # Experiment stage (noise_bump study; not reachable from
    # SimulationConfig): per-lane colored noise added AFTER equalization
    # (post_noise) and a per-lane 1/sqrt(P) compensation multiply
    # (compensate).  Their traced rows ride the sqrt_power argument as a
    # stacked (3, n) array [sqrt_power, inv_sqrt_power, noise_std] — see
    # make_noise_bump_chunk.
    post_noise: bool = False
    compensate: bool = False
    # PAPR sampling stride (diag mode only; 1 elsewhere): the TX time plane
    # is computed on every pstride-th grid tile.  See config.papr_stride.
    pstride: int = 1
    # Lane packing (diag mode only; 1 elsewhere): OFDM symbols per plane
    # row.  f32 planes tile to (8, 128) vregs, so an n=64 frequency plane
    # leaves half of every vreg's lanes empty — and the diag kernel is
    # VPU-bound, so a (rows/2, 2n) layout with per-lane constants tiled
    # x2 runs the whole elementwise chain at full lane utilization.
    # Measured basis: a 128-subcarrier diag link costs the SAME 4.07
    # ns/OFDM-symbol as the 64-subcarrier one (2026-08-19 probe), i.e.
    # per-bin cost halves at full lanes.  Applies to "diag" AND "mm"
    # (fold and ZP): block-diagonal matmuls of narrow matrices cost the
    # same MXU passes as unpacked ones (the extra symbol rides in the
    # (8, 128) systolic padding) — see _spec_for's pack selection.
    # "taps"/"mm4" (wide) stay unpacked.
    pack: int = 1
    # Wide-diag external PAPR: the TX matrices are MBs at >= 512
    # subcarriers and their mere VMEM residency cost a measured 20.4
    # ns/sym at 1024 sc even with the sampled matmul amortized to nothing
    # (stride-256 and manual-DMA-hoist null experiments, 2026-08-19 —
    # docs/PERFORMANCE.md).  In this mode the kernel carries NO TX
    # matrices at all (the diag BER chain never needs them) and the
    # runner computes the PAPR statistic from an XLA-side sampled
    # modulate, cached once per runner (pipeline.LinkRunner._papr_sample).
    txext: bool = False
    # Profiling-only block ablation (OFDM_TPU_KERNEL_ABLATE env var, comma
    # separated: notx, nopapr, nodemap, nored, noacc).  Produces WRONG statistics
    # by design — timing attribution only (tools/kernel_attrib.py).  Part
    # of the spec so ablated executables never alias real ones.
    ablate: str = ""
    # Chunk-0 symbol capture (LinkRunner.run collect_symbols): tile 0's
    # equalized data plane (slicer fold undone -> DATA units, the XLA
    # path's received_symbols) is written to two extra outputs.  The BER
    # chain is untouched, so the dumped points are BITWISE the counted
    # realization — no replay caveat.
    dump: bool = False
    # "lr" mode (low-rank ISI factorization, ops/lowrank.py): the tail
    # width E = min(taps-1, T) (unpadded; staged matrices pad to 8 lanes)
    # and the ZP colored-noise factor rank (0 = iid frequency noise).
    # The kernel carry is the (EP,) tail row; the EXTERNAL carry contract
    # stays (T,) with only the last E lanes meaningful (zeros elsewhere) —
    # exactly the lanes every consumer reads (the banded conv_t1 rows /
    # the mm kernel's ext select).
    lre: int = 0
    nrank: int = 0

    @property
    def T(self) -> int:
        return self.n + self.L


def _spec_for(runner, num_syms: int, interpret: bool) -> Optional[_Spec]:
    s = runner.setup
    cfg = s.cfg
    plan = plan_for(runner)
    if plan is None or not supports(runner, interpret):
        return None
    tile_max, conv = plan
    # The chunk arrives rounded to chunk_multiple() (<= 1024); take the
    # largest ladder tile that both fits VMEM and divides the chunk, so
    # large chunks amortize per-grid-step overhead (tile=4096 measured
    # ~10% over 1024 at the 64-sc headline) while small runs stay on the
    # kernel at a smaller tile.
    tile = next(
        (t for t in _TILE_LADDER if t <= tile_max and num_syms % t == 0), None
    )
    if tile is None:
        return None
    lrf = lr_factors(runner) if conv == "lr" else None
    # Lane packing (see _Spec.pack): p symbols per plane row while the
    # packed frequency width stays within one vreg's 128 lanes and the
    # packed tile keeps at least one full sublane group of rows.  diag
    # mode packs the pure-elementwise chain; fold mode ("mm" with conv
    # folded into RX — short-guard CP, no-prefix, SC-FDE) packs too: its
    # block-diagonal matmuls cost the SAME MXU passes as the unpacked
    # form (the second symbol rides in the (8,128) systolic padding the
    # narrow matrices waste anyway) and the cross-block tail columns of
    # the packed TX matrix keep the ISI carry a sublane roll.  Non-fold
    # "mm" (ZP) packs the same way: its block-diag conv matmul costs ~2x
    # the unpacked MXU passes, but narrow kernels are VPU-bound so
    # halving lane waste still wins.  "taps"/"mm4" (wide) stay unpacked.
    pack = 1
    if conv in ("diag", "mm"):
        while (
            pack * 2 * cfg.num_subcarriers <= 128
            and tile % (pack * 2) == 0
            and tile // (pack * 2) >= 8
        ):
            pack *= 2
    if s.is_adaptive:
        mode = "aqam" if s.amap.kind == "QAM" else "apsk"
        order = 0
        is_gray = True  # make_constellation default (mapping.py:148)
        # Static unroll width from the ACTUAL loaded orders.  The reference's
        # live gap-function path does NOT clamp to max_constellation_order
        # (constellation/models.py:297-321: order = 2^round(log2(1+SNR/Г)),
        # unbounded), so high-SNR points load orders above the config bound —
        # sizing the width from cfg.max_constellation_order made
        # _inv_gray_static and the BER popcount miss the high bits (exactly
        # one gray-level of corruption per coordinate, BER=1/bits, measured
        # on hardware at 36 dB flat/1024-QAM).  Rounding the width UP to the
        # config bound when the loaded orders stay below it keeps the spec
        # (and executable) stable across sweep points; extra unroll steps on
        # narrower words are exact no-ops (XOR bits above the width are 0).
        active = np.asarray(s.amap.orders)
        max_order = int(active.max()) if active.size else 2
        bits = max(
            int(np.log2(cfg.max_constellation_order)),
            max(1, int(np.log2(max(max_order, 2)))),
        )
    else:
        is_qam = cfg.constellation_type.value == "QAM"
        mode = "qam" if is_qam else "psk"
        order = cfg.constellation_order
        is_gray = s.const.coding == "gray"
        bits = s.const.bits_per_symbol
    return _Spec(
        tiles=num_syms // tile,
        tile=tile,
        conv=conv,
        fold=conv != "taps" and _fold_for(cfg),
        ctaps=len(np.asarray(s.taps)) if conv == "taps" else 0,
        ext=(
            linops.ext_width(len(np.asarray(s.taps)), cfg.num_subcarriers + s.prefix_length)
            if conv in ("mm", "mm4")
            else 0
        ),
        n=cfg.num_subcarriers,
        L=s.prefix_length,
        is_sc=cfg.modulation_type == ModulationType.SC_OFDM,
        mode=mode,
        order=order,
        is_gray=is_gray,
        bits=bits,
        passes=selected_passes(runner),
        add_noise=cfg.noise_type == NoiseType.AWGN,
        method=cfg.equalization_method,
        interpret=interpret,
        # auto = 32: ~one sampled tile per bench-sized chunk; measured knee
        # (64sc: 216.6M stride-1 -> 238.5M stride-8 -> 246.5M stride-32
        # marginal; wide 1024sc AWGN: 90.6 -> 64.9 -> ~52 ns/sym).
        pstride=(cfg.papr_stride or 32) if conv in ("diag", "lr") else 1,
        pack=pack,
        # papr_stride=1 is the explicit "exact in-kernel PAPR" opt-out.
        # apply_power keeps the TX matrices staged: _papr_sample (the
        # external-PAPR path) modulates unscaled symbols, so power-scaled
        # links compute their PAPR in-kernel from the scaled TX plane.
        # lr mode shares the external-PAPR contract: the PAPR statistic is
        # channel-independent (TX side only), so the same sampled XLA
        # modulate serves wide ISI links.
        txext=(
            conv in ("diag", "lr")
            and cfg.num_subcarriers >= 512
            and cfg.papr_stride != 1
            and not cfg.apply_power_allocation
        ),
        ablate=os.environ.get("OFDM_TPU_KERNEL_ABLATE", ""),
        apply_power=cfg.apply_power_allocation,
        normalize=cfg.normalize_before_demap,
        lre=0 if lrf is None else lrf.E,
        nrank=0 if lrf is None else lrf.noise_rank,
    )


def _tx_ext_matrix(spec: _Spec, ftx):
    """The mm-mode TX matrix: E duplicated tail columns so the kernel can
    build the [x | tail(prev)] activation with a sublane roll + lane select
    (no lane slicing); lane packing makes it block-diagonal.

    The packed TX matrix emits each block q's ext lanes from block
    (q-1) mod P's spectrum — so within a row every symbol's ISI tail is
    already in place at the matmul itself, block 0's ext holds block P-1's
    tail (consumed, after the sublane roll, as the previous ROW's
    last-symbol tail), and the cross-row carry stays a roll + select like
    the unpacked kernel.  Shared by _consts_for and the halo carry probe
    (the probe must reproduce the kernel's carry row BITWISE)."""
    n, T, E = spec.n, spec.T, spec.ext
    if spec.pack > 1:
        Pq, TEw = spec.pack, T + E
        fr0, fi0 = ftx
        fr = np.zeros((Pq * n, Pq * TEw), np.float64)
        fi = np.zeros_like(fr)
        for q in range(Pq):
            rows = slice(q * n, (q + 1) * n)
            fr[rows, q * TEw : q * TEw + T] = fr0
            fi[rows, q * TEw : q * TEw + T] = fi0
            if E:
                prev = ((q - 1) % Pq) * n
                prows = slice(prev, prev + n)
                fr[prows, q * TEw + T : (q + 1) * TEw] = fr0[:, T - E : T]
                fi[prows, q * TEw + T : (q + 1) * TEw] = fi0[:, T - E : T]
        return fr, fi
    fr, fi = ftx
    if E:
        fr = np.concatenate([fr, fr[:, T - E :]], axis=1)
        fi = np.concatenate([fi, fi[:, T - E :]], axis=1)
    return fr, fi


def _consts_for(runner, spec: _Spec) -> Tuple[jnp.ndarray, ...]:
    """This runner's data constants, in the kernel's unpack order."""
    s = runner.setup
    cfg = s.cfg
    n, L, T = spec.n, spec.L, spec.T

    quad = spec.conv == "mm4"
    ftx = linops.tx_matrix(n, cfg.prefix_type, L, cfg.modulation_type)
    rxm = linops.rx_matrix(n, cfg.prefix_type, L)
    if spec.conv == "diag":
        # ISI-free CP / flat link: the BER chain is an elementwise multiply
        # by the h_freq rows already staged for the equalizer — only the TX
        # matrix is staged (its output feeds the PAPR / measured-power
        # statistics alone).  Verify the diagonal identity numerically:
        # the folded matrix's prev-tail rows must vanish and
        # diag(F_tx @ C R) must equal h_freq.
        cmrx = linops.conv_rx_merged(s.taps, n, cfg.prefix_type, L)
        E = linops.ext_width(len(np.asarray(s.taps)), T)
        if E:
            tail = np.abs(cmrx[T:, :]).max()
            assert tail < 1e-12, f"diag mode: ISI rows not zero ({tail})"
        ftx_c = ftx[0] + 1j * ftx[1]
        d = np.einsum("kt,tk->k", ftx_c, cmrx[:T, :])
        h = np.asarray(s.h_freq, np.complex128)
        # f32 tolerance: the kernel stages h_freq as f32 rows, so agreement
        # beyond single precision is irrelevant (d itself is f64-exact).
        assert np.allclose(d, h, rtol=1e-5, atol=1e-7), "diag != h_freq"
        if spec.txext:
            # External PAPR (see _Spec.txext): no TX matrices in the
            # kernel at all — the diag BER chain is elementwise and the
            # PAPR statistic comes from the runner's sampled modulate.
            consts = []
        else:
            if spec.pack > 1:
                # Lane packing: the sampled-tile TX matmul maps a (rows,
                # p*n) packed frequency plane to a (rows, p*T) packed time
                # plane via the block-diagonal IDFT+guard matrix — PAPR /
                # measured-power statistics see exactly the same samples.
                eye = np.eye(spec.pack)
                ftx = (np.kron(eye, ftx[0]), np.kron(eye, ftx[1]))
            consts = _complex_matrix_consts(*ftx, spec.passes)
    elif spec.conv == "lr":
        # Low-rank ISI factorization (ops/lowrank.py): the banded chain
        # collapses to y = s*D + [t | t_prev] @ CrCp with t = s @ TailM —
        # two SKINNY matmuls (E = taps-1 tail lanes, padded to 8; both
        # corrections ride ONE stacked 2EP-deep operand) instead of the
        # dense (T+E)-wide chain, at any width.  The TX matrix is
        # staged only for the (strided) PAPR statistic; txext mode stages
        # none at all.  ZP adds the exact rank-r colored-noise factor B^H.
        f = lr_factors(runner)
        assert f is not None and f.E == spec.lre
        EP = _pad8(f.E)
        tail_p = np.zeros((n, EP), np.complex128)
        tail_p[:, : f.E] = f.tail
        # Cr and Cp stacked into ONE (2EP, n) operand: the kernel multiplies
        # the lane-concatenated [t | t_prev] activation by it in a single
        # MXU pass per output tile (K = 2EP <= 128 costs the same as
        # K = EP), halving the correction-matmul pass count vs separate
        # t@Cr + t_prev@Cp calls.
        crcp_p = np.zeros((2 * EP, n), np.complex128)
        crcp_p[: f.E] = f.cr
        crcp_p[EP : EP + f.E] = f.cp
        consts = [] if spec.txext else _complex_matrix_consts(*ftx, spec.passes)
        consts += _complex_matrix_consts(tail_p.real, tail_p.imag, spec.passes)
        consts += _complex_matrix_consts(crcp_p.real, crcp_p.imag, spec.passes)
        if spec.add_noise:
            # z = g1 + g2 @ B^H reproduces cov = 2 sigma^2 (I + B B^H)
            # = 2 sigma^2 Gram exactly (lowrank.py docstring); rank rows
            # padded to 8 with zeros (pad g2 lanes multiply zero rows).
            # Iid-noise links (nrank == 0: CP/none) stage an ALL-ZERO
            # factor — semantically exact, kept for Mosaic scheduling
            # (see the `colored` comment in _fn_for_spec: −11% measured).
            RP = _pad8(max(spec.nrank, 1))
            bh_p = np.zeros((RP, n), np.complex128)
            if spec.nrank > 0:
                bh_p[: spec.nrank] = f.bnoise.conj().T  # (r, n)
            consts += _complex_matrix_consts(bh_p.real, bh_p.imag, spec.passes)
    elif spec.conv == "taps":
        # Wide links: the convolution runs as tap-shift FMAs (no (T, T)
        # Toeplitz matrices staged in scoped VMEM); taps ride in SMEM.
        consts = _complex_matrix_consts(*ftx, spec.passes) + _complex_matrix_consts(
            *rxm, spec.passes
        )
    else:
        fr, fi = _tx_ext_matrix(spec, ftx)
        if spec.fold:
            # conv folded into RX: ONE (T+E, n) matrix replaces the
            # (T+E, T) Toeplitz + (T, n) RX pair (linops.conv_rx_merged;
            # AWGN moves to the frequency bins, exactly distributed).
            cmrx = linops.conv_rx_merged(s.taps, n, cfg.prefix_type, L)
            if spec.pack > 1:
                cmrx = np.kron(np.eye(spec.pack), cmrx)
            consts = _complex_matrix_consts(
                fr, fi, spec.passes, quad
            ) + _complex_matrix_consts(cmrx.real, cmrx.imag, spec.passes, quad)
        else:
            # ZP keeps the 3-matmul chain; packed links kron every stage.
            cm = linops.conv_matrix_merged(s.taps, T)
            rxm_r, rxm_i = rxm
            if spec.pack > 1:
                eye = np.eye(spec.pack)
                cm = np.kron(eye, cm)
                rxm_r, rxm_i = np.kron(eye, rxm_r), np.kron(eye, rxm_i)
            consts = (
                _complex_matrix_consts(fr, fi, spec.passes, quad)
                + _complex_matrix_consts(cm.real, cm.imag, spec.passes, quad)
                + _complex_matrix_consts(rxm_r, rxm_i, spec.passes, quad=quad)
            )  # 3 complex matrices x (2 | 3 | 6) bf16 splits
    if spec.is_sc:
        # SC-FDE RX back-end: equalized bins -> time symbols via one IDFT.
        from ofdm_tpu.ops.dft import dft_matrix

        fi_r, fi_i = dft_matrix(n, inverse=True)
        if spec.pack > 1:
            eye = np.eye(spec.pack)
            fi_r, fi_i = np.kron(eye, fi_r), np.kron(eye, fi_i)
        consts = consts + _complex_matrix_consts(fi_r, fi_i, spec.passes, quad)

    # Per-lane constant rows; lane packing tiles each row `pack` times so
    # lane j of every packed symbol sees its own subcarrier's constants.
    def _row(a, dtype=np.float32):
        r = np.asarray(a, dtype).reshape(1, n)
        return np.tile(r, (1, spec.pack)) if spec.pack > 1 else r

    # Slicer-units gain (0.5/scale per lane, see _demap_tile): folded into
    # the ZF gain rows here (and into the MMSE divide's numerator /
    # no-equalizer passthrough in the kernel) so the QAM demap needs no
    # per-bin divide or affine chain.
    if spec.mode == "qam":
        from ofdm_tpu.ops.mapping import make_constellation

        slicer = 0.5 / make_constellation("QAM", cfg.constellation_order).scale
    elif spec.mode == "aqam":
        from ofdm_tpu.ops.mapping import make_constellation

        orders = s.amap.orders
        active = orders > 0
        aq_scales = np.zeros(n, dtype=np.float64)
        for k_, o in enumerate(orders):
            if o > 0:
                aq_scales[k_] = make_constellation("QAM", int(o)).scale
        slicer = 0.5 * np.where(
            active, 1.0 / np.where(aq_scales == 0, 1.0, aq_scales), 1.0
        )
    else:
        slicer = None  # PSK demap is scale-invariant

    if spec.conv == "lr":
        # D = the circulant tap response (equals h_freq to fp precision for
        # every shipped prefix algebra — lowrank.factor verifies the full
        # reconstruction residual); staged as its own rows so the factored
        # chain stays self-contained.
        f = lr_factors(runner)
        consts.append(_row(f.d.real))
        consts.append(_row(f.d.imag))

    h = s.h_freq.astype(np.complex128)
    consts.append(_row(h.real))
    consts.append(_row(h.imag))
    consts.append(_row(np.abs(h) ** 2))
    # ZF gain rows precomputed with the reference's exact dead-bin semantics
    # (equalization/models.py:22-35): H==0 bins divide by eps=1e-10, giving
    # huge (not zero) symbols — matching the XLA path's intent exactly.
    # Under normalize_before_demap the slicer fold moves to the
    # post-normalization scale (the mean |data|^2 must be measured in data
    # units, chunk_body's normalize -> slice order), so ZF rows stay raw.
    h_z = np.where(h == 0, np.complex128(1e-10), h)
    zf_g = 1.0 / h_z
    if (
        spec.method == EqualizationMethod.ZF
        and slicer is not None
        and not spec.normalize
    ):
        zf_g = zf_g * slicer
    consts.append(_row(zf_g.real))
    consts.append(_row(zf_g.imag))
    if _mseg_for(spec.method, spec.pack):
        # Per-OFDM-symbol MMSE noise-variance estimate under lane packing:
        # the per-row mean becomes a per-n-lane-segment mean, computed as
        # one bf16 matmul with the block-diagonal averaging matrix (each
        # output lane receives its own symbol's mean |rx|^2 — the exact
        # per-row semantics of equalization/models.py:39-49, already
        # broadcast per lane).
        # Precision (ADVICE r3) at minimum issue-slot cost (the r4 bf16x3
        # _mm3 form cost the packed headline ~5% — round-5 bisect): the
        # staged matrix is the block-diagonal ONES matrix — EXACT in bf16 —
        # so a 2-pass hi/lo-activation matmul yields the exact-to-~1e-7
        # per-segment SUM, and the 1/n mean folds into the scalar nv chain
        # (one f32 multiply).  Matches the unpacked f32 per-row mean to
        # ~1e-7 relative (test-pinned, test_packed_mmse_matches_unpacked).
        mseg = np.kron(np.eye(spec.pack), np.ones((n, n)))
        consts.append(_split_const(mseg)[0])  # hi == the exact ones matrix

    if spec.mode == "aqam":
        # Per-subcarrier order parameters as (1, n) lane rows.  Inactive
        # subcarriers (order 0) get mask=0, m=1, logm=0, scale=0, and a
        # slicer-gain row of 0.5: tx and rx indices then both evaluate to
        # 0 with no bit errors — no separate "active" row is needed.
        m_side = np.where(active, np.round(np.sqrt(np.maximum(orders, 1))), 1).astype(np.int64)
        logm = np.where(active, np.round(np.log2(np.maximum(m_side, 1))), 0).astype(np.int64)
        consts.append(_row(np.where(active, orders - 1, 0), np.int32))
        consts.append(_row(m_side, np.int32))
        consts.append(_row(logm, np.int32))
        consts.append(_row(aq_scales))
        # The pre-halved slicer gain row (0.5/scale; see _demap_tile).
        consts.append(_row(slicer))
    elif spec.mode == "apsk":
        # Adaptive PSK lane rows: masked index draw (order_k - 1; 0 on
        # inactive lanes), per-lane order / bit-width for the encoder's
        # 24-bit angle lattice, the 0/1 amplitude row (inactive lanes
        # transmit 0, matching adaptive.encode_from_indices_planar), and
        # the half-step cos/sin rows for psk_sector_arith_vec's final test.
        orders_p = np.asarray(s.amap.orders)
        active_p = orders_p > 0
        m_eff = np.where(active_p, np.maximum(orders_p, 1), 1).astype(np.int64)
        consts.append(_row(np.where(active_p, orders_p - 1, 0), np.int32))
        consts.append(_row(m_eff, np.int32))
        consts.append(
            _row(np.where(active_p, np.round(np.log2(m_eff)), 0), np.int32)
        )
        consts.append(_row(active_p.astype(np.float64)))
        consts.append(_row(np.cos(np.pi / m_eff)))
        consts.append(_row(np.sin(np.pi / m_eff)))

    channel_gain = np.asarray([np.mean(np.abs(h) ** 2)], np.float32)  # SMEM scalar
    head = [jnp.asarray(channel_gain)]
    if spec.conv == "taps":
        taps = np.asarray(s.taps, np.complex128)
        head.append(jnp.asarray(np.asarray(taps.real, np.float32)))
        head.append(jnp.asarray(np.asarray(taps.imag, np.float32)))
    return tuple(head) + tuple(jnp.asarray(c) for c in consts)


def _gray_static(i):
    return i ^ (i >> 1)


def _inv_gray_static(g, width: int):
    shift = 1
    while shift < width:
        g = g ^ (g >> shift)
        shift <<= 1
    return g


def _qam_geometry(order: int):
    from ofdm_tpu.ops.mapping import make_constellation

    m_side = int(np.sqrt(order))
    return m_side, int(np.log2(m_side)), np.float32(make_constellation("QAM", order).scale)


def _encode_tile(spec: _Spec, raw, aq):
    """Random bits -> (tx_idx, sr, si) constellation points (arithmetic codec).

    Shared by every kernel builder so the TX math is identical across conv
    modes.  ``aq`` = (mask, mrow, logm, scale) loaded rows for adaptive QAM,
    (mask, bitsrow, amp) for adaptive PSK.
    """
    if spec.mode == "apsk":
        # Per-lane masked draw, then the fixed-mode PSK arithmetic with
        # per-lane bit widths: the 24-bit angle lattice shift and the
        # inverse-gray unroll are exact for any word narrower than
        # spec.bits (higher bits are 0), and inactive lanes (bits=0,
        # mask=0) transmit amplitude 0 like the XLA adaptive codec.
        mask, bitsrow, amp = aq
        tx_idx = raw & mask
        p = _inv_gray_static(tx_idx, spec.bits) if spec.is_gray else tx_idx
        cs, sn = _cossin_u24(p << (24 - bitsrow))
        return tx_idx, cs * amp, sn * amp
    if spec.mode == "aqam":
        # Per-subcarrier masked draw: uniform bits & (order_k - 1) is a
        # uniform index for subcarrier k (ops.adaptive.index_mask).
        mask, mrow, lrow, srow = aq
        tx_idx = raw & mask
        # Vectorized gray/zigzag grid walk: qam_point_planar with
        # per-lane (m, scale); shifts replace // and % (m power of 2).
        row = tx_idx >> lrow
        col = tx_idx & (mrow - 1)
        colz = jnp.where((row & 1) == 1, mrow - 1 - col, col)
        p = _gray_static((row << lrow) | colz)
        mf = mrow.astype(jnp.float32)
        c2 = (p & (mrow - 1)).astype(jnp.float32)
        r2 = (p >> lrow).astype(jnp.float32)
        sr = (2.0 * c2 - (mf - 1.0)) * srow
        si = ((mf - 1.0) - 2.0 * r2) * srow
        return tx_idx, sr, si
    order = spec.order
    if spec.mode == "qam":
        m_side, logm, scale = _qam_geometry(order)
        tx_idx = raw & (order - 1)
        # Gray/zigzag grid walk (mapping.qam_point_planar semantics).
        row = tx_idx >> logm
        col = tx_idx & (m_side - 1)
        colz = jnp.where((row & 1) == 1, m_side - 1 - col, col)
        p = _gray_static((row << logm) | colz) if spec.is_gray else tx_idx
        c2 = (p & (m_side - 1)).astype(jnp.float32)
        r2 = (p >> logm).astype(jnp.float32)
        sr = (2.0 * c2 - (m_side - 1)) * scale
        si = ((m_side - 1) - 2.0 * r2) * scale
        return tx_idx, sr, si
    tx_idx = raw & (order - 1)
    # PSK: table[i] = exp(2pi*j*inverse_gray(i)/M).  The angle 2pi*p/M is
    # exactly p << (24 - log2 M) on the 24-bit lattice, so the encoder
    # shares the quarter-range polynomial pair with the AWGN phase
    # (coefficient f32 rounding puts p=0 exactly at 1+0j).
    p = _inv_gray_static(tx_idx, spec.bits) if spec.is_gray else tx_idx
    cs, sn = _cossin_u24(p << (24 - spec.bits))
    return tx_idx, cs, sn


def _demap_tile(spec: _Spec, er, ei, aq):
    """Equalized points -> rx indices (O(1) arith slicer / PSK sector).

    QAM/adaptive-QAM inputs arrive in SLICER UNITS: the 0.5/scale factor
    is folded into the equalizer stage upstream (the MMSE divide's
    numerator / host-pre-scaled ZF gain rows — zero extra ops there), so
    the slicer is one add + round + convert per axis with FREE int32
    clips, instead of a per-bin divide plus the affine chain.  PSK demap
    is scale-invariant and takes raw symbols.

    ``aq`` = (mrow, logm) loaded rows for adaptive QAM,
    (mrow, cpm, spm) for adaptive PSK."""
    bits = spec.bits
    if spec.mode == "apsk":
        mrow, cpm, spm = aq
        sector = psk_sector_arith_vec(er, ei, mrow, cpm, spm, 1 << bits)
        return _gray_static(sector) if spec.is_gray else sector
    if spec.mode == "aqam":
        mrow, lrow = aq
        mf = mrow.astype(jnp.float32)
        c0 = (mf - 1.0) * 0.5  # (1, W) row math — negligible
        # Clip in FLOAT before the int32 cast: dead bins (h_freq == 0) give
        # ZF gains ~1e10 in slicer units, and float->int conversion out of
        # int32 range is implementation-defined in the XLA/LLVM lowering
        # (ADVICE r3).  The float clip is well-defined for any input.
        cc = jnp.clip(jnp.round(er + c0), 0.0, mf - 1.0).astype(jnp.int32)
        rr = jnp.clip(jnp.round(c0 - ei), 0.0, mf - 1.0).astype(jnp.int32)
        pp = rr * mrow + cc
        j = _inv_gray_static(pp, bits)
        rowj = j >> lrow
        colj = j & (mrow - 1)
        colzj = jnp.where((rowj & 1) == 1, mrow - 1 - colj, colj)
        return (rowj << lrow) | colzj
    if spec.mode == "qam":
        m_side, logm, _ = _qam_geometry(spec.order)
        c0 = np.float32((m_side - 1) * 0.5)
        # Float clip before the int cast — see the aqam branch (ADVICE r3).
        mf1 = np.float32(m_side - 1)
        cc = jnp.clip(jnp.round(er + c0), 0.0, mf1).astype(jnp.int32)
        rr = jnp.clip(jnp.round(c0 - ei), 0.0, mf1).astype(jnp.int32)
        pp = rr * m_side + cc
        if not spec.is_gray:
            return pp
        j = _inv_gray_static(pp, bits)
        rowj = j >> logm
        colj = j & (m_side - 1)
        colzj = jnp.where((rowj & 1) == 1, m_side - 1 - colj, colj)
        return (rowj << logm) | colzj
    sector = psk_sector_arith(er, ei, spec.order)
    return _gray_static(sector) if spec.is_gray else sector


@functools.lru_cache(maxsize=None)
def _fn_for_spec(spec: _Spec):
    """Build the per-spec shared chunk function (kernel + pallas_call).

    Returned callable: fn(key, carry: CArray (T,), snr_db, sqrt_power,
    consts) -> (stats dict, new_carry).  Cached so equal specs return the
    SAME function object — pipeline's shared jit cache then reuses one
    compiled executable across runners.
    """
    n, L, T = spec.n, spec.L, spec.T
    is_aqam = spec.mode == "aqam"
    is_apsk = spec.mode == "apsk"
    bits = spec.bits
    passes = spec.passes
    tiles = spec.tiles
    TILE = spec.tile
    add_noise = spec.add_noise
    method = spec.method
    is_sc = spec.is_sc
    conv_taps = spec.conv == "taps"
    quad = spec.conv == "mm4"  # 4-mult complex matmuls (wide links)
    diag = spec.conv == "diag"  # ISI-free: conv+RX == diag(h_freq) exactly
    lr_mode = spec.conv == "lr"  # low-rank factored ISI (ops/lowrank.py)
    fold = spec.fold  # conv+RX as one matmul, AWGN per frequency bin
    ctaps = spec.ctaps
    ext = spec.ext  # mm mode: prev-tail lanes in the conv activation
    TE = T + ext  # width of the TX output / prev planes / carry rows
    # lr mode: tail lanes padded to a full sublane group; colored ZP noise
    # factor rank (0 = iid frequency noise, CP/none prefixes).  Iid-noise
    # lr links (CP/none) run the SAME colored block with a ZERO factor
    # (z = g1 + g2 @ 0 — exact): the extra independent rank-8 draws +
    # matmul give Mosaic work to overlap the serialized noise chain with,
    # measured 2026-08-20 at 4096 sc CP-0.5 MMSE: 54.4 -> 48.4 ps/bin
    # (-11%!) vs the block ABSENT — the iid kernel was a strict work
    # subset of the colored one yet ran 12% slower (same-process
    # interleaved A/B; L/T geometry ruled out via ZP-0.5 at 48.0).
    EP = _pad8(spec.lre) if lr_mode else 0
    colored = lr_mode and add_noise
    RP = _pad8(max(spec.nrank, 1)) if colored else 0
    # taps mode reads full previous rows; mm mode only the ext tail lanes;
    # lr mode rolls its own (EP-wide) tail planes inline.
    need_prev = (conv_taps and ctaps > 1) or ext > 0
    # Lane packing (diag + fold modes — see _Spec.pack): P symbols per
    # plane row.  CW is the packed time-plane / carry-row width (the tail
    # row width in lr mode).
    P = spec.pack
    ROWS = TILE // P  # plane rows per grid step (still TILE symbols)
    W = P * n  # frequency-plane width
    CW = EP if lr_mode else P * TE  # time/tail-plane width == carry row width
    has_mseg = _mseg_for(method, P)

    def kernel(
        seed_ref,  # SMEM (2,) i32: key words
        snr_ref,  # SMEM (1,) f32
        cg_ref,  # SMEM (1,) f32: mean |H|^2 (MMSE)
        *args,
    ):
        ncm = 2 if quad else (3 if passes == 1 else 6)  # splits per matrix
        if conv_taps:
            (htr_ref, hti_ref, carry_re_ref, carry_im_ref, *refs) = args
            ftx_c, rx_c = refs[:ncm], refs[ncm : 2 * ncm]
            rest = refs[2 * ncm :]
        elif diag:
            # Only the TX matrix is staged (none at all in txext mode);
            # the BER chain multiplies by the h_freq rows (unpacked below
            # with the equalizer constants).
            (carry_re_ref, carry_im_ref, *refs) = args
            ncm_tx = 0 if spec.txext else ncm
            ftx_c = refs[:ncm_tx]
            rest = refs[ncm_tx:]
        elif lr_mode:
            # [ftx?] + TailM + CrCp [+ B^H] — the TX matrix only feeds
            # the (strided) PAPR statistic, like diag mode.  CrCp is the
            # stacked (2EP, n) correction operand for the concatenated
            # [t | t_prev] activation (one matmul, half the passes).
            (carry_re_ref, carry_im_ref, *refs) = args
            ncm_tx = 0 if spec.txext else ncm
            ftx_c = refs[:ncm_tx]
            tail_c = refs[ncm_tx : ncm_tx + ncm]
            crcp_c = refs[ncm_tx + ncm : ncm_tx + 2 * ncm]
            off0 = ncm_tx + 2 * ncm
            if colored:
                bh_c = refs[off0 : off0 + ncm]
                off0 += ncm
            rest = refs[off0:]
        elif fold:
            # conv folded into RX: [ftx | cmrx] only (cv_c IS the RX).
            (carry_re_ref, carry_im_ref, *refs) = args
            ftx_c, cv_c = refs[:ncm], refs[ncm : 2 * ncm]
            rest = refs[2 * ncm :]
        else:
            (carry_re_ref, carry_im_ref, *refs) = args
            ftx_c, cv_c, rx_c = (
                refs[:ncm],
                refs[ncm : 2 * ncm],
                refs[2 * ncm : 3 * ncm],
            )
            rest = refs[3 * ncm :]
        if is_sc:
            idft_c = rest[:ncm]
            rest = rest[ncm:]
        if lr_mode:
            (dre_ref, dim_ref, *rest) = rest
        (hre_ref, him_ref, habs2_ref, zfgr_ref, zfgi_ref, *rest) = rest
        if has_mseg:
            (mseg_ref, *rest) = rest
        if is_aqam:
            (mask_ref, mrow_ref, logm_ref, scale_ref, invs_ref, *rest) = rest
        if is_apsk:
            (pmask_ref, pm_ref, pbits_ref, pamp_ref, pcpm_ref, pspm_ref, *rest) = rest
        # Traced per-point lane rows (inputs, not consts — they vary per
        # sweep point like snr_db): TX sqrt-power, 1/sqrt(P) compensation,
        # post-equalization colored-noise std.
        if spec.apply_power:
            (sp_ref, *rest) = rest
        if spec.compensate:
            (comp_ref, *rest) = rest
        if spec.post_noise:
            (nstd_ref, *rest) = rest
        if spec.dump:
            (
                be_ref, se_ref, pmax_ref, psum_ref, cout_re_ref, cout_im_ref,
                dump_re_ref, dump_im_ref, prev_re, prev_im,
            ) = rest
        else:
            (
                be_ref, se_ref, pmax_ref, psum_ref, cout_re_ref, cout_im_ref,
                prev_re, prev_im,
            ) = rest
        i = pl.program_id(0)
        pltpu.prng_seed(seed_ref[0] + i * jnp.int32(-1640531527), seed_ref[1])
        # Mosaic lacks scalar powf; 10^(x/10) == exp(x * ln(10)/10).
        snr_lin = jnp.exp(snr_ref[0] * np.float32(np.log(10.0) / 10.0))

        # --- TX: random indices -> constellation points (arithmetic) -------
        raw = pltpu.bitcast(pltpu.prng_random_bits((ROWS, W)), jnp.int32)
        if is_aqam:
            aq_enc = (mask_ref[:], mrow_ref[:], logm_ref[:], scale_ref[:])
        elif is_apsk:
            aq_enc = (pmask_ref[:], pbits_ref[:], pamp_ref[:])
        else:
            aq_enc = None
        tx_idx, sr, si = _encode_tile(spec, raw, aq_enc)
        if spec.apply_power:
            # TX power scaling (chunk_body: cplx.scale(symbols, sqrt_power))
            # — everything downstream (PAPR plane, measured AWGN power, the
            # diag BER chain) sees the scaled symbols, like the XLA path.
            sp_row = sp_ref[:]
            sr = sr * sp_row
            si = si * sp_row

        # --- modulate (IDFT + guard) ------------------------------------------
        # mm mode: the TX matrix carries `ext` duplicated tail columns, so
        # the (TILE, TE) output already holds the lanes the ISI matmul needs.
        #
        # diag mode with pstride > 1: the time plane feeds ONLY the PAPR
        # statistic (noise power comes off the frequency plane by Parseval
        # and the BER chain is elementwise on sr/si), so the TX matmul runs
        # on every pstride-th grid tile.  PAPR becomes a strided-sample
        # estimator — papr_count (host side) reflects the sampled tiles —
        # and wide diag kernels shed their dominant MXU cost; error counts
        # are bit-identical across strides (tests/test_pallas_link.py).
        # Profiling-only ablations (spec.ablate; see _Spec) — each removes a
        # whole block's dependency chain so its cost can be attributed.
        abl = frozenset(filter(None, spec.ablate.split(",")))
        # txext mode legitimately runs the notx shape: no TX plane in the
        # kernel; the runner supplies the PAPR statistic (_papr_sample).
        abl_notx = ("notx" in abl or spec.txext) and diag
        abl_nopapr = "nopapr" in abl
        abl_nodemap = "nodemap" in abl
        abl_nored = "nored" in abl
        # noacc: compute the per-tile error reductions but store them only
        # on tile 0 (no cross-step SMEM read-modify-write) — separates the
        # reduction arithmetic's cost from the accumulation serialization.
        abl_noacc = "noacc" in abl

        # mm-mode lane masks: data lanes ((lane mod TE) < T) vs ext tail
        # lanes.  `lane_t` masks PAPR to data lanes; `take_prev` selects
        # the previous-row plane on the FIRST packed block's ext lanes
        # only — blocks q >= 1 already carry block q-1's tail, emitted by
        # the packed TX matrix's cross-block ext columns.
        lane_t = take_prev = None
        if ext:
            lane = jax.lax.broadcasted_iota(jnp.int32, (ROWS, CW), 1)
            lane_t = lane < T
            for q in range(1, P):
                lane_t = lane_t | ((lane >= q * TE) & (lane < q * TE + T))
            take_prev = (lane >= T) & (lane < TE)
        strided_papr = diag and spec.pstride > 1
        if lr_mode:
            # lr PAPR mirrors diag's strided/external contract, but the
            # carry is the tail plane (written in the conv section below),
            # so the sampled-TX block here touches ONLY the PAPR stats.
            strided_papr = True  # skip the generic TX/carry writes below
            if "notx" in abl or spec.txext:
                @pl.when(i == 0)
                def _():
                    pmax_ref[0, 0] = 0.0
                    psum_ref[0, 0] = 0.0
            else:
                @pl.when((i & (spec.pstride - 1)) == 0)
                def _():
                    xr_, xi_ = _cmatmul(
                        sr, si, tuple(c[:] for c in ftx_c), passes, quad
                    )
                    pwr = xr_ * xr_ + xi_ * xi_
                    first = i == 0
                    pmax_ref[0, 0] = jnp.where(
                        first, jnp.max(pwr), jnp.maximum(pmax_ref[0, 0], jnp.max(pwr))
                    )
                    psum_ref[0, 0] = jnp.where(
                        first, jnp.sum(pwr), psum_ref[0, 0] + jnp.sum(pwr)
                    )
        elif abl_notx:
            strided_papr = True  # skip the unconditional TX/carry writes below
            @pl.when(i == 0)
            def _():
                pmax_ref[0, 0] = 0.0
                psum_ref[0, 0] = 0.0
                cout_re_ref[0, :] = jnp.zeros((CW,), jnp.float32)
                cout_im_ref[0, :] = jnp.zeros((CW,), jnp.float32)
        elif strided_papr:
            @pl.when((i & (spec.pstride - 1)) == 0)
            def _():
                xr, xi = _cmatmul(
                    sr, si, tuple(c[:] for c in ftx_c), passes, quad
                )
                pwr = xr * xr + xi * xi
                pm, ps = jnp.max(pwr), jnp.sum(pwr)
                first = i == 0
                # On the first tile the accumulators are uninitialized; the
                # jnp.where discards the garbage-operand branch.
                pmax_ref[0, 0] = jnp.where(
                    first, pm, jnp.maximum(pmax_ref[0, 0], pm)
                )
                psum_ref[0, 0] = jnp.where(first, ps, psum_ref[0, 0] + ps)
                # Carry rows are vestigial in diag mode (no cross-symbol
                # ISI path consumes them) but the output must be written
                # (the raw last packed row; fn() slices the last symbol).
                cout_re_ref[0, :] = xr[ROWS - 1, :]
                cout_im_ref[0, :] = xi[ROWS - 1, :]
        else:
            xr, xi = _cmatmul(sr, si, tuple(c[:] for c in ftx_c), passes, quad)

            if abl_nopapr:
                @pl.when(i == 0)
                def _():
                    pmax_ref[0, 0] = 0.0
                    psum_ref[0, 0] = 0.0
            else:
                # PAPR partials (duplicated ext lanes masked; power >= 0 so
                # a 0 fill is exact for both the max and the sum).
                pwr = xr * xr + xi * xi
                if ext:
                    pwr = jnp.where(lane_t, pwr, 0.0)
                @pl.when(i == 0)
                def _():
                    pmax_ref[0, 0] = jnp.max(pwr)
                    psum_ref[0, 0] = jnp.sum(pwr)
                @pl.when(i != 0)
                def _():
                    pmax_ref[0, 0] = jnp.maximum(pmax_ref[0, 0], jnp.max(pwr))
                    psum_ref[0, 0] = psum_ref[0, 0] + jnp.sum(pwr)

        # --- convolution: merged intra + previous-symbol band ----------------
        # previous rows: roll down one sublane; row 0 <- carry
        if need_prev:
            pxr = pltpu.roll(xr, 1, 0)
            pxi = pltpu.roll(xi, 1, 0)
            first = jax.lax.broadcasted_iota(jnp.int32, (ROWS, CW), 0) == 0

            @pl.when(i == 0)
            def _():
                prev_re[:] = jnp.where(first, carry_re_ref[0, :][None, :], pxr)
                prev_im[:] = jnp.where(first, carry_im_ref[0, :][None, :], pxi)

            @pl.when(i != 0)
            def _():
                prev_re[:] = jnp.where(first, cout_re_ref[0, :][None, :], pxr)
                prev_im[:] = jnp.where(first, cout_im_ref[0, :][None, :], pxi)

        if diag:
            # ISI-free: the whole TX->conv->RX composite is diag(h_freq)
            # (verified numerically in _consts_for), so the frequency-bin
            # plane comes straight from the symbols — in f32, more accurate
            # than the bf16 matmul chain it replaces.  The time plane xr/xi
            # above still feeds the PAPR/measured-power statistics.
            hre0 = hre_ref[:]
            him0 = him_ref[:]
            yr = sr * hre0 - si * him0
            yi = sr * him0 + si * hre0
        elif lr_mode:
            # Low-rank factored chain (ops/lowrank.py): the block's last E
            # time samples t = s @ TailM (one SKINNY n->EP matmul) drive
            # both ISI corrections — y = s*D + t@Cr + t_prev@Cp — and the
            # cross-tile carry (t IS the tail the banded kernel exchanges).
            tr_, ti_ = _cmatmul(sr, si, tuple(c[:] for c in tail_c), passes, quad)
            ptr = pltpu.roll(tr_, 1, 0)
            pti = pltpu.roll(ti_, 1, 0)
            firstr = jax.lax.broadcasted_iota(jnp.int32, (ROWS, EP), 0) == 0

            @pl.when(i == 0)
            def _():
                prev_re[:] = jnp.where(firstr, carry_re_ref[0, :][None, :], ptr)
                prev_im[:] = jnp.where(firstr, carry_im_ref[0, :][None, :], pti)

            @pl.when(i != 0)
            def _():
                prev_re[:] = jnp.where(firstr, cout_re_ref[0, :][None, :], ptr)
                prev_im[:] = jnp.where(firstr, cout_im_ref[0, :][None, :], pti)

            # One (ROWS, 2EP) @ (2EP, n) matmul covers BOTH corrections:
            # lanes [0, EP) carry t (×Cr rows), lanes [EP, 2EP) carry
            # t_prev (×Cp rows) — K = 2EP <= 128 costs the same MXU pass
            # as K = EP, so this halves the correction pass count.
            act_r = jnp.concatenate([tr_, prev_re[:]], axis=1)
            act_i = jnp.concatenate([ti_, prev_im[:]], axis=1)
            cyr, cyi = _cmatmul(act_r, act_i, tuple(c[:] for c in crcp_c), passes, quad)
            dre0 = dre_ref[:]
            dim0 = dim_ref[:]
            yr = sr * dre0 - si * dim0 + cyr
            yi = sr * dim0 + si * dre0 + cyi
            # next tile's carry: this tile's last tail row
            cout_re_ref[0, :] = tr_[ROWS - 1, :]
            cout_im_ref[0, :] = ti_[ROWS - 1, :]
        elif conv_taps:
            # Tap-shift FMA form of the same banded Toeplitz product
            # (linops.conv_matrices semantics): lane c of tap k reads
            # x[c - k], or the previous row's tail prev[T - k + c] when
            # c < k — exactly the t0/t1 split, in pure f32.
            h0r, h0i = htr_ref[0], hti_ref[0]
            yr = h0r * xr - h0i * xi
            yi = h0r * xi + h0i * xr
            lane = jax.lax.broadcasted_iota(jnp.int32, (TILE, T), 1)
            for k in range(1, ctaps):
                skr = jnp.where(
                    lane < k, pltpu.roll(prev_re[:], k, 1), pltpu.roll(xr, k, 1)
                )
                ski = jnp.where(
                    lane < k, pltpu.roll(prev_im[:], k, 1), pltpu.roll(xi, k, 1)
                )
                hkr, hki = htr_ref[k], hti_ref[k]
                yr = yr + hkr * skr - hki * ski
                yi = yi + hkr * ski + hki * skr
        else:
            # One (TILE, TE) @ (TE, T) complex matmul: lanes < T are this
            # block, lanes >= T the previous block's tail (the E nonzero
            # rows of the T1 band) — linops.conv_matrix_merged.  In fold
            # mode the staged matrix is (TE, n) conv_rx_merged, so the
            # output is already the DFT'd, guard-stripped frequency block.
            if ext:
                # Previous-symbol tail lanes: block 0's ext from the
                # previous ROW's plane; blocks q >= 1 already hold block
                # q-1's tail in x itself (packed TX cross-block columns).
                actr = jnp.where(take_prev, prev_re[:], xr)
                acti = jnp.where(take_prev, prev_im[:], xi)
            else:
                actr, acti = xr, xi
            yr, yi = _cmatmul(actr, acti, tuple(c[:] for c in cv_c), passes, quad)
        # stash this tile's raw last row as the next tile's carry (strided
        # diag writes it inside the sampled-tile block above).  In packed
        # fold mode the row's block-0 ext lanes hold block P-1's tail —
        # exactly what the next tile's first-block select consumes — and
        # fn() slices the external (T,) carry from block P-1's data lanes.
        if not strided_papr:
            cout_re_ref[0, :] = xr[ROWS - 1, :]
            cout_im_ref[0, :] = xi[ROWS - 1, :]

        # --- AWGN -------------------------------------------------------------
        # fold mode adds the noise per frequency bin (width n, not T):
        # the RX strip+DFT is unitary on the kept samples, so iid complex
        # Gaussian noise commutes with it exactly (linops.conv_rx_merged),
        # and mean power over the n kept bins equals the time-domain mean
        # by Parseval (same per-tile estimator contract as before).
        if add_noise:
            # lr mode adds noise per frequency bin at any prefix: for
            # CP/none the strip+DFT rows are orthonormal (iid bins, the
            # fold argument); for ZP the rank-r factor below reproduces
            # cov = 2 sigma^2 Gram exactly.  The ZP measured-power scale
            # n/T converts the freq-bin mean (the n-sample overlap-added
            # window's energy) to the reference's T-sample time mean —
            # equal in expectation (lowrank.pw_scale).
            nshape = (ROWS, W) if (fold or lr_mode) else (ROWS, P * T)
            # lr mode draws the noise planes BEFORE the measured-power
            # reduction: sigma serializes on a full-plane mean of y, and
            # issuing the (independent) Box-Muller chain first gives the
            # scheduler work to hide that reduction behind (round-5 find,
            # ~1.5% on the lr cells).  NON-lr modes keep the original
            # mp_-first order: the extended z-plane live ranges pushed the
            # ZP 3-matmul chain 0.5 MB over the 100 MiB VMEM cap at tile
            # 8192 (measured compile OOM at 128 sc ZP; pre-reorder code
            # compiles the same shape at 100.5M-epsilon).
            if not lr_mode:
                if fold or diag:
                    # Sliced measured-power estimator (>= 2^16 samples —
                    # the full rationale is on the lr branch below) in the
                    # ORIGINAL pre-draw position.
                    rows_mp = min(ROWS, max(64, -(-65536 // W)))
                    yrm = yr[:rows_mp]
                    yim = yi[:rows_mp]
                    mp_ = jnp.mean(yrm * yrm + yim * yim)
                else:
                    # ZP time-domain (mm) chain: the row slice's extra
                    # staged planes pushed this kernel ~0.5 MB over the
                    # 100 MiB cap at tile 8192 (measured compile OOM at
                    # 128 sc) — keep the full-plane mean here.
                    mp_ = jnp.mean(yr * yr + yi * yi)
                sigma = jnp.sqrt(mp_ / snr_lin / 2.0)
            rbits = pltpu.bitcast(pltpu.prng_random_bits(nshape), jnp.int32)
            u1 = jnp.maximum(
                ((rbits >> 8) & 0xFFFFFF).astype(jnp.float32) * _INV_2_24, _INV_2_24
            )
            b2 = pltpu.bitcast(pltpu.prng_random_bits(nshape), jnp.int32)
            rad = jnp.sqrt(-2.0 * jnp.log(u1))
            # Box-Muller phase via the quarter-range polynomial pair
            # (_cossin_u24): a uniform 24-bit angle, cos AND sin for ~14
            # cheap VPU ops — the library cos alone was ~30% of the whole
            # kernel (see the _COS_Z comment).
            co, si_ = _cossin_u24((b2 >> 8) & 0xFFFFFF)
            zr_ = rad * co
            zi_ = rad * si_
            if lr_mode:
                # Measured power over a >= 2^16-sample row slice of the
                # tile: |y|^2 here exists ONLY to feed this scalar (the
                # MMSE |rx|^2 is computed post-noise), and the full-plane
                # multiply+reduce costs ~4 ps/bin at any width.  A
                # 64k-sample slice keeps the estimator std < 0.2%
                # (noise-power error an order below the bf16 tolerance
                # band) while cutting the estimator cost by the slice
                # ratio; the per-tile estimator contract (docs/PARITY.md)
                # is unchanged in kind — the tile mean was itself already
                # an estimate of the reference's whole-stream measurement
                # (noise/models.py:14-16).
                rows_mp = min(ROWS, max(64, -(-65536 // W)))
                yrm = yr[:rows_mp]
                yim = yi[:rows_mp]
                mp_ = jnp.mean(yrm * yrm + yim * yim)
                if not fold:
                    mp_ = mp_ * np.float32(n / T)
                sigma = jnp.sqrt(mp_ / snr_lin / 2.0)
            if colored:
                # ZP colored noise: z = g1 + g2 @ B^H (g2 iid complex
                # N(0,1) over RP rank lanes; pad lanes hit zero rows).
                gb1 = pltpu.bitcast(pltpu.prng_random_bits((ROWS, RP)), jnp.int32)
                gu1 = jnp.maximum(
                    ((gb1 >> 8) & 0xFFFFFF).astype(jnp.float32) * _INV_2_24,
                    _INV_2_24,
                )
                gb2 = pltpu.bitcast(pltpu.prng_random_bits((ROWS, RP)), jnp.int32)
                grad = jnp.sqrt(-2.0 * jnp.log(gu1))
                gco, gsi = _cossin_u24((gb2 >> 8) & 0xFFFFFF)
                cnr, cni = _cmatmul(
                    grad * gco, grad * gsi, tuple(c[:] for c in bh_c), passes, quad
                )
                zr_ = zr_ + cnr
                zi_ = zi_ + cni
            yr = yr + sigma * zr_
            yi = yi + sigma * zi_

        # --- RX (guard strip + DFT; a no-op in fold/lr modes) ----------------------
        if fold or lr_mode:
            fr, fi_ = yr, yi
        else:
            fr, fi_ = _cmatmul(yr, yi, tuple(c[:] for c in rx_c), passes, quad)

        # --- equalize ---------------------------------------------------------------
        # Slicer-units gain folded into the equalizer (see _demap_tile):
        # QAM scales by 0.5/scale (trace-time scalar), adaptive QAM by the
        # pre-halved per-lane inv-scale row, PSK not at all.  Under
        # normalize_before_demap the fold DEFERS to the post-normalization
        # scale (the mean |data|^2 must be measured in data units — the
        # XLA path's normalize -> slice order).
        if spec.mode == "qam":
            slicer_k = np.float32(0.5 / _qam_geometry(spec.order)[2])
        elif is_aqam:
            slicer_k = None  # invs_ref rows (already 0.5/scale per lane)
        else:
            slicer_k = np.float32(1.0)
        defer_slicer = spec.normalize and spec.mode in ("qam", "aqam")
        if method == EqualizationMethod.ZF:
            # ZF gain rows arrive pre-scaled to slicer units (host side;
            # raw under normalize — see _consts_for).
            gr = zfgr_ref[:]
            gi = zfgi_ref[:]
            er = fr * gr - fi_ * gi
            ei = fi_ * gr + fr * gi
        elif method == EqualizationMethod.MMSE:
            hre = hre_ref[:]
            him = him_ref[:]
            if has_mseg:
                # Packed rows hold P OFDM symbols: the per-row mean becomes
                # a per-n-lane-segment SUM via the block-diagonal ONES
                # matmul (exact bf16 weights; hi+lo activation passes keep
                # ~1e-7 vs the f32 mean), with the 1/n mean folded into the
                # scalar below — same per-OFDM-symbol noise-variance
                # semantics, result already per-lane.
                ph, plo = _split_act(fr * fr + fi_ * fi_)
                w1 = mseg_ref[:]
                sp = jnp.dot(
                    ph, w1, preferred_element_type=jnp.float32
                ) + jnp.dot(plo, w1, preferred_element_type=jnp.float32)
                nv = sp * (np.float32(1.0 / n) / snr_lin / cg_ref[0])
            else:
                sp = jnp.mean(fr * fr + fi_ * fi_, axis=1, keepdims=True)  # (Bt, 1)
                nv = sp / snr_lin / cg_ref[0]
            # The slicer gain rides the divide's numerator — zero extra ops.
            if defer_slicer:
                g = np.float32(1.0) / (habs2_ref[:] + nv)
            else:
                g = (invs_ref[:] if slicer_k is None else slicer_k) / (
                    habs2_ref[:] + nv
                )
            er = (fr * hre + fi_ * him) * g
            ei = (fi_ * hre - fr * him) * g
        else:
            if defer_slicer or slicer_k is not None and spec.mode != "qam":
                er, ei = fr, fi_
            elif slicer_k is None:
                er, ei = fr * invs_ref[:], fi_ * invs_ref[:]
            else:
                er, ei = fr * slicer_k, fi_ * slicer_k

        if is_sc:
            # SC-FDE: equalized frequency bins -> time-domain symbols.
            er, ei = _cmatmul(
                er, ei,
                tuple(c[:] for c in idft_c),
                passes,
                quad,
            )

        # --- post-equalization stages (experiment semantics; see _Spec) -------
        if spec.post_noise:
            # Colored noise per subcarrier AFTER equalization (reference
            # waterfilling_noise_bump_experiment.py:165-172), in data units
            # (the slicer fold is deferred under normalize).
            prow = nstd_ref[:]
            zb1 = pltpu.bitcast(pltpu.prng_random_bits((ROWS, W)), jnp.int32)
            zu1 = jnp.maximum(
                ((zb1 >> 8) & 0xFFFFFF).astype(jnp.float32) * _INV_2_24,
                _INV_2_24,
            )
            zb2 = pltpu.bitcast(pltpu.prng_random_bits((ROWS, W)), jnp.int32)
            zrad = jnp.sqrt(-2.0 * jnp.log(zu1))
            zco, zsi = _cossin_u24((zb2 >> 8) & 0xFFFFFF)
            er = er + prow * zrad * zco
            ei = ei + prow * zrad * zsi
        if spec.compensate:
            # 1/sqrt(P) power compensation (experiment :174-178; the 1e-10
            # dead-lane guard is applied host-side when building the row).
            crow = comp_ref[:]
            er = er * crow
            ei = ei * crow
        if spec.normalize:
            # Global unit-power normalization before demapping (chunk_body's
            # normalize_before_demap; reference NORMALIZATION_FIX.md /
            # experiment :180-183), measured per grid tile (same estimator
            # contract as the AWGN power measurement).  The deferred slicer
            # fold rides the same multiply.
            avg = jnp.mean(er * er + ei * ei)
            f = jnp.where(avg > 1e-10, 1.0 / jnp.sqrt(avg), 1.0)
            if defer_slicer:
                frow = f * (invs_ref[:] if slicer_k is None else slicer_k)
                er = er * frow
                ei = ei * frow
            else:
                er = er * f
                ei = ei * f

        # --- chunk-0 symbol capture (spec.dump) ---------------------------------------
        if spec.dump:
            # Undo the slicer-units fold so the dumped plane is in DATA
            # units (chunk_body's received_symbols): qam er = data *
            # (0.5/scale), aqam per-lane via the staged invs row, PSK raw.
            if spec.mode == "qam":
                unfold = np.float32(1.0 / float(slicer_k))
                der, dei = er * unfold, ei * unfold
            elif is_aqam:
                der, dei = er / invs_ref[:], ei / invs_ref[:]
            else:
                der, dei = er, ei

            @pl.when(i == 0)
            def _():
                dump_re_ref[:] = der
                dump_im_ref[:] = dei

        # --- demap (arith slicer) + error counts --------------------------------------
        if is_aqam:
            aq_dec = (mrow_ref[:], logm_ref[:])
        elif is_apsk:
            aq_dec = (pm_ref[:], pcpm_ref[:], pspm_ref[:])
        else:
            aq_dec = None
        rx_idx = tx_idx if abl_nodemap else _demap_tile(spec, er, ei, aq_dec)

        if abl_nored:
            @pl.when(i == 0)
            def _():
                be_ref[0, 0] = 0
                se_ref[0, 0] = 0
            return

        x = tx_idx ^ rx_idx
        # Accumulate the per-symbol popcount plane first, then reduce ONCE.
        # (A shift/and/add chain measures *faster* here than
        # lax.population_count, which Mosaic lowers to a longer sequence.)
        # The per-tile reductions run in f32 — exact while the plane total
        # stays below 2^24 (max = TILE*n*bits) — because the f32 tree
        # reduction is measurably faster than the int32 one; cross-tile
        # accumulation stays int32 in SMEM, so chunk counts remain exact.
        if bits >= 5:
            # SWAR popcount: 10 vector ops regardless of width (≤16 bits)
            # vs 1+3·(bits−1) for the naive chain.
            t = x - ((x >> 1) & 0x5555)
            t = (t & 0x3333) + ((t >> 2) & 0x3333)
            t = (t + (t >> 4)) & 0x0F0F
            pc = (t + (t >> 8)) & 0x1F if bits > 8 else t
        else:
            pc = x & 1
            for b in range(1, bits):
                pc = pc + ((x >> b) & 1)
        if TILE * n * bits < (1 << 24):
            berr = jnp.sum(pc.astype(jnp.float32)).astype(jnp.int32)
            serr = jnp.sum((x != 0).astype(jnp.float32)).astype(jnp.int32)
        else:
            berr = jnp.sum(pc, dtype=jnp.int32)
            serr = jnp.sum((x != 0).astype(jnp.int32))

        if abl_noacc:
            @pl.when(i == 0)
            def _():
                be_ref[0, 0] = berr
                se_ref[0, 0] = serr
            return

        @pl.when(i == 0)
        def _():
            be_ref[0, 0] = berr
            se_ref[0, 0] = serr
        @pl.when(i != 0)
        def _():
            be_ref[0, 0] = be_ref[0, 0] + berr
            se_ref[0, 0] = se_ref[0, 0] + serr

    # --- pallas_call wiring ---------------------------------------------------
    ncm_out = 2 if quad else (3 if passes == 1 else 6)
    if diag:
        n_cmats = 0 if spec.txext else 1
    elif lr_mode:
        # [ftx?] + TailM + CrCp [+ B^H]
        n_cmats = (0 if spec.txext else 1) + 2 + (1 if colored else 0)
    else:
        n_cmats = 2 if (conv_taps or fold) else 3
    n_vmem_consts = (
        (n_cmats + (1 if is_sc else 0)) * ncm_out
        + 5
        + (2 if lr_mode else 0)  # D rows
        + (1 if has_mseg else 0)
        + (5 if is_aqam else 0)
        + (6 if is_apsk else 0)
    )
    # Traced per-point lane rows (sqrt-power / compensation / noise-std).
    n_traced_rows = int(spec.apply_power) + int(spec.compensate) + int(spec.post_noise)
    n_smem = 5 if conv_taps else 3  # + tap re/im rows in taps mode
    vmem_full = pl.BlockSpec(memory_space=pltpu.VMEM)
    in_specs = (
        [pl.BlockSpec(memory_space=pltpu.SMEM)] * n_smem
        + [vmem_full] * 2  # carry planes (1, TE)
        + [vmem_full] * (n_vmem_consts + n_traced_rows)
    )
    out_shapes = [
        ((1, 1), jnp.int32),  # bit errors
        ((1, 1), jnp.int32),  # symbol errors
        ((1, 1), jnp.float32),  # papr max
        ((1, 1), jnp.float32),  # papr sum
        ((1, CW), jnp.float32),  # carry out re (raw row)
        ((1, CW), jnp.float32),  # carry out im
    ]
    if spec.dump:
        out_shapes += [((ROWS, W), jnp.float32)] * 2  # tile-0 data plane re/im
    out_shape = tuple(jax.ShapeDtypeStruct(sh, dt) for sh, dt in out_shapes)
    # Scalar accumulators live in SMEM (VMEM refs reject scalar stores).
    out_specs = tuple(
        pl.BlockSpec(
            shape,
            lambda i: (0, 0),
            memory_space=pltpu.SMEM if shape == (1, 1) else pltpu.VMEM,
        )
        for shape, _ in out_shapes
    )

    call = pl.pallas_call(
        kernel,
        grid=(tiles,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=[
            pltpu.VMEM((ROWS, CW), jnp.float32),  # prev_re
            pltpu.VMEM((ROWS, CW), jnp.float32),  # prev_im
        ],
        # CPU test coverage via the Mosaic emulator (plain interpret=True
        # cannot lower prng_seed on cpu); tests/test_pallas_link.py.
        interpret=pltpu.InterpretParams() if spec.interpret else False,
        # Raise Mosaic's ~16 MB default VMEM cap: this chip (v5e) has
        # 128 MiB of VMEM, and the wide-link stage sets + large grid tiles
        # _plan admits need it (see _VMEM_SCOPED_LIMIT; giant-width lr
        # links run right up against the chip with the 116 MiB cap).
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=(
                _VMEM_COMPILER_GIANT_LR
                if lr_mode and n >= _GIANT_LR_N
                else _VMEM_COMPILER_LIMIT
            )
        ),
    )
    num_syms = tiles * TILE

    def fn(key, carry: CArray, snr_db, sqrt_power, consts):
        # Traced per-point lane rows (tiled across the pack like the
        # constant rows).  In experiment mode (post_noise/compensate) the
        # sqrt_power argument is a stacked (3, n) array
        # [sqrt_power, inv_sqrt_power, noise_std] — see make_noise_bump_chunk.
        rows_in = []
        if spec.post_noise or spec.compensate:
            spv = jnp.asarray(sqrt_power, jnp.float32)
            sp_v, comp_v, nstd_v = spv[0], spv[1], spv[2]
        else:
            sp_v, comp_v, nstd_v = sqrt_power, None, None
        if spec.apply_power:
            rows_in.append(
                jnp.tile(jnp.asarray(sp_v, jnp.float32), spec.pack).reshape(1, W)
            )
        if spec.compensate:
            rows_in.append(jnp.tile(comp_v, spec.pack).reshape(1, W))
        if spec.post_noise:
            rows_in.append(jnp.tile(nstd_v, spec.pack).reshape(1, W))
        if conv_taps:
            cg, tre, tim, *mats = consts
            smem_extra = (tre, tim)
        else:
            cg, *mats = consts
            smem_extra = ()
        data = jax.random.key_data(key).reshape(-1).astype(jnp.uint32)[:2].astype(jnp.int32)
        if lr_mode:
            # The kernel carry is the (EP,) tail row: the external (T,)
            # carry's last E lanes, zero-padded to the sublane group.
            pad = EP - spec.lre
            base_re = jnp.concatenate(
                [carry.re[T - spec.lre :], jnp.zeros((pad,), jnp.float32)]
            )
            base_im = jnp.concatenate(
                [carry.im[T - spec.lre :], jnp.zeros((pad,), jnp.float32)]
            )
        elif ext:
            # External carry contract stays (T,); the kernel's carry rows
            # carry the ext (duplicated-tail) layout the TX plane uses.
            base_re = jnp.concatenate([carry.re, carry.re[T - ext :]])
            base_im = jnp.concatenate([carry.im, carry.im[T - ext :]])
        else:
            base_re, base_im = carry.re, carry.im
        # Packed rows tile the carry across blocks (only block 0's ext
        # lanes are consumed by the first-row select).
        cre_in = jnp.tile(base_re, spec.pack).reshape(1, CW)
        cim_in = jnp.tile(base_im, spec.pack).reshape(1, CW)
        outs = call(
            data,
            jnp.asarray(snr_db, jnp.float32).reshape(1),
            cg,
            *smem_extra,
            cre_in,
            cim_in,
            *mats,
            *rows_in,
        )
        if spec.dump:
            be, se, pmax, psum, cre, cim, dmp_re, dmp_im = outs
        else:
            be, se, pmax, psum, cre, cim = outs
        # Strided diag PAPR: only every pstride-th tile contributes samples.
        sampled_tiles = 0 if spec.txext else -(-spec.tiles // spec.pstride)
        stats = {
            "bit_errors": be[0, 0],
            "symbol_errors": se[0, 0],
            "papr_peak": pmax[0, 0],
            "papr_sum": psum[0, 0],
            "papr_count": jnp.asarray(sampled_tiles * TILE * T, jnp.float32),
        }
        if spec.dump:
            # Tile 0's data plane, flattened symbol-major like chunk_body's
            # received_symbols (packed rows hold P symbols side by side).
            stats["received_symbols"] = CArray(
                dmp_re.reshape(-1, n).reshape(-1), dmp_im.reshape(-1, n).reshape(-1)
            )
        if lr_mode:
            # t IS the stream's last E time samples (lowrank.py): return
            # the (T,) external contract with only those lanes live —
            # exactly the lanes every consumer reads (banded conv_t1 rows
            # / the mm kernel's ext select / this kernel's tail carry).
            zpad = jnp.zeros((T - spec.lre,), jnp.float32)
            return stats, CArray(
                jnp.concatenate([zpad, cre[0, : spec.lre]]),
                jnp.concatenate([zpad, cim[0, : spec.lre]]),
            )
        # The raw last packed row's block P-1 data lanes ARE the stream's
        # last time row (the external carry contract).
        off = (spec.pack - 1) * TE
        return stats, CArray(cre[0, off : off + T], cim[0, off : off + T])

    return fn


def make_pallas_chunk_lifted(runner, num_syms: int, interpret: bool = False):
    """(shared_fn, consts, spec) for `runner`, or None if unsupported.

    ``shared_fn(key, carry, snr_db, sqrt_power, consts)`` is the SAME
    function object for every runner with an equal spec; callers cache
    `jax.jit(shared_fn)` keyed on the spec so sweeps reuse one executable.
    """
    spec = _spec_for(runner, num_syms, interpret)
    if spec is None:
        return None
    return _fn_for_spec(spec), _consts_for(runner, spec), spec


def _probe_consts_for(runner, spec: _Spec):
    """Constants for the carry probe: the TX-side matrices + encode rows."""
    s = runner.setup
    cfg = s.cfg
    n, L, T = spec.n, spec.L, spec.T
    quad = spec.conv == "mm4"
    if spec.conv == "lr":
        f = lr_factors(runner)
        EP = _pad8(f.E)
        tail_p = np.zeros((n, EP), np.complex128)
        tail_p[:, : f.E] = f.tail
        consts = _complex_matrix_consts(tail_p.real, tail_p.imag, spec.passes)
    else:
        ftx = linops.tx_matrix(n, cfg.prefix_type, L, cfg.modulation_type)
        fr, fi = _tx_ext_matrix(spec, ftx)
        consts = _complex_matrix_consts(fr, fi, spec.passes, quad)

    def _row(a, dtype=np.float32):
        r = np.asarray(a, dtype).reshape(1, n)
        return np.tile(r, (1, spec.pack)) if spec.pack > 1 else r

    if spec.mode == "aqam":
        from ofdm_tpu.ops.mapping import make_constellation

        orders = s.amap.orders
        active = orders > 0
        aq_scales = np.zeros(n, dtype=np.float64)
        for k_, o in enumerate(orders):
            if o > 0:
                aq_scales[k_] = make_constellation("QAM", int(o)).scale
        m_side = np.where(active, np.round(np.sqrt(np.maximum(orders, 1))), 1).astype(np.int64)
        logm = np.where(active, np.round(np.log2(np.maximum(m_side, 1))), 0).astype(np.int64)
        consts.append(_row(np.where(active, orders - 1, 0), np.int32))
        consts.append(_row(m_side, np.int32))
        consts.append(_row(logm, np.int32))
        consts.append(_row(aq_scales))
    elif spec.mode == "apsk":
        orders_p = np.asarray(s.amap.orders)
        active_p = orders_p > 0
        m_eff = np.where(active_p, np.maximum(orders_p, 1), 1).astype(np.int64)
        consts.append(_row(np.where(active_p, orders_p - 1, 0), np.int32))
        consts.append(
            _row(np.where(active_p, np.round(np.log2(m_eff)), 0), np.int32)
        )
        consts.append(_row(active_p.astype(np.float64)))
    return tuple(jnp.asarray(c) for c in consts)


@functools.lru_cache(maxsize=None)
def _probe_fn_for_spec(spec: _Spec):
    """Carry probe kernel for `spec` — see make_carry_probe."""
    n, T = spec.n, spec.T
    TILE, tiles, passes = spec.tile, spec.tiles, spec.passes
    quad = spec.conv == "mm4"
    lr_flag = spec.conv == "lr"
    P = spec.pack
    ROWS = TILE // P
    W = P * n
    EP = _pad8(spec.lre) if lr_flag else 0
    CW = EP if lr_flag else P * (T + spec.ext)
    ncm = 2 if quad else (3 if passes == 1 else 6)
    is_aqam = spec.mode == "aqam"
    is_apsk = spec.mode == "apsk"

    def kernel(seed_ref, *args):
        mats = args[:ncm]
        rest = args[ncm:]
        if is_aqam:
            (mask_ref, mrow_ref, logm_ref, scale_ref, *rest) = rest
        if is_apsk:
            (pmask_ref, pbits_ref, pamp_ref, *rest) = rest
        if spec.apply_power:
            (sp_ref, *rest) = rest
        out_re, out_im = rest
        # The LAST grid tile's seed, then the same first draw the chunk
        # kernel makes — the probe's plane carries the identical raw bits.
        pltpu.prng_seed(
            seed_ref[0] + jnp.int32(tiles - 1) * jnp.int32(-1640531527),
            seed_ref[1],
        )
        raw = pltpu.bitcast(pltpu.prng_random_bits((ROWS, W)), jnp.int32)
        if is_aqam:
            aq = (mask_ref[:], mrow_ref[:], logm_ref[:], scale_ref[:])
        elif is_apsk:
            aq = (pmask_ref[:], pbits_ref[:], pamp_ref[:])
        else:
            aq = None
        _, sr, si = _encode_tile(spec, raw, aq)
        if spec.apply_power:
            sr = sr * sp_ref[:]
            si = si * sp_ref[:]
        # FULL-tile matmul, same shapes as the chunk kernel's: per-row dot
        # accumulation order can depend on the operand shape, and the probe
        # must be BITWISE equal to the kernel's carry row.
        xr, xi = _cmatmul(sr, si, tuple(c[:] for c in mats), passes, quad)
        out_re[0, :] = xr[ROWS - 1, :]
        out_im[0, :] = xi[ROWS - 1, :]

    call = pl.pallas_call(
        kernel,
        grid=(1,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)]
        + [pl.BlockSpec(memory_space=pltpu.VMEM)]
        * (
            ncm
            + (4 if is_aqam else 0)
            + (3 if is_apsk else 0)
            + (1 if spec.apply_power else 0)
        ),
        out_specs=(
            pl.BlockSpec((1, CW), lambda i: (0, 0), memory_space=pltpu.VMEM),
        )
        * 2,
        out_shape=(jax.ShapeDtypeStruct((1, CW), jnp.float32),) * 2,
        interpret=pltpu.InterpretParams() if spec.interpret else False,
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_VMEM_COMPILER_LIMIT),
    )

    def pfn(key, sqrt_power, pconsts):
        rows_in = []
        if spec.apply_power:
            spv = jnp.asarray(sqrt_power, jnp.float32)
            if spec.post_noise or spec.compensate:
                spv = spv[0]
            rows_in.append(jnp.tile(spv, P).reshape(1, W))
        data = jax.random.key_data(key).reshape(-1).astype(jnp.uint32)[:2].astype(jnp.int32)
        cre, cim = call(data, *pconsts, *rows_in)
        if lr_flag:
            zpad = jnp.zeros((T - spec.lre,), jnp.float32)
            return CArray(
                jnp.concatenate([zpad, cre[0, : spec.lre]]),
                jnp.concatenate([zpad, cim[0, : spec.lre]]),
            )
        off = (P - 1) * (T + spec.ext)
        return CArray(cre[0, off : off + T], cim[0, off : off + T])

    return pfn


def make_carry_probe(runner, num_syms: int, interpret: bool = False):
    """(probe_fn, probe_consts) reproducing the chunk's carry OUT, or None.

    ``probe_fn(key, sqrt_power, probe_consts)`` returns the EXACT (bitwise)
    carry `make_pallas_chunk_lifted`'s fn would return for the same
    arguments — without running the chunk.  Possible because the kernel's
    carry out never reads the carry in: it is the last grid tile's last TX
    row (lr: tail row), a pure function of that tile's PRNG stream.  This
    is what lets halo (exact contiguous-stream) sharding keep the fused
    kernel: each shard ppermutes its probe row to its right neighbor
    BEFORE the chunk kernels run (parallel.sweep halo wiring), making the
    shard-major stream's ISI chain contiguous across shard boundaries.

    None for ISI-free diag links — the carry is vestigial there (no ISI
    path consumes it), so halo mode keeps the fused kernel with NO
    probe/exchange (round 5; bit-equal to independent mode, test-pinned)
    — and for unsupported configs."""
    spec = _spec_for(runner, num_syms, interpret)
    if spec is None or spec.conv == "diag":
        return None
    return _probe_fn_for_spec(spec), _probe_consts_for(runner, spec)


def make_noise_bump_chunk(runner, num_syms: int, interpret: bool = False):
    """Fused chunk with the noise-bump experiment's full semantics.

    The reference experiment (waterfilling_noise_bump_experiment.py:43-260)
    applies sqrt(P) at TX, runs the channel with NO noise, injects colored
    noise per subcarrier AFTER equalization, compensates by 1/sqrt(P), and
    normalizes to unit power before demapping.  ``runner`` must be prepared
    with apply_power_allocation=True, normalize_before_demap=True and
    noise_type=NONE; this adds the two experiment-only stages (post_noise,
    compensate) to its spec.

    Returned ``fn(key, carry, snr_db, rows, consts)`` takes ``rows`` as a
    stacked (3, n) f32 array [sqrt_power, inv_sqrt_power (1e-10-guarded,
    host side), noise_std].
    """
    spec = _spec_for(runner, num_syms, interpret)
    if spec is None:
        return None
    if not (spec.apply_power and spec.normalize) or spec.add_noise:
        raise ValueError(
            "noise-bump kernel needs apply_power_allocation=True, "
            "normalize_before_demap=True, noise_type=NONE"
        )
    spec = spec._replace(post_noise=True, compensate=True)
    return _fn_for_spec(spec), _consts_for(runner, spec), spec


def make_pallas_chunk(runner, num_syms: int, interpret: bool = False):
    """Build the fused chunk fn for `runner` or return None if unsupported.

    Returned callable: fn(key, carry: CArray (T,), snr_db, sqrt_power)
    -> (stats dict, new_carry), matching LinkRunner.chunk_body's contract.
    """
    lifted = make_pallas_chunk_lifted(runner, num_syms, interpret)
    if lifted is None:
        return None
    fn, consts, _ = lifted
    return lambda key, carry, snr_db, sqrt_power: fn(key, carry, snr_db, sqrt_power, consts)


def make_pallas_dump_chunk(runner, num_syms: int, interpret: bool = False):
    """Fused chunk whose stats include ``received_symbols`` (tile 0's
    equalized data plane, slicer fold undone -> DATA units, flattened
    symbol-major like chunk_body's).

    The BER chain is byte-for-byte the same computation as
    make_pallas_chunk's — the capture is an extra gated output — so with
    the scanned run's chunk-0 key the dumped constellation is BITWISE the
    counted realization (replacing run()'s statistical XLA replay,
    VERDICT r3 item 7).  Covers spec.tile OFDM symbols (>= 1024 on every
    shipped plan — far above the 32768-bin plot cap)."""
    lifted = make_pallas_dump_lifted(runner, num_syms, interpret)
    if lifted is None:
        return None
    fn, consts, _ = lifted
    return lambda key, carry, snr_db, sqrt_power: fn(key, carry, snr_db, sqrt_power, consts)


def make_pallas_dump_lifted(runner, num_syms: int, interpret: bool = False):
    """(shared_fn, consts, spec) form of `make_pallas_dump_chunk`.

    The lifted form is what sharded capture needs: `parallel.sweep`
    shard_maps the shared fn with the consts as replicated arguments, so
    each shard dumps ITS chunk-0 tile-0 plane with its own fold_in'd PRNG
    stream and the gathered planes are bitwise counted symbols."""
    spec = _spec_for(runner, num_syms, interpret)
    if spec is None:
        return None
    spec = spec._replace(dump=True)
    return _fn_for_spec(spec), _consts_for(runner, spec), spec
