"""Constellation mapping: Gray-coded QAM/PSK tables, encode/decode, bit loading.

Replicates the reference's idiosyncratic constellation constructions
*point-by-point* (SURVEY §7.3 "bit-exact mapping parity"), then maps/demaps
with TPU-friendly vectorized ops instead of the reference's per-symbol Python
loops and float-keyed dict lookups (constellation/models.py:220-295).

Reference constructions being matched:
  * QAM (constellation/models.py:180-218): square grid listed top-to-bottom /
    left-to-right in "binary order", then ``table[i] = grid[gray(i)]``,
    then a zig-zag reorder that reverses odd index-rows of the *table*,
    then unit-average-power normalization.
  * PSK (constellation/models.py:356-380): ``table[gray(p)] = exp(2j*pi*p/M)``
    (note: the assignment direction is *opposite* to QAM), no reordering.

Decoding: the reference nearest-neighbor classifier is a full O(S*M) distance
argmin (constellation/models.py:19-27).  We provide
  * :func:`decode_nn` — the same argmin, restructured as a real matmul so the
    MXU does the work (argmin of |y-c|^2 == argmax of 2*Re(y c̄) - |c|^2);
  * :func:`decode_hard` — an O(1)-per-symbol geometric slicer for square QAM
    (round to the grid, look the index up in a precomputed inverse table) and
    for PSK (round the phase).  Exactly equal to NN away from decision-boundary
    ties (which have probability zero under noise); tests assert equivalence.

Bit loading: gap-function order selection per subcarrier
(constellation/models.py:297-321 for QAM, :459-474 for PSK), vectorized,
computed in float64 on host because a one-LSB rounding flip changes adaptive
BER curves discontinuously (SURVEY §7.3).
"""

from __future__ import annotations

import dataclasses
from functools import lru_cache

import jax.numpy as jnp
import numpy as np
from numpy.typing import NDArray
from scipy.stats import norm


def gray_code(i: NDArray[np.int64] | int):
    """Binary-reflected Gray code, g = i ^ (i >> 1) (constellation/models.py:77)."""
    return i ^ (i >> 1)


def inverse_gray_code(g: NDArray[np.int64]) -> NDArray[np.int64]:
    """Invert the Gray code by prefix-XOR over bit shifts."""
    g = np.asarray(g).copy()
    shift = 1
    while (g >> shift).any():
        g = g ^ (g >> shift)
        shift <<= 1
    return g


@dataclasses.dataclass(frozen=True)
class Constellation:
    """A host-side constellation: exact f64 table + slicer lookup tables.

    ``table[i]`` is the complex point transmitted for bit-word ``i`` (MSB
    first).  ``inv_index`` supports the O(1) hard-decision demapper:
      * QAM: flat (m*m,) table mapping grid position row*m+col -> index.
      * PSK: unused (the phase slicer composes with the word coding directly).
    ``coding``: "gray" (reference GrayWordCoder + QAM zig-zag) or "none"
    (reference NoWordCoder: natural binary order, no reorder).
    """

    kind: str  # "QAM" | "PSK"
    order: int
    table: NDArray[np.complex128]  # (M,)
    inv_index: NDArray[np.int32]  # (M,) for QAM; empty for PSK
    scale: float  # QAM grid normalization factor (1 for PSK)
    coding: str = "gray"

    @property
    def bits_per_symbol(self) -> int:
        return self.order.bit_length() - 1

    @property
    def name(self) -> str:
        return f"{self.order}-{self.kind}"


@lru_cache(maxsize=None)
def qam_constellation(order: int, coding: str = "gray") -> Constellation:
    """Square QAM with the reference's Gray + zig-zag layout, unit avg power.

    ``coding="none"`` reproduces the reference NoWordCoder path
    (constellation/models.py:49-67): natural binary order, no reorder.
    """
    m = int(np.sqrt(order))
    if m * m != order:
        raise ValueError("Order must be a perfect square (e.g., 4, 16, 64).")

    levels = np.arange(-m + 1, m, 2, dtype=np.float64)
    # Grid in "binary order": rows top (+imag) to bottom, cols left to right
    # (constellation/models.py:193-198).
    grid = (levels[None, :] + 1j * levels[::-1, None]).reshape(-1)

    idx = np.arange(order, dtype=np.int64)
    if coding == "gray":
        table = grid[gray_code(idx)]
        # Zig-zag: reverse odd index-rows of the table
        # (constellation/models.py:97-108).
        table = table.reshape(m, m)
        table[1::2] = table[1::2, ::-1]
        table = table.reshape(-1)
    elif coding == "none":
        table = grid.copy()
    else:
        raise ValueError(f"Unknown word coding: {coding}")

    avg_power = np.mean(np.abs(table) ** 2)
    scale = 1.0 / np.sqrt(avg_power)
    table = table * scale

    # Inverse lookup for the slicer: grid position (row from +imag, col from
    # -real) -> table index.  Built by inverting the construction directly.
    inv = np.empty(order, dtype=np.int32)
    for i in range(order):
        c = table[i] / scale
        col = int(round((c.real + (m - 1)) / 2))
        row = int(round(((m - 1) - c.imag) / 2))
        inv[row * m + col] = i

    return Constellation("QAM", order, table, inv, float(scale), coding)


@lru_cache(maxsize=None)
def psk_constellation(order: int, coding: str = "gray") -> Constellation:
    """M-PSK on the unit circle, table[gray(p)] = exp(2j*pi*p/M)."""
    bits = np.log2(order)
    if bits != int(bits) or order < 2:
        raise ValueError("PSK order must be a power of 2 (e.g., 2, 4, 8, 16).")
    p = np.arange(order, dtype=np.int64)
    points = np.exp(2j * np.pi * p / order)
    table = np.zeros(order, dtype=np.complex128)
    if coding == "gray":
        table[gray_code(p)] = points
    elif coding == "none":
        table[:] = points
    else:
        raise ValueError(f"Unknown word coding: {coding}")
    return Constellation("PSK", order, table, np.zeros(0, dtype=np.int32), 1.0, coding)


def make_constellation(kind: str, order: int, coding: str = "gray") -> Constellation:
    if kind == "QAM":
        return qam_constellation(order, coding)
    if kind == "PSK":
        return psk_constellation(order, coding)
    raise ValueError(f"Unknown constellation kind: {kind}")


# ---------------------------------------------------------------------------
# JAX encode / decode (batched, jit-friendly)
# ---------------------------------------------------------------------------


def bits_to_indices(bits: jnp.ndarray, bits_per_symbol: int) -> jnp.ndarray:
    """Pack bit groups (..., bits_per_symbol) MSB-first into int32 indices."""
    weights = jnp.asarray(1 << np.arange(bits_per_symbol - 1, -1, -1), jnp.int32)
    return jnp.sum(bits.astype(jnp.int32) * weights, axis=-1)


def indices_to_bits(indices: jnp.ndarray, bits_per_symbol: int) -> jnp.ndarray:
    """Unpack int indices into (..., bits_per_symbol) uint8 bits, MSB-first."""
    shifts = jnp.asarray(np.arange(bits_per_symbol - 1, -1, -1), jnp.int32)
    return ((indices[..., None] >> shifts) & 1).astype(jnp.uint8)


def encode(bits: jnp.ndarray, const: Constellation, dtype=jnp.complex64) -> jnp.ndarray:
    """Map bits (..., bits_per_symbol) to constellation symbols (...,)."""
    idx = bits_to_indices(bits, const.bits_per_symbol)
    table = jnp.asarray(const.table, dtype=dtype)
    return jnp.take(table, idx, axis=0)


def encode_indices(idx: jnp.ndarray, const: Constellation, dtype=jnp.complex64) -> jnp.ndarray:
    table = jnp.asarray(const.table, dtype=dtype)
    return jnp.take(table, idx, axis=0)


def decode_nn(symbols: jnp.ndarray, const: Constellation) -> jnp.ndarray:
    """Nearest-neighbor demap to table indices via an MXU-friendly matmul.

    argmin_j |y - c_j|^2 == argmax_j (2 Re(y conj(c_j)) - |c_j|^2); the score
    is a (S, 2) @ (2, M) real matmul plus a bias row.
    """
    shape = symbols.shape
    y = symbols.reshape(-1)
    yri = jnp.stack([jnp.real(y), jnp.imag(y)], axis=-1).astype(jnp.float32)
    c = const.table
    cri = np.stack([2.0 * c.real, 2.0 * c.imag], axis=0)  # (2, M)
    bias = -np.abs(c) ** 2  # (M,)
    scores = (
        jnp.dot(yri, jnp.asarray(cri, jnp.float32), preferred_element_type=jnp.float32)
        + jnp.asarray(bias, jnp.float32)
    )
    return jnp.argmax(scores, axis=-1).astype(jnp.int32).reshape(shape)


def decode_hard(symbols: jnp.ndarray, const: Constellation) -> jnp.ndarray:
    """O(1)-per-symbol hard-decision demap to table indices.

    QAM: round to the nearest grid node, look up the inverse construction
    table (SURVEY §2.11 item 3: "for square QAM should become an O(1) slicing
    demapper on TPU").  PSK: round the phase to the nearest sector; the
    construction gives index = gray(sector) directly.
    """
    if const.kind == "QAM":
        m = int(np.sqrt(const.order))
        x = jnp.real(symbols) / jnp.float32(const.scale)
        y = jnp.imag(symbols) / jnp.float32(const.scale)
        col = jnp.clip(jnp.round((x + (m - 1)) * 0.5), 0, m - 1).astype(jnp.int32)
        row = jnp.clip(jnp.round(((m - 1) - y) * 0.5), 0, m - 1).astype(jnp.int32)
        inv = jnp.asarray(const.inv_index, jnp.int32)
        return jnp.take(inv, row * m + col, axis=0)
    # PSK
    M = const.order
    ang = jnp.arctan2(jnp.imag(symbols), jnp.real(symbols))
    sector = jnp.round(ang * (M / (2.0 * np.pi))).astype(jnp.int32) % M
    if const.coding == "none":
        return sector
    return sector ^ (sector >> 1)


def decode_bits(symbols: jnp.ndarray, const: Constellation, hard: bool = True) -> jnp.ndarray:
    """Demap symbols (...,) to bits (..., bits_per_symbol) uint8."""
    idx = decode_hard(symbols, const) if hard else decode_nn(symbols, const)
    return indices_to_bits(idx, const.bits_per_symbol)


# ---------------------------------------------------------------------------
# Planar (gather-free) encode / decode — the TPU hot path
# ---------------------------------------------------------------------------
#
# The reference table construction is algebraically invertible, so on TPU we
# never materialize a gather: the constellation point for index i is computed
# arithmetically (int XOR/shift chains + affine level maps), and decoding is
# the same chain backwards.  Verified equal to the table path in tests.
#
# QAM: table[i] = grid[gray(zz(i))] with zz = odd-row reversal; grid position
# p has col = p % m (real, left->right) and row = p // m (imag, top->bottom).
# PSK: table[i] = exp(2j*pi*inverse_gray(i)/M).


def _gray_i32(i: jnp.ndarray) -> jnp.ndarray:
    return i ^ (i >> 1)


def _inverse_gray_i32(g: jnp.ndarray, num_bits: int) -> jnp.ndarray:
    """Prefix-XOR inverse Gray code, statically unrolled to ceil(log2(bits))."""
    shift = 1
    while shift < num_bits:
        g = g ^ (g >> shift)
        shift <<= 1
    return g


def _zigzag_i32(i: jnp.ndarray, m) -> jnp.ndarray:
    """Reverse the column within odd rows of an (m x m) index grid.

    ``m`` may be a scalar or a broadcastable int32 array (adaptive mode)."""
    row = i // m
    col = i % m
    colz = jnp.where(row % 2 == 1, m - 1 - col, col)
    return row * m + colz


def qam_point_planar(idx: jnp.ndarray, m, scale, num_bits: int, coding: str = "gray"):
    """(re, im) of table[idx] for square QAM; m/scale scalar or per-element."""
    p = _gray_i32(_zigzag_i32(idx, m)) if coding == "gray" else idx
    col = (p % m).astype(jnp.float32)
    row = (p // m).astype(jnp.float32)
    mf = m if isinstance(m, (int, float)) else m.astype(jnp.float32)
    re = (2.0 * col - (mf - 1.0)) * scale
    im = ((mf - 1.0) - 2.0 * row) * scale
    return re, im


def qam_index_planar(re, im, m, scale, num_bits: int, coding: str = "gray") -> jnp.ndarray:
    """Hard-decision index from (re, im) — inverse of qam_point_planar."""
    mf = m if isinstance(m, (int, float)) else m.astype(jnp.float32)
    x = re / scale
    y = im / scale
    col = jnp.clip(jnp.round((x + (mf - 1.0)) * 0.5), 0, mf - 1.0).astype(jnp.int32)
    row = jnp.clip(jnp.round(((mf - 1.0) - y) * 0.5), 0, mf - 1.0).astype(jnp.int32)
    p = row * m + col
    if coding == "none":
        return p
    return _zigzag_i32(_inverse_gray_i32(p, num_bits), m)


def psk_point_planar(idx: jnp.ndarray, order, num_bits: int, coding: str = "gray"):
    """(re, im) of table[idx] for M-PSK; order scalar or per-element int32."""
    p = _inverse_gray_i32(idx, num_bits) if coding == "gray" else idx
    of = order if isinstance(order, (int, float)) else order.astype(jnp.float32)
    ang = (2.0 * np.pi) * p.astype(jnp.float32) / of
    return jnp.cos(ang), jnp.sin(ang)


def psk_index_planar(re, im, order, num_bits: int, coding: str = "gray") -> jnp.ndarray:
    of = order if isinstance(order, (int, float)) else order.astype(jnp.float32)
    ang = jnp.arctan2(im, re)
    sector = jnp.round(ang * (of / (2.0 * np.pi))).astype(jnp.int32)
    o32 = order if isinstance(order, (int, float)) else order
    sector = sector % o32
    if coding == "none":
        return sector
    return _gray_i32(sector)


def encode_indices_planar(idx: jnp.ndarray, const: Constellation):
    """Map int32 indices to a planar CArray of constellation points."""
    from ofdm_tpu.ops.cplx import CArray

    b = const.bits_per_symbol
    if const.kind == "QAM":
        m = int(np.sqrt(const.order))
        re, im = qam_point_planar(idx, m, np.float32(const.scale), b, const.coding)
    else:
        re, im = psk_point_planar(idx, const.order, b, const.coding)
    return CArray(re, im)


def decode_hard_planar(symbols, const: Constellation) -> jnp.ndarray:
    """Hard-decision demap of a planar CArray to int32 table indices."""
    b = const.bits_per_symbol
    if const.kind == "QAM":
        m = int(np.sqrt(const.order))
        return qam_index_planar(
            symbols.re, symbols.im, m, np.float32(const.scale), b, const.coding
        )
    return psk_index_planar(symbols.re, symbols.im, const.order, b, const.coding)


# ---------------------------------------------------------------------------
# Gap-function bit loading (host, float64, vectorized)
# ---------------------------------------------------------------------------


def qam_bit_loading_orders(ser: float, snr: NDArray[np.float64]) -> NDArray[np.int64]:
    """QAM gap-function order per subcarrier (constellation/models.py:297-321).

    Gamma = (1/3) * Qinv(SER/4)^2; b = round(log2(1 + SNR/Gamma)); b forced
    even (square QAM); order = 2^b, or 0 if b <= 0.  Vectorized over ``snr``.
    """
    snr = np.asarray(snr, dtype=np.float64)
    q_inv = norm.isf(ser / 4)
    gamma = (1.0 / 3.0) * q_inv**2
    b = np.round(np.log2(1.0 + snr / gamma)).astype(np.int64)
    b = np.where(b % 2 != 0, b - 1, b)
    return np.where(b > 0, np.int64(1) << np.maximum(b, 0), 0).astype(np.int64)


def psk_bit_loading_orders(ser: float, snr: NDArray[np.float64]) -> NDArray[np.int64]:
    """PSK gap-function order per subcarrier (constellation/models.py:459-474)."""
    snr = np.asarray(snr, dtype=np.float64)
    q_inv = norm.isf(ser / 2)
    gamma_star = q_inv**2 / (2.0 * np.pi**2)
    with np.errstate(invalid="ignore", divide="ignore"):
        gamma = np.sqrt(snr * gamma_star) / (1.0 - np.sqrt(gamma_star / (snr + 1e-10)))
        b = np.floor(np.log2(1.0 + snr / (gamma + 1e-10)) + 1e-10).astype(np.int64)
    return np.where(b > 0, np.int64(1) << np.maximum(b, 0), 0).astype(np.int64)


def bit_loading_orders(
    kind: str, ser: float, snr: NDArray[np.float64]
) -> NDArray[np.int64]:
    if kind == "QAM":
        return qam_bit_loading_orders(ser, snr)
    if kind == "PSK":
        return psk_bit_loading_orders(ser, snr)
    raise ValueError(f"Unknown constellation kind: {kind}")
