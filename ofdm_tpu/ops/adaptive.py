"""Adaptive per-subcarrier constellation mapping — fully vectorized.

The reference's `AdaptiveConstellationMapper` distributes ragged per-subcarrier
bit widths with a triple-nested Python loop over (OFDM symbol x subcarrier x
bits) (constellation/adaptive.py:177-201,236-255) — the worst hot spot in
SURVEY §2.11 (item 4).  Orders are static per run (computed once from H and
SNR before the hot loop), so we precompute host-side index/mask tables and
the whole encode/decode becomes a handful of gathers + one padded-table argmax
under jit (SURVEY §7.3 "adaptive mode raggedness").

Layout contract (identical to the reference):
  * one OFDM symbol consumes S = sum(bits_per_subcarrier) bits, laid out
    subcarrier-major, MSB-first within a subcarrier;
  * subcarriers with order 0 transmit the zero symbol and contribute no bits.
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import jax.numpy as jnp
import numpy as np
from numpy.typing import NDArray

from ofdm_tpu.ops.mapping import Constellation, make_constellation


@dataclasses.dataclass(frozen=True)
class AdaptiveMapper:
    """Host-side precomputed tables for vectorized adaptive mapping."""

    kind: str
    orders: NDArray[np.int64]  # (N,) constellation order per subcarrier
    bits_per_subcarrier: NDArray[np.int64]  # (N,)
    num_subcarriers: int
    # Padded constellation tables, one row per unique active order (+1 zero row
    # for inactive subcarriers): (G+1, max_order) complex128.
    tables: NDArray[np.complex128]
    group_id: NDArray[np.int32]  # (N,) row of `tables` per subcarrier
    # Bit gather/scatter tables:
    gather_idx: NDArray[np.int32]  # (N, max_bits): position in the S-bit word
    bit_mask: NDArray[np.bool_]  # (N, max_bits): j < bits_per_subcarrier[k]
    weights: NDArray[np.int32]  # (N, max_bits): 2^(b_k-1-j), 0 when masked
    src_k: NDArray[np.int32]  # (S,): subcarrier owning bit position p
    src_j: NDArray[np.int32]  # (S,): bit-within-subcarrier for position p
    max_bits: int
    max_order: int

    @property
    def bits_per_ofdm_symbol(self) -> int:
        return int(self.bits_per_subcarrier.sum())

    @property
    def active(self) -> NDArray[np.bool_]:
        return self.orders > 0

    @property
    def name(self) -> str:
        """Reference naming (constellation/adaptive.py:101-111)."""
        uniq = np.unique(self.orders[self.orders > 0])
        if uniq.size == 0:
            return "No-Transmission"
        if uniq.size == 1:
            return f"{int(uniq[0])}-{self.kind}"
        return f"Adaptive-{int(uniq.min())}-to-{int(uniq.max())}-{self.kind}"

    @property
    def composite_constellation(self) -> NDArray[np.complex128]:
        """Unique points across all active orders (constellation/adaptive.py:84-90)."""
        pts = []
        for order in np.unique(self.orders[self.orders > 0]):
            pts.extend(make_constellation(self.kind, int(order)).table.tolist())
        return np.unique(np.asarray(pts, dtype=np.complex128))


def make_adaptive_mapper(kind: str, orders: NDArray[np.int64]) -> AdaptiveMapper:
    orders = np.asarray(orders, dtype=np.int64)
    n = len(orders)
    bits = np.where(orders > 0, np.log2(np.maximum(orders, 1)).astype(np.int64), 0)
    S = int(bits.sum())
    if S == 0:
        raise ValueError("No active subcarriers (all orders are zero)")
    max_bits = int(bits.max())

    uniq = [int(o) for o in np.unique(orders) if o > 0]
    consts = {o: make_constellation(kind, o) for o in uniq}
    max_order = max(uniq)
    tables = np.zeros((len(uniq) + 1, max_order), dtype=np.complex128)
    for g, o in enumerate(uniq):
        tables[g, :o] = consts[o].table
    # Row len(uniq) stays zero: inactive subcarriers emit the 0 symbol.

    group_of_order = {o: g for g, o in enumerate(uniq)}
    group_id = np.array(
        [group_of_order[int(o)] if o > 0 else len(uniq) for o in orders], dtype=np.int32
    )

    offsets = np.concatenate([[0], np.cumsum(bits)[:-1]])
    j = np.arange(max_bits)
    bit_mask = j[None, :] < bits[:, None]
    gather_idx = np.where(bit_mask, offsets[:, None] + j[None, :], 0).astype(np.int32)
    weights = np.where(bit_mask, 1 << np.maximum(bits[:, None] - 1 - j[None, :], 0), 0).astype(
        np.int32
    )

    src_k = np.zeros(S, dtype=np.int32)
    src_j = np.zeros(S, dtype=np.int32)
    for k in range(n):
        for jj in range(int(bits[k])):
            p = int(offsets[k]) + jj
            src_k[p] = k
            src_j[p] = jj

    return AdaptiveMapper(
        kind=kind,
        orders=orders,
        bits_per_subcarrier=bits,
        num_subcarriers=n,
        tables=tables,
        group_id=group_id,
        gather_idx=gather_idx,
        bit_mask=bit_mask,
        weights=weights,
        src_k=src_k,
        src_j=src_j,
        max_bits=max_bits,
        max_order=max_order,
    )


# ---------------------------------------------------------------------------
# JAX encode / decode
# ---------------------------------------------------------------------------


def calculate_requirements(
    constellation_orders: NDArray[np.int64], num_ofdm_symbols: int
) -> Tuple[int, NDArray[np.int64]]:
    """(total_bits, bits_per_subcarrier) for an order layout.

    Mirrors AdaptiveBitsGenerator.calculate_requirements
    (bits_generation/models.py:130-163): bits/sc = log2(order) (0 when
    inactive), total = sum * num_ofdm_symbols.
    """
    orders = np.asarray(constellation_orders, dtype=np.int64)
    bits = np.where(orders > 0, np.log2(np.maximum(orders, 1)).astype(np.int64), 0)
    return int(bits.sum() * num_ofdm_symbols), bits


def calculate_constellation_orders(
    capacity: NDArray[np.float64],
    min_order: int,
    max_order: int,
    scaling_factor: float,
    kind: str = "QAM",
) -> NDArray[np.int64]:
    """Shannon-capacity-based order selection (constellation/adaptive.py:271-328).

    (The reference keeps this path alive only in its tests — the simulation
    uses the gap function, simulation/models.py:315-330 — but it is public
    API there, so it is public here.)  Scale capacity, clip to
    [0, log2(max_order)], force even bits for QAM / floor for PSK, zero out
    subcarriers below log2(min_order), return 2^bits.
    """
    bits = np.asarray(capacity, dtype=np.float64) * scaling_factor
    bits = np.clip(bits, 0, np.log2(max_order))
    if kind == "QAM":
        bits = bits // 2 * 2
    else:
        bits = np.floor(bits)
    bits = np.where(bits < np.log2(min_order), 0, bits)
    return np.where(bits > 0, 2 ** bits, 0).astype(np.int64)


def index_mask(m: AdaptiveMapper) -> np.ndarray:
    """(N,) uint32 mask: order_k - 1 for active subcarriers, 0 for inactive.

    ``uniform_bits & mask`` draws a uniform index per subcarrier — the
    bit-source and bit-to-symbol distribution collapse into one masked draw
    (no bit tensors in the hot path)."""
    return np.where(m.orders > 0, m.orders - 1, 0).astype(np.uint32)


def encode_from_indices(
    idx: jnp.ndarray, m: AdaptiveMapper, dtype=jnp.complex64
) -> jnp.ndarray:
    """indices (B, N) -> symbols (B, N) via the padded group tables (complex path)."""
    flat_tables = jnp.asarray(m.tables.reshape(-1), dtype=dtype)
    group = jnp.asarray(m.group_id)
    return jnp.take(flat_tables, group * m.max_order + idx, axis=0)


def encode_from_indices_planar(idx: jnp.ndarray, m: AdaptiveMapper):
    """indices (B, N) -> CArray symbols (B, N), gather-free (TPU path)."""
    from ofdm_tpu.ops.cplx import CArray
    from ofdm_tpu.ops.mapping import psk_point_planar, qam_point_planar

    p = _planar_params(m)
    if m.kind == "QAM":
        re, im = qam_point_planar(idx, p["m"], p["scale"], m.max_bits)
    else:
        re, im = psk_point_planar(idx, p["order"], m.max_bits)
        re = re * p["active"]
        im = im * p["active"]
    return CArray(re, im)


def decode_to_indices(symbols, m: AdaptiveMapper) -> jnp.ndarray:
    """symbols (B, N) -> hard-decision indices (B, N); dispatches on type."""
    from ofdm_tpu.ops.cplx import CArray

    if isinstance(symbols, CArray):
        from ofdm_tpu.ops.mapping import psk_index_planar, qam_index_planar

        p = _planar_params(m)
        if m.kind == "QAM":
            idx = qam_index_planar(symbols.re, symbols.im, p["m"], p["scale_safe"], m.max_bits)
        else:
            idx = psk_index_planar(symbols.re, symbols.im, p["order"], m.max_bits)
        return idx * p["active_i"]
    _, idx = decode(symbols, m)
    return idx


def encode(
    bits: jnp.ndarray, m: AdaptiveMapper, dtype=jnp.complex64
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """bits (B, S) -> (symbols (B, N), indices (B, N)); inactive -> 0 symbol."""
    gather_idx = jnp.asarray(m.gather_idx)
    weights = jnp.asarray(m.weights)
    sub_bits = bits[:, gather_idx]  # (B, N, max_bits)
    idx = jnp.sum(sub_bits.astype(jnp.int32) * weights, axis=-1)  # (B, N)
    flat_tables = jnp.asarray(m.tables.reshape(-1), dtype=dtype)
    group = jnp.asarray(m.group_id)
    symbols = jnp.take(flat_tables, group * m.max_order + idx, axis=0)
    return symbols, idx


def decode(symbols: jnp.ndarray, m: AdaptiveMapper) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """symbols (B, N) -> (bits (B, S), indices (B, N)) via per-order NN argmax.

    Padded-table NN: scores over max_order candidates with -inf bias on padded
    entries; MXU-friendly like ops.mapping.decode_nn.
    """
    tab = m.tables  # (G+1, maxM)
    valid = np.zeros(tab.shape, dtype=bool)
    uniq = [int(o) for o in np.unique(m.orders) if o > 0]
    for g, o in enumerate(uniq):
        valid[g, :o] = True
    valid[len(uniq), :1] = True  # inactive row: single zero point

    cre = jnp.asarray(2.0 * tab.real, jnp.float32)[jnp.asarray(m.group_id)]  # (N, maxM)
    cim = jnp.asarray(2.0 * tab.imag, jnp.float32)[jnp.asarray(m.group_id)]
    bias = np.where(valid, -np.abs(tab) ** 2, -np.inf)
    bias_n = jnp.asarray(bias, jnp.float32)[jnp.asarray(m.group_id)]  # (N, maxM)

    yr = jnp.real(symbols).astype(jnp.float32)[..., None]  # (B, N, 1)
    yi = jnp.imag(symbols).astype(jnp.float32)[..., None]
    scores = yr * cre[None] + yi * cim[None] + bias_n[None]  # (B, N, maxM)
    idx = jnp.argmax(scores, axis=-1).astype(jnp.int32)  # (B, N)

    # Unpack per-subcarrier bits then gather into the S-bit stream layout.
    bits_bnj = ((idx[..., None] >> _shifts(m)) & 1).astype(jnp.uint8)  # (B, N, max_bits)
    src_k = jnp.asarray(m.src_k)
    src_j = jnp.asarray(m.src_j)
    bits_out = bits_bnj[:, src_k, src_j]  # (B, S)
    return bits_out, idx


def _shifts(m: AdaptiveMapper) -> jnp.ndarray:
    # shift for bit j of subcarrier k is b_k - 1 - j (masked positions give
    # garbage that src_k/src_j never reference).
    return jnp.asarray(
        np.maximum(m.bits_per_subcarrier[:, None] - 1 - np.arange(m.max_bits)[None, :], 0),
        jnp.int32,
    )


# ---------------------------------------------------------------------------
# Planar (gather-free) encode / decode — the TPU hot path
# ---------------------------------------------------------------------------
#
# The bit (de)interleave becomes a 0/1 selection matmul (exact on a bf16 MXU:
# all operands are 0/1 or powers of two, accumulation is f32), and the
# per-subcarrier constellation (de)mapping is the arithmetic Gray/zigzag
# chain from ops.mapping with *vector* order parameters.  No gathers, no
# argmax — everything the target TPU backend supports natively.


def _pack_weights(m: AdaptiveMapper) -> np.ndarray:
    """W (S, N): idx[:, k] = sum_p bits[:, p] * W[p, k] (MSB-first widths)."""
    W = np.zeros((len(m.src_k), m.num_subcarriers), dtype=np.float32)
    for p, (k, j) in enumerate(zip(m.src_k, m.src_j)):
        W[p, k] = float(1 << int(m.bits_per_subcarrier[k] - 1 - j))
    return W


def _unpack_select(m: AdaptiveMapper) -> np.ndarray:
    """G (N*max_bits, S): bits_out = bits_bnj.reshape(B, N*max_bits) @ G."""
    G = np.zeros((m.num_subcarriers * m.max_bits, len(m.src_k)), dtype=np.float32)
    for p, (k, j) in enumerate(zip(m.src_k, m.src_j)):
        G[int(k) * m.max_bits + int(j), p] = 1.0
    return G


def _planar_params(m: AdaptiveMapper):
    active = m.orders > 0
    if m.kind == "QAM":
        mm = np.where(active, np.sqrt(np.maximum(m.orders, 1)).astype(np.int64), 1)
        scales = np.zeros(m.num_subcarriers, dtype=np.float64)
        for k, o in enumerate(m.orders):
            if o > 0:
                scales[k] = make_constellation("QAM", int(o)).scale
        return {
            "m": jnp.asarray(mm, jnp.int32),
            "scale": jnp.asarray(scales, jnp.float32),
            "scale_safe": jnp.asarray(np.where(active, scales, 1.0), jnp.float32),
            "active": jnp.asarray(active.astype(np.float32)),
            "active_i": jnp.asarray(active.astype(np.int32)),
        }
    orders_safe = np.where(active, np.maximum(m.orders, 1), 1)
    return {
        "order": jnp.asarray(orders_safe, jnp.int32),
        "active": jnp.asarray(active.astype(np.float32)),
        "active_i": jnp.asarray(active.astype(np.int32)),
    }


def encode_planar(bits: jnp.ndarray, m: AdaptiveMapper) -> Tuple["object", jnp.ndarray]:
    """bits (B, S) -> (CArray symbols (B, N), indices (B, N)); gather-free."""
    from ofdm_tpu.ops.cplx import CArray
    from ofdm_tpu.ops.mapping import psk_point_planar, qam_point_planar

    W = jnp.asarray(_pack_weights(m))
    idx = (
        jnp.round(jnp.dot(bits.astype(jnp.float32), W, preferred_element_type=jnp.float32))
        .astype(jnp.int32)
    )  # (B, N) — exact: 0/1 bits x power-of-two weights, f32 accumulation
    p = _planar_params(m)
    if m.kind == "QAM":
        re, im = qam_point_planar(idx, p["m"], p["scale"], m.max_bits)
    else:
        re, im = psk_point_planar(idx, p["order"], m.max_bits)
        re = re * p["active"]
        im = im * p["active"]
    return CArray(re, im), idx


def decode_planar(symbols, m: AdaptiveMapper) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """CArray symbols (B, N) -> (bits (B, S), indices (B, N)); gather-free."""
    from ofdm_tpu.ops.mapping import psk_index_planar, qam_index_planar

    p = _planar_params(m)
    if m.kind == "QAM":
        idx = qam_index_planar(symbols.re, symbols.im, p["m"], p["scale_safe"], m.max_bits)
    else:
        idx = psk_index_planar(symbols.re, symbols.im, p["order"], m.max_bits)
    idx = idx * p["active_i"]

    bits_bnj = ((idx[..., None] >> _shifts(m)) & 1).astype(jnp.float32)  # (B, N, max_bits)
    G = jnp.asarray(_unpack_select(m))
    flat = bits_bnj.reshape(bits_bnj.shape[0], -1)
    bits_out = (
        jnp.round(jnp.dot(flat, G, preferred_element_type=jnp.float32)).astype(jnp.int32)
    )  # (B, S) — exact 0/1 selection
    return bits_out, idx
