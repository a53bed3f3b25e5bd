"""End-to-end link simulation: fused TX -> channel -> RX under jit.

One `prepare()` call does all host-side setup (channel resolution, power
allocation, adaptive bit loading — float64, matching the reference's setup
math exactly), then `LinkRunner` executes the hot path entirely on device:

    bits -> map -> (power) -> IFFT+prefix -> stream conv + AWGN
         -> strip+FFT -> ZF/MMSE -> (IFFT for SC-FDE) -> demap -> error counts

This is the TPU-native replacement for `Simulation.run()`
(simulation/models.py:214-818): the reference's per-row Python loops,
BytesIO bit plumbing and Python BER counting collapse into one compiled
program over batched ``(num_ofdm_symbols, n_sc)`` arrays.  Large runs stream
in chunks with an exact cross-chunk convolution carry; a single chunk
reproduces the reference's whole-stream AWGN power-measurement semantics
exactly (SURVEY §7.3).

Reference quirks deliberately preserved (SURVEY §3.2):
  * the equalizer's H comes from the *un-normalized* impulse response
    (simulation/models.py:263-266) while the channel convolves the
    unit-energy-normalized taps (channel/models.py:37-44);
  * power allocation is computed and reported but NOT applied at TX in the
    main path (simulation/models.py:508) — `apply_power_allocation` opts in;
  * FIXED mode's `num_symbols` means QAM symbols (simulation/models.py:409-411)
    while CAPACITY_BASED's means OFDM symbols (:379-381);
  * noise power derives from measured post-channel signal power
    (noise/models.py:14-16); MMSE re-estimates noise variance per row
    (equalization/models.py:39-49).
"""

from __future__ import annotations

import dataclasses
import os
import time
from typing import Any, Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from numpy.typing import NDArray

from ofdm_tpu.config import (
    AdaptiveModulationMode,
    ModulationType,
    NoiseType,
    PowerAllocationType,
    PrefixType,
    SimulationConfig,
)
from ofdm_tpu.models import channels as chm
from ofdm_tpu.ops import adaptive as ad
from ofdm_tpu.ops import allocate as al
from ofdm_tpu.ops import bits as bitops  # noqa: F401 (bit-level API for tools)
from ofdm_tpu.ops import prng
from ofdm_tpu.ops import channel as ch
from ofdm_tpu.ops import cplx
from ofdm_tpu.ops import equalize as eq
from ofdm_tpu.ops import linops
from ofdm_tpu.ops import mapping as mp
from ofdm_tpu.ops import metrics as mt
from ofdm_tpu.ops import ofdm


@dataclasses.dataclass(frozen=True)
class LinkSetup:
    """All host-side precomputed state for one simulation point."""

    cfg: SimulationConfig
    taps: NDArray[np.complex128]  # unit-energy normalized IR (channel path)
    h_freq: NDArray[np.complex128]  # FFT of the RAW IR (equalizer path quirk)
    channel_gains: NDArray[np.float64]  # |h_freq|^2
    noise_power: float  # 10^(-snr/10)
    prefix_length: int
    power_allocation: NDArray[np.float64]
    water_level: Optional[float]
    constellation_orders: NDArray[np.int64]  # (N,)
    const: Optional[mp.Constellation]  # FIXED mode
    amap: Optional[ad.AdaptiveMapper]  # CAPACITY_BASED mode
    num_ofdm_symbols: int
    bits_per_ofdm_symbol: int
    total_bits: int

    @property
    def is_adaptive(self) -> bool:
        return self.amap is not None

    @property
    def block_length(self) -> int:
        return self.cfg.num_subcarriers + self.prefix_length

    @property
    def constellation_points(self) -> NDArray[np.complex128]:
        return self.amap.composite_constellation if self.amap else self.const.table


def prepare(
    cfg: SimulationConfig, channel_ir: Optional[NDArray[np.complex128]] = None
) -> LinkSetup:
    """Resolve channel + allocation + (adaptive) bit loading for one config."""
    n = cfg.num_subcarriers

    # Channel: CUSTOM resolves cfg.channel_model; FLAT/None falls back to the
    # reference's hardcoded default 4-tap multipath (simulation/models.py:229-246
    # — note the reference's "FLAT" enum also means the default multipath).
    raw_ir = channel_ir if channel_ir is not None else chm.get_channel(cfg.channel_model)
    taps = chm.normalize_impulse_response(raw_ir)
    order = chm.channel_order(raw_ir)

    h_freq = chm.channel_frequency_response(raw_ir, n)  # raw, un-normalized (quirk)
    gains = np.abs(h_freq) ** 2
    noise_power = float(10.0 ** (-cfg.snr_db / 10.0))

    prefix_length = int(cfg.prefix_length_ratio * order)
    if cfg.prefix_type == PrefixType.NONE:
        prefix_length = 0

    water_level: Optional[float] = None

    if cfg.adaptive_modulation_mode == AdaptiveModulationMode.CAPACITY_BASED:
        # Adaptive branch (simulation/models.py:289-395): allocate a budget of
        # N over the subcarriers, gap-function bit loading off P*|H|^2/N0.
        if cfg.power_allocation_type == PowerAllocationType.WATERFILLING:
            power = al.waterfilling(float(n), gains, noise_power)
            water_level = al.water_level(power, gains, noise_power)
        else:
            power = al.uniform(float(n), n)
        snr_per_sc = power * gains / noise_power
        orders = mp.bit_loading_orders(
            cfg.constellation_type.value, cfg.desired_symbol_error_rate, snr_per_sc
        )
        amap = ad.make_adaptive_mapper(cfg.constellation_type.value, orders)
        bits_per_ofdm = amap.bits_per_ofdm_symbol
        if cfg.num_symbols is not None:
            num_ofdm_symbols = cfg.num_symbols
        else:
            num_ofdm_symbols = cfg.num_bits // bits_per_ofdm  # floor, as reference
        total_bits = bits_per_ofdm * num_ofdm_symbols
        const = None
    else:
        # FIXED branch (simulation/models.py:397-411,483-501).
        const = mp.make_constellation(cfg.constellation_type.value, cfg.constellation_order)
        orders = np.full(n, cfg.constellation_order, dtype=np.int64)
        amap = None
        bps = const.bits_per_symbol
        total_bits = (
            cfg.num_bits if cfg.num_bits is not None else cfg.num_symbols * bps
        )
        if total_bits % bps != 0:
            raise ValueError(
                f"num_bits={total_bits} must be a multiple of bits_per_symbol={bps}"
            )
        num_qam_symbols = total_bits // bps
        if num_qam_symbols % n != 0:
            raise ValueError(
                f"{num_qam_symbols} symbols not divisible by {n} subcarriers"
            )
        num_ofdm_symbols = num_qam_symbols // n
        bits_per_ofdm = bps * n
        if cfg.power_allocation_type == PowerAllocationType.WATERFILLING:
            power = al.waterfilling(1.0, gains, noise_power)
            water_level = al.water_level(power, gains, noise_power)
        else:
            power = al.uniform(1.0, n)

    if order > 0 and (n + prefix_length) < order:
        raise ValueError(
            f"Block length {n + prefix_length} shorter than channel order {order}"
        )

    return LinkSetup(
        cfg=cfg,
        taps=taps,
        h_freq=h_freq,
        channel_gains=gains,
        noise_power=noise_power,
        prefix_length=prefix_length,
        power_allocation=power,
        water_level=water_level,
        constellation_orders=orders,
        const=const,
        amap=amap,
        num_ofdm_symbols=num_ofdm_symbols,
        bits_per_ofdm_symbol=bits_per_ofdm,
        total_bits=total_bits,
    )


# Process-wide executable cache for the fused-kernel hot path: keyed on the
# kernel's static _Spec (ops.pallas_link), with all data constants passed as
# runtime arguments — so every runner whose spec matches (same shapes/modes,
# ANY channel / SNR / adaptive order layout) shares one compiled program.
_SHARED_JIT: Dict[Any, Any] = {}


# ---------------------------------------------------------------------------
# Device-side stat accumulation for chunk scans.
#
# Scans used to stack per-chunk stats as (num_chunks,) outputs and let the
# host sum them in Python ints.  At small-chunk wide configs that output is
# the dominant run cost (a 2^27-OFDM-symbol 1024-sc campaign has ~1M chunks;
# measured 2026-08-19: the wide bench wall DROPPED from 21.0M to 18.2M
# syms/s when the campaign doubled, entirely stacked-output overhead).  The
# scans now fold stats into this O(1) accumulator on device.  Exactness is
# preserved:
#   * error counters: int32 lo/hi split in units of 2^24 — exact integer
#     arithmetic for totals up to 2^55 (per-chunk counts are < 2^31 by the
#     chunk cap, and lo stays < 2^24 after each renormalize);
#   * PAPR running sum/count: Kahan-compensated f32 (the compensation term
#     travels in the accumulator and is added back on the host).
# ---------------------------------------------------------------------------


def _acc_init():
    z = jnp.int32(0)
    f = jnp.float32(0.0)
    return {
        "be_lo": z, "be_hi": z, "se_lo": z, "se_hi": z,
        "papr_peak": f, "papr_sum": f, "papr_sum_c": f,
        "papr_count": f, "papr_count_c": f,
    }


def _acc_add(acc, stats):
    def split_add(lo, hi, x):
        # Per-chunk counts are < 2^31 (chunk cap), so int32 is lossless
        # even when the XLA chunk path computes int64 under x64 tests.
        x = jnp.asarray(x, jnp.int32)
        lo2 = lo + (x & 0xFFFFFF)
        hi2 = hi + (x >> 24) + (lo2 >> 24)
        return lo2 & 0xFFFFFF, hi2

    def kahan(t_c, x):
        t, c = t_c
        y = jnp.asarray(x, jnp.float32) - c
        t2 = t + y
        return t2, (t2 - t) - y

    be_lo, be_hi = split_add(acc["be_lo"], acc["be_hi"], stats["bit_errors"])
    se_lo, se_hi = split_add(acc["se_lo"], acc["se_hi"], stats["symbol_errors"])
    ps, psc = kahan((acc["papr_sum"], acc["papr_sum_c"]), stats["papr_sum"])
    pn, pnc = kahan(
        (acc["papr_count"], acc["papr_count_c"]), stats["papr_count"]
    )
    return {
        "be_lo": be_lo, "be_hi": be_hi, "se_lo": se_lo, "se_hi": se_hi,
        # f32 cast matches kahan()'s: under jax_enable_x64 the XLA chunk
        # path yields f64 papr_peak, which would otherwise promote the scan
        # carry dtype and fail chunked runs at trace time (ADVICE r3).
        "papr_peak": jnp.maximum(
            acc["papr_peak"], jnp.asarray(stats["papr_peak"], jnp.float32)
        ),
        "papr_sum": ps, "papr_sum_c": psc,
        "papr_count": pn, "papr_count_c": pnc,
    }


def _acc_totals(acc, idx=None):
    """(bit_errors, symbol_errors, papr_peak, papr_sum, papr_count) as host
    scalars; ``idx`` selects one point of a stacked (per-point) accumulator.

    Works on both single-device accumulators and sharded ones whose lo/hi
    fields were psum'd across shards (lo sums stay far below 2^31)."""
    g = (lambda a: np.asarray(a)[idx]) if idx is not None else np.asarray
    be = (int(g(acc["be_hi"])) << 24) + int(g(acc["be_lo"]))
    se = (int(g(acc["se_hi"])) << 24) + int(g(acc["se_lo"]))
    papr_sum = float(g(acc["papr_sum"])) + float(g(acc["papr_sum_c"]))
    papr_count = float(g(acc["papr_count"])) + float(g(acc["papr_count_c"]))
    return be, se, float(g(acc["papr_peak"])), papr_sum, int(round(papr_count))


@jax.jit
def _acc_pack(acc):
    """Device-side pack of a scalar accumulator into ONE (9,) f32 vector
    (int32 counters travel bitcast — exact transport)."""
    ints = jnp.stack(
        [jnp.asarray(acc[k], jnp.int32) for k in ("be_lo", "be_hi", "se_lo", "se_hi")]
    )
    fi = jax.lax.bitcast_convert_type(ints, jnp.float32)
    fl = jnp.stack(
        [
            jnp.asarray(acc[k], jnp.float32)
            for k in ("papr_peak", "papr_sum", "papr_sum_c", "papr_count", "papr_count_c")
        ]
    )
    return jnp.concatenate([fi, fl])


@jax.jit
def _stats_pack(stats):
    return _acc_pack(_acc_add(_acc_init(), stats))


def _stats_fetch(stats):
    """Single-transfer totals for one chunk's stats dict (see _acc_fetch)."""
    v = np.asarray(_stats_pack({k: stats[k] for k in (
        "bit_errors", "symbol_errors", "papr_peak", "papr_sum", "papr_count"
    )}))
    ints = v[:4].view(np.int32)
    be = (int(ints[1]) << 24) + int(ints[0])
    se = (int(ints[3]) << 24) + int(ints[2])
    return be, se, float(v[4]), float(v[5]) + float(v[6]), int(round(float(v[7]) + float(v[8])))


def _acc_fetch(acc):
    """`_acc_totals` via ONE device->host transfer.

    The relay backend pays ~140 ms per round trip; `_acc_totals`'s nine
    per-field `np.asarray` fetches cost >1 s of FIXED overhead per run —
    the bulk of the round-3 wide wall-vs-marginal gap (VERDICT r3 item 6).
    Packing on device (1 dispatch) and fetching one 36-byte vector keeps
    the exact int-lo/hi + Kahan semantics."""
    v = np.asarray(_acc_pack(acc))
    ints = v[:4].view(np.int32)
    be = (int(ints[1]) << 24) + int(ints[0])
    se = (int(ints[3]) << 24) + int(ints[2])
    papr_sum = float(v[5]) + float(v[6])
    papr_count = float(v[7]) + float(v[8])
    return be, se, float(v[4]), papr_sum, int(round(papr_count))


class LinkRunner:
    """Compiled executor for one `LinkSetup`.

    The chunk body is a pure function; `run()` drives it over chunks with an
    exact convolution carry.  `chunk_fn` is also the unit the sharded sweep
    driver (ofdm_tpu.parallel.sweep) maps over the device mesh.
    """

    def __init__(self, setup: LinkSetup):
        self.setup = setup
        self._jitted = {}
        # Test hook: run the fused Pallas kernel via the Mosaic emulator on
        # CPU (tests/test_parallel.py asserts the kernel is *selected* under
        # shard_map without TPU hardware).  Never set in production.
        self._interpret = False
        # Cached (peak, sum, count) from the sampled XLA modulate — filled
        # lazily when a run's kernel carried no in-kernel PAPR statistics
        # (wide-diag txext mode; see _papr_sample).
        self._papr_cache = None

    # -- engine selection -----------------------------------------------------
    @property
    def planar(self) -> bool:
        engine = self.setup.cfg.engine
        if engine == "planar":
            return True
        if engine == "complex":
            return False
        return jax.default_backend() not in ("cpu", "gpu")

    @property
    def xla_matmul_passes(self) -> int:
        """bf16 pass count for the XLA matmul-form hot path.

        Same decision-distance gate as the fused kernel
        (pallas_link.selected_passes): matmul_passes="auto" selects the
        single bf16 pass when the constellation half-distance >= 0.07."""
        from ofdm_tpu.ops import pallas_link

        return pallas_link.selected_passes(self)

    # -- device constants ---------------------------------------------------
    def _constants(self):
        s = self.setup
        cdtype = jnp.complex64 if s.cfg.dtype == "complex64" else jnp.complex128
        if self.planar:
            T = s.block_length
            t0, t1 = linops.conv_matrices(s.taps, T)
            # ISI band: T1's only nonzero rows are its last E = taps-1
            # (linops.convolve's `ext` form) — (B, E) @ (E, T) instead of a
            # second dense (T, T) matmul.
            E = linops.ext_width(len(np.asarray(s.taps)), T)
            band = t1[T - E :, :] if E else t1[:0, :]
            return {
                "taps": cplx.from_complex(s.taps),
                "h_freq": cplx.from_complex(s.h_freq),
                "sqrt_power": jnp.asarray(np.sqrt(s.power_allocation), jnp.float32),
                "cdtype": cdtype,
                "conv_t0": (jnp.asarray(t0.real, jnp.float32), jnp.asarray(t0.imag, jnp.float32)),
                "conv_t1": (jnp.asarray(band.real, jnp.float32), jnp.asarray(band.imag, jnp.float32)),
                "conv_ext": E,
            }
        return {
            "taps": jnp.asarray(s.taps, cdtype),
            "h_freq": jnp.asarray(s.h_freq, cdtype),
            "sqrt_power": jnp.asarray(np.sqrt(s.power_allocation), jnp.float32),
            "cdtype": cdtype,
        }

    # -- one chunk ------------------------------------------------------------
    def chunk_body(
        self,
        key: jax.Array,
        conv_carry: jnp.ndarray,
        num_syms: int,
        return_symbols: bool = False,
        measured_power: Optional[jnp.ndarray] = None,
        snr_db: Optional[jnp.ndarray] = None,
        sqrt_power: Optional[jnp.ndarray] = None,
        axis_name: Optional[str] = None,
        halo_axis: Optional[str] = None,
    ):
        """Process ``num_syms`` OFDM symbols; returns stats + new carry.

        ``halo_axis``: when set (ShardedLinkRunner stream_mode="halo"), the
        convolution treats the sharded batch as ONE contiguous stream —
        neighbor shards exchange the carry via ppermute (parallel.halo), and
        the sharded output is bit-exact vs the unsharded stream convolution.

        Fully traceable: called under jit by `run()` and under shard_map by
        the sweep driver (which supplies a psum'd ``measured_power``).

        ``snr_db`` / ``sqrt_power`` are *traced* scalars/vectors so one
        compiled executable serves a whole SNR sweep (baking them in as
        constants would force a recompile per SNR point — on remote-compile
        TPU relays that dominates wall clock).  They default to the setup's
        values.  Adaptive mode is inherently per-SNR (the constellation
        orders are SNR-dependent shapes), so it recompiles per point.
        """
        s = self.setup
        cfg = s.cfg
        n = cfg.num_subcarriers
        planar = self.planar

        # (The round-2 "batchminor" (time, batch)-layout experiment was
        # pruned in round 4: measured slower than the batch-major chunk —
        # 5.4M vs 8.6M OFDM syms/s at the bench config; numbers recorded in
        # docs/PERFORMANCE.md, code in git history.)

        c = self._constants()
        if snr_db is None:
            snr_db = jnp.float32(cfg.snr_db)
        if sqrt_power is None:
            sqrt_power = c["sqrt_power"]

        kbits, knoise = jax.random.split(key)

        # --- TX: random bit-words -> symbols ---------------------------------
        # Uniform random bits grouped MSB-first into b-bit words ARE uniform
        # random constellation indices, so the bit source and the mapper's
        # bit-packing collapse into one masked draw — no bit tensors in the
        # hot path (bit-level APIs live in ops.bits/ops.mapping for tests).
        if s.is_adaptive:
            tx_idx = prng.uniform_indices(kbits, (num_syms, n), ad.index_mask(s.amap))
            if planar:
                symbols = ad.encode_from_indices_planar(tx_idx, s.amap)
            else:
                symbols = ad.encode_from_indices(tx_idx, s.amap, dtype=c["cdtype"])
            max_bits = s.amap.max_bits
        else:
            bps = s.const.bits_per_symbol
            tx_idx = prng.uniform_indices(
                kbits, (num_syms, n), np.uint32(s.const.order - 1)
            )
            if planar:
                symbols = mp.encode_indices_planar(tx_idx, s.const)
            else:
                symbols = mp.encode_indices(tx_idx, s.const, dtype=c["cdtype"])
            max_bits = bps

        if cfg.apply_power_allocation:
            symbols = cplx.scale(symbols, sqrt_power)

        add_noise = cfg.noise_type == NoiseType.AWGN
        use_mm = planar and cfg.hotpath in ("auto", "matmul", "pallas")
        if use_mm:
            # Matmul-form link operators (ops/linops.py): IDFT+guard, the
            # banded-Toeplitz stream convolution, and guard-strip+DFT are
            # three MXU matmuls — measured ~4x faster than the tap-unrolled
            # convolution on the target TPU (lane-offset updates relayout).
            # The bf16 pass count follows the same decision-distance gate as
            # the fused kernel (matmul_passes="auto" -> 1 pass for QAM<=256).
            xp = self.xla_matmul_passes
            blocks = linops.modulate(
                symbols, n, cfg.prefix_type, s.prefix_length, cfg.modulation_type,
                passes=xp,
            )
            papr_peak, papr_sum, papr_count = mt.papr_stats(blocks)
            if halo_axis is not None:
                from ofdm_tpu.parallel import halo

                rx_blocks, conv_carry = halo.convolve_stream_sharded(
                    blocks, c["conv_t0"], c["conv_t1"], conv_carry, halo_axis,
                    passes=xp, ext=c["conv_ext"],
                )
            else:
                rx_blocks, conv_carry = linops.convolve(
                    blocks, c["conv_t0"], c["conv_t1"], conv_carry,
                    passes=xp, ext=c["conv_ext"],
                )
            if add_noise:
                rx_blocks = ch.awgn(
                    knoise, rx_blocks, snr_db, measured_power, axis_name
                )
            freq = linops.demodulate(
                rx_blocks, n, cfg.prefix_type, s.prefix_length, passes=xp
            )
        else:
            # --- TX: modulate ------------------------------------------------
            if cfg.modulation_type == ModulationType.OFDM:
                blocks = ofdm.ofdm_modulate(symbols, n, cfg.prefix_type, s.prefix_length)
            else:  # SC-OFDM / SC-FDE: prefix only (modulation/models.py:67-72)
                blocks = ofdm.sc_modulate(symbols, cfg.prefix_type, s.prefix_length)

            papr_peak, papr_sum, papr_count = mt.papr_stats(blocks)

            # --- channel -------------------------------------------------------
            if halo_axis is not None:
                from ofdm_tpu.parallel import halo

                rx_blocks, conv_carry = halo.convolve_taps_sharded(
                    blocks, c["taps"], conv_carry, halo_axis
                )
                if add_noise:
                    rx_blocks = ch.awgn(
                        knoise, rx_blocks, snr_db, measured_power, axis_name
                    )
            else:
                rx_blocks, conv_carry = ch.transmit(
                    knoise,
                    blocks,
                    c["taps"],
                    snr_db,
                    add_noise=add_noise,
                    carry=conv_carry,
                    measured_power=measured_power,
                    axis_name=axis_name,
                )
            freq = ofdm.ofdm_demodulate_to_freq(
                rx_blocks, n, cfg.prefix_type, s.prefix_length
            )
        eqd = eq.equalize(freq, c["h_freq"], cfg.equalization_method, snr_db)
        data = (
            ofdm.sc_demodulate_from_freq(
                eqd, n, passes=self.xla_matmul_passes if use_mm else 3
            )
            if cfg.modulation_type == ModulationType.SC_OFDM
            else eqd
        )

        if cfg.normalize_before_demap:
            avg = cplx.mean_abs2(data)
            data = cplx.where(avg > 1e-10, data / jnp.sqrt(avg), data)

        # --- demap + metrics ---------------------------------------------------
        if s.is_adaptive:
            rx_idx = ad.decode_to_indices(data, s.amap)
        else:
            rx_idx = mp.decode_hard_planar(data, s.const) if planar else mp.decode_hard(
                data, s.const
            )

        stats = {
            "bit_errors": mt.index_bit_errors(tx_idx, rx_idx, max_bits),
            "symbol_errors": mt.symbol_errors(tx_idx, rx_idx),
            "papr_peak": papr_peak,
            "papr_sum": papr_sum,
            "papr_count": jnp.asarray(papr_count, jnp.float32),
        }
        if return_symbols:
            stats["received_symbols"] = data.reshape(-1)
        return stats, conv_carry

    # (received_symbols is a CArray on the planar engine; run() converts.)

    # -- compiled chunk step --------------------------------------------------
    def _chunk_fn(self, num_syms: int, return_symbols: bool, axis_name=None):
        """Traceable chunk callable; prefers the fused Pallas kernel when the
        config supports it (hotpath="pallas") and falls back to chunk_body.

        ``axis_name``: mesh axis for the XLA fallback's global AWGN power
        pmean under shard_map.  The fused kernel measures power per tile
        (>= 64k samples — statistically identical, see pallas_link docstring)
        so it needs no collective.
        """
        if (
            self.setup.cfg.hotpath in ("auto", "pallas")
            and not return_symbols
            and self.planar
        ):
            from ofdm_tpu.ops import pallas_link

            fn = pallas_link.make_pallas_chunk(self, num_syms, interpret=self._interpret)
            if fn is not None:
                return fn
        return lambda key, carry, snr_db, sqrt_power: self.chunk_body(
            key, carry, num_syms, return_symbols,
            snr_db=snr_db, sqrt_power=sqrt_power, axis_name=axis_name,
        )

    def _lifted(self, num_syms: int):
        """Shared-executable Pallas chunk: (fn, consts, spec) or None."""
        if self.setup.cfg.hotpath not in ("auto", "pallas") or not self.planar:
            return None
        from ofdm_tpu.ops import pallas_link

        return pallas_link.make_pallas_chunk_lifted(
            self, num_syms, interpret=self._interpret
        )

    def _step(self, num_syms: int, return_symbols: bool):
        if not return_symbols:
            lifted = self._lifted(num_syms)
            if lifted is not None:
                fn, consts, spec = lifted
                jkey = ("step", spec)
                j = _SHARED_JIT.get(jkey)
                if j is None:
                    j = _SHARED_JIT.setdefault(jkey, jax.jit(fn))
                return lambda key, carry, snr, sp: j(key, carry, snr, sp, consts)
        key_ = ("step", num_syms, return_symbols)
        if key_ not in self._jitted:
            self._jitted[key_] = jax.jit(self._chunk_fn(num_syms, return_symbols))
        return self._jitted[key_]

    def _scan(self, num_chunks: int, num_syms: int):
        """All full chunks under ONE jit dispatch (lax.scan over the carry).

        Per-dispatch latency on remote-relay TPU backends is ~100ms; scanning
        inside the executable makes a whole Monte-Carlo run one round trip.
        Per-chunk stats come back stacked (host sums in Python ints, so >2^31
        total bit errors can't overflow the int32 device counters).

        On the fused-kernel path the scan executable is cached *globally*
        keyed on the kernel spec — the link matrices / equalizer rows /
        adaptive order rows are runtime arguments, so an SNR x channel (or
        adaptive per-point) sweep compiles ONCE and every subsequent point
        reuses the executable (remote compiles cost minutes; this is the
        difference between an all-compile sweep and a compute-bound one).
        """
        lifted = self._lifted(num_syms)
        if lifted is not None:
            fn, consts, spec = lifted
            jkey = ("scan", spec, num_chunks)
            j = _SHARED_JIT.get(jkey)
            if j is None:

                def f(key, carry0, snr_db, sqrt_power, consts_):
                    def body(cs, i):
                        carry, acc = cs
                        stats, carry = fn(
                            jax.random.fold_in(key, i), carry, snr_db, sqrt_power, consts_
                        )
                        return (carry, _acc_add(acc, stats)), None

                    (carry, acc), _ = jax.lax.scan(
                        body, (carry0, _acc_init()), jnp.arange(num_chunks)
                    )
                    return carry, acc

                j = _SHARED_JIT.setdefault(jkey, jax.jit(f))
            return lambda key, carry0, snr, sp: j(key, carry0, snr, sp, consts)
        key_ = ("scan", num_chunks, num_syms)
        if key_ not in self._jitted:

            chunk_fn = self._chunk_fn(num_syms, False)

            def f(key, carry0, snr_db, sqrt_power):
                def body(cs, i):
                    carry, acc = cs
                    stats, carry = chunk_fn(
                        jax.random.fold_in(key, i), carry, snr_db, sqrt_power
                    )
                    return (carry, _acc_add(acc, stats)), None

                (carry, acc), _ = jax.lax.scan(
                    body, (carry0, _acc_init()), jnp.arange(num_chunks)
                )
                return carry, acc

            self._jitted[key_] = jax.jit(f)
        return self._jitted[key_]

    # -- per-SNR host-side parameters (fixed mode only) -------------------------
    def point_params(self, snr_db: float):
        """(power_allocation, water_level) for an SNR point — host f64.

        Fixed mode computes (but does not apply by default) a total_power=1.0
        allocation per point (simulation/models.py:483-501).
        """
        s = self.setup
        cfg = s.cfg
        if s.is_adaptive or cfg.power_allocation_type != PowerAllocationType.WATERFILLING:
            return s.power_allocation, s.water_level
        noise_power = float(10.0 ** (-snr_db / 10.0))
        power = al.waterfilling(1.0, s.channel_gains, noise_power)
        return power, al.water_level(power, s.channel_gains, noise_power)

    def _pallas_chunk_multiple(self) -> int:
        """Chunk granularity that keeps the bulk on the fused kernel.

        Single device: the kernel's grid tile.  ShardedLinkRunner overrides
        with n_devices * tile so every *per-device* chunk stays a tile
        multiple under shard_map.
        """
        from ofdm_tpu.ops import pallas_link

        return pallas_link.chunk_multiple(self)

    def _init_carry(self):
        if self.planar:
            if self.setup.cfg.hotpath in ("auto", "matmul", "pallas"):
                # Matmul-form conv carries the previous chunk's last time row.
                t = self.setup.block_length
                return cplx.CArray(jnp.zeros((t,), jnp.float32), jnp.zeros((t,), jnp.float32))
            k = max(len(self.setup.taps) - 1, 0)
            return cplx.CArray(jnp.zeros((k,), jnp.float32), jnp.zeros((k,), jnp.float32))
        k = max(len(self.setup.taps) - 1, 0)
        cdtype = jnp.complex64 if self.setup.cfg.dtype == "complex64" else jnp.complex128
        return jnp.zeros((k,), cdtype)

    # -- chunk planning (shared by run() and run_grid()) -----------------------
    def _chunk_plan(self):
        """(chunk, num_full, rem, hotpath_used, matmul_passes_used).

        Error counters accumulate on-device in int32 (metrics.index_bit_errors
        and the fused kernel's SMEM accumulators run per *chunk*).  Cap the
        effective chunk so one chunk can never carry >= 2^31 bits, whatever
        symbols_per_chunk the caller asked for; the host accumulates chunk
        totals in Python ints, so whole runs stay exact at any size.
        """
        s = self.setup
        B = s.num_ofdm_symbols
        chunk = s.cfg.symbols_per_chunk or B
        chunk = min(chunk, B)
        max_chunk = (2**31 - 1) // max(s.bits_per_ofdm_symbol, 1)
        chunk = min(chunk, max_chunk)
        hotpath_used = "xla"
        # The planar XLA matmul path and the fused kernel share the same
        # pass-count gate, so this records the numeric mode either way.
        matmul_passes_used = (
            self.xla_matmul_passes
            if self.planar and s.cfg.hotpath in ("auto", "matmul", "pallas")
            else None
        )
        if self.planar and s.cfg.hotpath in ("auto", "pallas"):
            # Keep the scanned bulk on the fused Pallas kernel (which needs a
            # _TILE-multiple chunk — per *device* under sharding, see
            # _pallas_chunk_multiple): round the chunk down and let the
            # remainder run one XLA step, instead of silently dropping the
            # whole run to the ~2.5x slower XLA path (41.8M vs 105.9M OFDM
            # syms/s at the bench config since the passes-gated matmul path).
            from ofdm_tpu.ops import pallas_link

            gran = self._pallas_chunk_multiple()
            if chunk >= gran and pallas_link.supports(self, interpret=self._interpret):
                chunk -= chunk % gran
                hotpath_used = "pallas"
        return chunk, B // chunk, B % chunk, hotpath_used, matmul_passes_used

    def _papr_sample(self):
        """(peak_power, power_sum, count) from a sampled XLA modulate.

        Wide-diag fused kernels carry NO TX matrices (their multi-MB VMEM
        residency cost ~20 ns/sym at 1024 subcarriers — pallas_link._Spec
        .txext), so the PAPR statistic is computed here instead: draw a
        representative batch of constellation indices with the hardware
        PRNG, modulate on the XLA planar path, and cache the running-PAPR
        ingredients.  PAPR depends only on the TX signal distribution —
        it is SNR-independent — so one sample serves every sweep point of
        a runner (the reference also reports a TX-side statistic,
        simulation/models.py:519-524; subsample semantics documented in
        docs/PARITY.md).
        """
        if self._papr_cache is None:
            s = self.setup
            cfg = s.cfg
            from ofdm_tpu.ops import adaptive as ad
            from ofdm_tpu.ops import linops
            from ofdm_tpu.ops import mapping as mp
            from ofdm_tpu.ops import metrics as mt
            from ofdm_tpu.ops import prng

            n = cfg.num_subcarriers
            # ~33.5M time samples (PAPR peaks grow with sample count; the
            # subsample semantics are documented in docs/PARITY.md).
            S = int(
                min(
                    max(1024, (1 << 25) // max(s.block_length, 1)),
                    s.num_ofdm_symbols,
                )
            )
            tr, ti = linops.tx_matrix(
                n, cfg.prefix_type, s.prefix_length, cfg.modulation_type
            )
            wr = jnp.asarray(tr, jnp.float32)
            wi = jnp.asarray(ti, jnp.float32)
            if s.is_adaptive:
                mask = jnp.asarray(ad.index_mask(s.amap))
            else:
                mask = jnp.uint32(cfg.constellation_order - 1)

            def f(key):
                idx = prng.uniform_indices(key, (S, n), mask)
                if s.is_adaptive:
                    sym = ad.encode_from_indices_planar(idx, s.amap)
                else:
                    sym = mp.encode_indices_planar(idx, s.const)
                x = cplx.matmul(sym, wr, wi, passes=self.xla_matmul_passes)
                return mt.papr_stats(x)

            peak, total, count = jax.jit(f)(jax.random.PRNGKey(0x9A9))
            self._papr_cache = (float(peak), float(total), int(count))
        return self._papr_cache

    def _results(
        self,
        snr_db: float,
        totals: Dict[str, int],
        papr_peak: float,
        papr_sum: float,
        papr_count: int,
        elapsed: float,
        power_allocation,
        water_level,
        received_sample,
        hotpath_used: str,
        matmul_passes_used,
        render_constellation: bool = False,
    ) -> Dict[str, Any]:
        """Assemble the reference-style results dict for one SNR point."""
        # Wide-diag fused kernels run with external PAPR (txext): the
        # kernel reports zero PAPR samples and the sampled XLA modulate
        # supplies the statistic (cached across points — TX-side only).
        papr_estimator = "in_run"
        if papr_count == 0 and self.setup.num_ofdm_symbols > 0:
            papr_peak, papr_sum, papr_count = self._papr_sample()
            papr_estimator = "sampled_tx"  # fixed-key sample, docs/PARITY.md
        s = self.setup
        cfg = s.cfg
        B = s.num_ofdm_symbols
        num_symbols_total = B * cfg.num_subcarriers
        ber = totals["bit_errors"] / s.total_bits if s.total_bits > 0 else 0.0
        ser = totals["symbol_errors"] / num_symbols_total if num_symbols_total else 0.0

        results: Dict[str, Any] = {
            # config echo (simulation/models.py:413-444)
            "num_bits": cfg.num_bits,
            "num_symbols": cfg.num_symbols,
            "num_subcarriers": cfg.num_subcarriers,
            "constellation_order": cfg.constellation_order,
            "constellation_scheme": cfg.constellation_type.name,
            "modulator_type": cfg.modulation_type.name,
            "prefix_scheme": cfg.prefix_type.name,
            "prefix_acronym": {"CYCLIC": "CP", "ZERO": "ZP", "NONE": ""}[
                cfg.prefix_type.name
            ],
            "equalizator_type": cfg.equalization_method.name,
            "snr_db": snr_db,
            "noise_scheme": cfg.noise_type.name,
            "power_allocation_type": cfg.power_allocation_type.name,
            "power_allocation_acronym": (
                "WF"
                if cfg.power_allocation_type == PowerAllocationType.WATERFILLING
                else "UNIFORM"
            ),
            "adaptive_modulation_mode": cfg.adaptive_modulation_mode.name,
            "constellation_order_per_subcarrier": s.constellation_orders.tolist(),
            "water_level": water_level,
            "title": cfg.title,
            "subtitle": cfg.subtitle,
            "allocated_power": power_allocation.tolist(),
            # metrics
            "papr_db": mt.papr_db(papr_peak, papr_sum, papr_count),
            # Fraction of time samples the PAPR statistic saw: 1.0 on the
            # XLA paths; < 1.0 when the diag-mode kernel samples the TX
            # plane every papr_stride-th tile (config.papr_stride).  Error
            # counts are always over ALL symbols regardless.
            "papr_sample_fraction": (
                papr_count / (B * s.block_length) if B else 1.0
            ),
            # "in_run": the statistic came from the run's own TX planes
            # (full or papr_stride-sampled); "sampled_tx": the wide-link
            # fixed-key XLA sample (_papr_sample, docs/PARITY.md).
            "papr_estimator": papr_estimator,
            "bit_errors": totals["bit_errors"],
            "symbol_errors": totals["symbol_errors"],
            "total_bits": s.total_bits,
            "bit_error_rate": ber,
            "symbol_error_rate": ser,
            "received_symbols": received_sample,
            # timing (reference: transmission_time_ms + the quirky
            # bitrate_mbps = total_bits/1e6, simulation/models.py:804-810)
            "transmission_time_ms": elapsed * 1000.0,
            "bitrate_mbps": s.total_bits / 1e6,
            # TPU-native throughput counters (SURVEY §5 tracing gap)
            "ofdm_symbols_per_s": B / elapsed if elapsed > 0 else float("inf"),
            "bits_per_s": s.total_bits / elapsed if elapsed > 0 else float("inf"),
            # Numeric-mode provenance (ADVICE r1): which hot path produced
            # this curve and, on the fused kernel, how many bf16 split passes
            # per MXU matmul (1 = ~6e-3 rel err bf16, 3 = f32-grade bf16x3).
            "hotpath_used": hotpath_used,
            "matmul_passes_used": matmul_passes_used,
            # Profiling-only kernel ablation (OFDM_TPU_KERNEL_ABLATE):
            # non-empty means the statistics above are intentionally WRONG
            # (tools/kernel_attrib.py); echoed so no ablated run can pass
            # as a real one.
            "kernel_ablation": os.environ.get("OFDM_TPU_KERNEL_ABLATE", ""),
            "constellation_plot": None,
        }
        if render_constellation:
            from ofdm_tpu.utils.visualization import render_results_constellation

            results["constellation_plot"] = render_results_constellation(
                results,
                s.constellation_points,
                s.constellation_orders,
                cfg.num_subcarriers,
                adaptive=s.is_adaptive,
            )
        return results

    # -- full run ----------------------------------------------------------------
    def run(
        self,
        key: jax.Array,
        collect_symbols: int = 0,
        snr_db: Optional[float] = None,
        render_constellation: bool = False,
    ) -> Dict[str, Any]:
        """Execute the whole simulation; returns a reference-style results dict.

        ``snr_db`` overrides the config's SNR *without recompiling* (fixed
        mode only): one LinkRunner serves a whole SNR sweep.  Adaptive mode
        raises — its bit loading is SNR-dependent; build one runner per point.

        ``render_constellation=True`` renders the reference's in-run
        constellation figure into ``results["constellation_plot"]`` (a PIL
        image, simulation/models.py:630-796).  Default off: on TPU, plotting
        belongs off the hot path (ResultsManager renders from
        ``received_symbols``); the key is always present for drop-in
        reference-dict compatibility (None when not rendered).
        """
        s = self.setup
        if render_constellation and collect_symbols <= 0:
            collect_symbols = 4096  # enough for a representative scatter
        if snr_db is None:
            snr_db = s.cfg.snr_db
        elif s.is_adaptive and snr_db != s.cfg.snr_db:
            raise ValueError(
                "Adaptive bit loading is SNR-dependent; prepare() a new setup per point."
            )
        power_allocation, water_level = self.point_params(snr_db)
        snr_arr = jnp.float32(snr_db)
        sqrt_power = jnp.asarray(np.sqrt(power_allocation), jnp.float32)

        B = s.num_ofdm_symbols
        chunk, num_full, rem, hotpath_used, matmul_passes_used = self._chunk_plan()

        totals = {"bit_errors": 0, "symbol_errors": 0}
        papr_peak, papr_sum, papr_count = 0.0, 0.0, 0
        received_sample = None

        if collect_symbols > 0:
            # Replay chunk 0 with symbol capture.  On the Pallas path the
            # dump-variant kernel re-runs chunk 0 with the scan's own key
            # and captures tile 0's data plane as an extra output — the
            # rendered constellation is BITWISE the counted realization,
            # single-device AND sharded (each shard dumps its own tile-0
            # plane with its fold_in'd stream; ShardedLinkRunner._dump_step
            # gathers them).  XLA paths replay chunk_body (exact there).
            if hotpath_used == "pallas" and not self._jitted.get(
                ("dump_failed", chunk)
            ):
                jd = self._dump_step(chunk)
                if jd is not None:
                    try:
                        stats0, _ = jd(
                            jax.random.fold_in(key, 0), self._init_carry(),
                            snr_arr, sqrt_power,
                        )
                        received_sample = cplx.to_numpy(
                            stats0["received_symbols"]
                        )[:collect_symbols]
                    except Exception:
                        # Giant-width lr tiles run within ~10% of the
                        # chip's VMEM (pallas_link._VMEM_COMPILER_GIANT_LR)
                        # and the dump variant's two extra (ROWS, W) staged
                        # outputs can push past the cap — fall back to the
                        # XLA replay (representative sample) there.  The
                        # failure is remembered (no multi-minute recompile
                        # retry per run) and surfaced via the
                        # received_symbols_exact results key.
                        self._jitted[("dump_failed", chunk)] = True
                        received_sample = None
            dump_capture = received_sample is not None
            # Exactness provenance: True when the sample is bitwise the
            # counted realization — the dump kernel on Pallas paths, or
            # the deterministic chunk-0 replay on the XLA path (same
            # chunk_body + same keys).  False only for the Pallas-path
            # XLA-replay fallback (representative sample).
            capture_exact = dump_capture or hotpath_used != "pallas"
            if received_sample is None:
                step0 = self._step(min(chunk, B), True)
                stats0, _ = step0(
                    jax.random.fold_in(key, 0), self._init_carry(), snr_arr, sqrt_power
                )
                received_sample = cplx.to_numpy(stats0["received_symbols"])[:collect_symbols]

        t0 = time.perf_counter()
        carry = self._init_carry()
        if num_full > 0:
            scan = self._scan(num_full, chunk)
            carry, acc = scan(key, carry, snr_arr, sqrt_power)
            be, se, pk, psum_, pcount = _acc_fetch(acc)
            totals["bit_errors"] += be
            totals["symbol_errors"] += se
            papr_peak = max(papr_peak, pk)
            papr_sum += psum_
            papr_count += pcount
        if rem > 0:
            step = self._step(rem, False)
            stats, carry = step(jax.random.fold_in(key, num_full), carry, snr_arr, sqrt_power)
            be2, se2, pk2, ps2, pc2 = _stats_fetch(stats)
            totals["bit_errors"] += be2
            totals["symbol_errors"] += se2
            papr_peak = max(papr_peak, pk2)
            papr_sum += ps2
            papr_count += pc2
        elapsed = time.perf_counter() - t0

        results = self._results(
            snr_db,
            totals,
            papr_peak,
            papr_sum,
            papr_count,
            elapsed,
            power_allocation,
            water_level,
            received_sample,
            hotpath_used,
            matmul_passes_used,
            render_constellation=render_constellation,
        )
        # received_symbols_exact: None when no capture was requested.
        results["received_symbols_exact"] = (
            capture_exact if collect_symbols > 0 else None
        )
        return results

    # -- whole-grid run (all SNR points in ONE dispatch) -----------------------
    def _grid_scan(self, num_points: int, num_chunks: int, num_syms: int):
        """Compiled grid executable: scan over SNR points x chunks, one dispatch.

        Returns a callable ``(key, carry0, point_ids, snrs, sqrt_powers) ->
        stacked stats (num_points, num_chunks, ...)`` or None when no chunk
        body is available.  Each point re-initializes the convolution carry
        and draws chunk keys as ``fold_in(fold_in(key, point_id), chunk)`` —
        exactly the stream layout of a host loop of `run()` calls with
        ``point_key = fold_in(key, point_id)``, so grid results are
        bit-identical to the looped sweep they replace.
        """
        lifted = self._lifted(num_syms)
        if lifted is not None:
            fn, consts, spec = lifted
            jkey = ("grid", spec, num_points, num_chunks)
            j = _SHARED_JIT.get(jkey)
            if j is None:

                def f(key, carry0, point_ids, snrs, sqrt_powers, consts_):
                    def pbody(_, xs):
                        p, snr, sp = xs
                        pkey = jax.random.fold_in(key, p)

                        def cbody(cs, i):
                            carry, acc = cs
                            stats, carry = fn(
                                jax.random.fold_in(pkey, i), carry, snr, sp, consts_
                            )
                            return (carry, _acc_add(acc, stats)), None

                        (carry_end, acc), _ = jax.lax.scan(
                            cbody, (carry0, _acc_init()), jnp.arange(num_chunks)
                        )
                        return None, (acc, carry_end)

                    _, out = jax.lax.scan(
                        pbody, None, (point_ids, snrs, sqrt_powers)
                    )
                    return out

                j = _SHARED_JIT.setdefault(jkey, jax.jit(f))
            return lambda key, carry0, pids, snrs, sps: j(
                key, carry0, pids, snrs, sps, consts
            )
        key_ = ("grid", num_points, num_chunks, num_syms)
        if key_ not in self._jitted:
            chunk_fn = self._chunk_fn(num_syms, False)

            def f(key, carry0, point_ids, snrs, sqrt_powers):
                def pbody(_, xs):
                    p, snr, sp = xs
                    pkey = jax.random.fold_in(key, p)

                    def cbody(cs, i):
                        carry, acc = cs
                        stats, carry = chunk_fn(
                            jax.random.fold_in(pkey, i), carry, snr, sp
                        )
                        return (carry, _acc_add(acc, stats)), None

                    (carry_end, acc), _ = jax.lax.scan(
                        cbody, (carry0, _acc_init()), jnp.arange(num_chunks)
                    )
                    return None, (acc, carry_end)

                _, out = jax.lax.scan(pbody, None, (point_ids, snrs, sqrt_powers))
                return out

            self._jitted[key_] = jax.jit(f)
        return self._jitted[key_]

    def _grid_scan_multi(self, num_points: int, num_chunks: int, spec, fn, consts0):
        """Grid executable whose per-point consts are scan inputs.

        Used for adaptive sweeps: each SNR point's bit loading gives it
        different order/equalizer constant rows, but an equal kernel spec
        means one executable can scan over the stacked consts pytree.
        Stream layout matches `_grid_scan` (and therefore a host loop of
        per-point runs).
        """
        jkey = ("agrid", spec, num_points, num_chunks)
        j = _SHARED_JIT.get(jkey)
        if j is None:

            def f(key, carry0, point_ids, snrs, sqrt_powers, consts_stacked):
                def pbody(_, xs):
                    p, snr, sp, consts_ = xs
                    pkey = jax.random.fold_in(key, p)

                    def cbody(cs, i):
                        carry, acc = cs
                        stats, carry = fn(
                            jax.random.fold_in(pkey, i), carry, snr, sp, consts_
                        )
                        return (carry, _acc_add(acc, stats)), None

                    (carry_end, acc), _ = jax.lax.scan(
                        cbody, (carry0, _acc_init()), jnp.arange(num_chunks)
                    )
                    return None, (acc, carry_end)

                _, out = jax.lax.scan(
                    pbody, None, (point_ids, snrs, sqrt_powers, consts_stacked)
                )
                return out

            j = _SHARED_JIT.setdefault(jkey, jax.jit(f))
        return j

    def _grid_multi_lift(self, chunk: int):
        """(fn, consts, spec) for the multi-consts grid, or None.

        ShardedLinkRunner overrides with its per-device lift so the multi
        grid shards like everything else.
        """
        return self._lifted(chunk)

    def _dump_step(self, chunk: int):
        """Jitted chunk-0 capture replay on the fused path, or None.

        Single-device: the dump-variant kernel (make_pallas_dump_chunk).
        ShardedLinkRunner overrides with a shard_map'd dump whose gathered
        per-shard tile-0 planes are bitwise counted symbols too."""
        key_ = ("dump", chunk)
        if key_ not in self._jitted:
            from ofdm_tpu.ops import pallas_link

            dfn = pallas_link.make_pallas_dump_chunk(
                self, chunk, interpret=self._interpret
            )
            self._jitted[key_] = None if dfn is None else jax.jit(dfn)
        return self._jitted[key_]

    def run_grid(
        self,
        key: jax.Array,
        snrs: Sequence[float],
        collect_symbols: int = 0,
        key_offset: int = 0,
    ) -> List[Dict[str, Any]]:
        """Run a whole fixed-mode SNR sweep in ONE device dispatch.

        Per-dispatch latency on remote-relay TPU backends is ~140 ms, which
        dominates moderate sweeps (a 2^22-symbol point computes in ~17 ms on
        the fused kernel); scanning the SNR axis *inside* the executable makes
        the entire grid one round trip.  SNR and the per-point waterfilling
        sqrt-power rows are already traced arguments of the shared chunk
        executable, so the grid executable is cached on the same kernel spec
        and compiles once per config family.

        Point ``p`` uses ``point_key = fold_in(key, key_offset + p)`` and is
        bit-identical to ``self.run(point_key, snr_db=snrs[p])`` (same PRNG
        stream layout — see `_grid_scan`).  Adaptive mode raises (its bit
        loading is SNR-dependent; `run_sweep` builds one runner per point).

        Per-point wall time is reported as the grid's elapsed/len(snrs) (the
        points execute back-to-back inside one dispatch); each result carries
        ``grid_points = len(snrs)`` so consumers can tell.
        """
        s = self.setup
        if s.is_adaptive:
            raise ValueError(
                "Adaptive bit loading is SNR-dependent; use run_sweep (one "
                "prepare() per point)."
            )
        snrs = [float(x) for x in snrs]
        npts = len(snrs)
        if npts == 0:
            return []
        params = [self.point_params(snr) for snr in snrs]
        chunk, num_full, rem, hotpath_used, matmul_passes_used = self._chunk_plan()
        grid = self._grid_scan(npts, num_full, chunk) if num_full > 0 else None
        if grid is None:
            return [
                self.run(
                    jax.random.fold_in(key, key_offset + p),
                    collect_symbols=collect_symbols,
                    snr_db=snr,
                )
                for p, snr in enumerate(snrs)
            ]

        point_ids = jnp.arange(key_offset, key_offset + npts, dtype=jnp.uint32)
        snr_arr = jnp.asarray(snrs, jnp.float32)
        sqrt_powers = jnp.asarray(
            np.stack([np.sqrt(p) for p, _ in params]), jnp.float32
        )

        samples: List[Any] = [None] * npts
        if collect_symbols > 0:
            # Per-point XLA replay (outside the timed window) — same
            # statistically-representative-sample semantics as run().
            step0 = self._step(min(chunk, s.num_ofdm_symbols), True)
            for p in range(npts):
                pkey = jax.random.fold_in(key, key_offset + p)
                stats0, _ = step0(
                    jax.random.fold_in(pkey, 0),
                    self._init_carry(),
                    jnp.float32(snrs[p]),
                    sqrt_powers[p],
                )
                samples[p] = cplx.to_numpy(stats0["received_symbols"])[
                    :collect_symbols
                ]

        t0 = time.perf_counter()
        accs, carries = grid(key, self._init_carry(), point_ids, snr_arr, sqrt_powers)
        accs = jax.tree.map(np.asarray, accs)
        rem_stats = []
        if rem > 0:
            # Continue each point's convolution stream from its post-scan
            # carry (stacked on axis 0 by the grid's point scan) — identical
            # to run()'s remainder step.
            step = self._step(rem, False)
            for p in range(npts):
                pkey = jax.random.fold_in(key, key_offset + p)
                st, _ = step(
                    jax.random.fold_in(pkey, num_full),
                    jax.tree.map(lambda a: a[p], carries),
                    jnp.float32(snrs[p]),
                    sqrt_powers[p],
                )
                rem_stats.append(st)
        elapsed = time.perf_counter() - t0

        out: List[Dict[str, Any]] = []
        for p, snr in enumerate(snrs):
            be, se, papr_peak, papr_sum, papr_count = _acc_totals(accs, p)
            totals = {"bit_errors": be, "symbol_errors": se}
            if rem > 0:
                st = rem_stats[p]
                totals["bit_errors"] += int(st["bit_errors"])
                totals["symbol_errors"] += int(st["symbol_errors"])
                papr_peak = max(papr_peak, float(st["papr_peak"]))
                papr_sum += float(st["papr_sum"])
                papr_count += int(st["papr_count"])
            power_allocation, water_level = params[p]
            r = self._results(
                snr,
                totals,
                papr_peak,
                papr_sum,
                papr_count,
                elapsed / npts,
                power_allocation,
                water_level,
                samples[p],
                hotpath_used,
                matmul_passes_used,
            )
            r["grid_points"] = npts
            # Grid capture is the per-point XLA replay: bitwise on the XLA
            # hot path (same chunk_body + keys), representative on Pallas.
            r["received_symbols_exact"] = (
                (hotpath_used != "pallas") if collect_symbols > 0 else None
            )
            out.append(r)
        return out


def run_grid_multi(
    runners: Sequence["LinkRunner"],
    key: jax.Array,
    snrs: Sequence[float],
    collect_symbols: int = 0,
    key_offset: int = 0,
) -> Optional[List[Dict[str, Any]]]:
    """One dispatch for a sweep whose points need DIFFERENT kernel consts.

    Adaptive (CAPACITY_BASED) bit loading is SNR-dependent, so each sweep
    point has its own prepared runner with its own order/equalizer constant
    rows.  When every point lands on the same kernel spec and chunk plan,
    one executable can still run the whole sweep in a single dispatch: the
    per-point consts pytrees stack into scan inputs (`_grid_scan_multi`).
    Point ``p`` is bit-identical to
    ``runners[p].run(fold_in(key, key_offset+p))``.

    Points are PARTITIONED by (chunk plan, kernel spec): each group of
    spec-compatible points runs as one grid dispatch, and leftover points
    (a different word width at the high-SNR tail, or off the lifted
    fused-kernel path) run individually — an adaptive sweep whose bit
    loading crosses a kernel word-width boundary still collapses to a few
    dispatches instead of one per point.
    """
    npts = len(runners)
    if npts != len(snrs):
        raise ValueError("one runner per SNR point required")
    if npts == 0:
        return []

    groups: Dict[Any, List[int]] = {}
    lifts: List[Any] = []
    plans: List[Any] = []
    for p, r in enumerate(runners):
        plan = r._chunk_plan()
        plans.append(plan)
        lift = (
            r._grid_multi_lift(plan[0])
            if plan[3] == "pallas" and plan[1] > 0
            else None
        )
        lifts.append(lift)
        gk = (plan, lift[2]) if lift is not None else None
        groups.setdefault(gk, []).append(p)

    out: List[Optional[Dict[str, Any]]] = [None] * npts
    for gk, idxs in groups.items():
        if gk is None or len(idxs) == 1:
            for p in idxs:
                res = runners[p].run(
                    jax.random.fold_in(key, key_offset + p),
                    collect_symbols=collect_symbols,
                )
                out[p] = res
            continue
        chunk, num_full, rem, hotpath_used, matmul_passes_used = plans[idxs[0]]
        r0 = runners[idxs[0]]
        fns = [lifts[p][0] for p in idxs]
        consts_list = [lifts[p][1] for p in idxs]
        spec = lifts[idxs[0]][2]
        grid = r0._grid_scan_multi(
            len(idxs), num_full, spec, fns[0], consts_list[0]
        )
        consts_stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *consts_list)
        point_ids = jnp.asarray(
            [key_offset + p for p in idxs], dtype=jnp.uint32
        )
        snr_arr = jnp.asarray([float(snrs[p]) for p in idxs], jnp.float32)
        params = [runners[p].point_params(float(snrs[p])) for p in idxs]
        sqrt_powers = jnp.asarray(
            np.stack([np.sqrt(pa) for pa, _ in params]), jnp.float32
        )

        samples: List[Any] = [None] * len(idxs)
        if collect_symbols > 0:
            for gi, p in enumerate(idxs):
                r = runners[p]
                pkey = jax.random.fold_in(key, key_offset + p)
                step0 = r._step(min(chunk, r.setup.num_ofdm_symbols), True)
                stats0, _ = step0(
                    jax.random.fold_in(pkey, 0),
                    r._init_carry(),
                    jnp.float32(float(snrs[p])),
                    sqrt_powers[gi],
                )
                samples[gi] = cplx.to_numpy(stats0["received_symbols"])[
                    :collect_symbols
                ]

        t0 = time.perf_counter()
        accs, carries = grid(
            key, r0._init_carry(), point_ids, snr_arr, sqrt_powers, consts_stacked
        )
        accs = jax.tree.map(np.asarray, accs)
        rem_stats = []
        if rem > 0:
            for gi, p in enumerate(idxs):
                r = runners[p]
                pkey = jax.random.fold_in(key, key_offset + p)
                step = r._step(rem, False)
                st, _ = step(
                    jax.random.fold_in(pkey, num_full),
                    jax.tree.map(lambda a, gi=gi: a[gi], carries),
                    jnp.float32(float(snrs[p])),
                    sqrt_powers[gi],
                )
                rem_stats.append(st)
        elapsed = time.perf_counter() - t0

        for gi, p in enumerate(idxs):
            r = runners[p]
            be, se, papr_peak, papr_sum, papr_count = _acc_totals(accs, gi)
            totals = {"bit_errors": be, "symbol_errors": se}
            if rem > 0:
                st = rem_stats[gi]
                totals["bit_errors"] += int(st["bit_errors"])
                totals["symbol_errors"] += int(st["symbol_errors"])
                papr_peak = max(papr_peak, float(st["papr_peak"]))
                papr_sum += float(st["papr_sum"])
                papr_count += int(st["papr_count"])
            power_allocation, water_level = params[gi]
            res = r._results(
                float(snrs[p]),
                totals,
                papr_peak,
                papr_sum,
                papr_count,
                elapsed / len(idxs),
                power_allocation,
                water_level,
                samples[gi],
                hotpath_used,
                matmul_passes_used,
            )
            res["grid_points"] = len(idxs)
            # Same replay-capture semantics as run_grid's (see there).
            res["received_symbols_exact"] = (
                (hotpath_used != "pallas") if collect_symbols > 0 else None
            )
            out[p] = res
    return out


def simulate(
    cfg: SimulationConfig,
    key: Optional[jax.Array] = None,
    channel_ir: Optional[NDArray[np.complex128]] = None,
    collect_symbols: int = 0,
    render_constellation: bool = False,
) -> Dict[str, Any]:
    """One-call convenience: prepare + run."""
    if key is None:
        key = jax.random.PRNGKey(0)
    setup = prepare(cfg, channel_ir)
    return LinkRunner(setup).run(
        key,
        collect_symbols=collect_symbols,
        render_constellation=render_constellation,
    )
