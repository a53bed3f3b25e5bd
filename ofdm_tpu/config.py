"""Configuration layer: strategy enums + frozen, hashable simulation config.

Mirrors the semantics of the reference configuration system
(`configuration/enums.py:4-67`, `configuration/models.py:19-151` in the
reference repo) but is built for JAX: configs are immutable dataclasses that
hash by value, so a `SimulationConfig` can be passed as a *static* argument to
`jax.jit` and all strategy branching happens at trace time.

Validation rules replicate the reference pydantic validators:
  * exactly one of ``num_bits`` / ``num_symbols`` (models.py:119-126)
  * ``prefix_length_ratio`` in [0, 2]                (models.py:128-133)
  * min/max constellation order: power of two in [2, 4096] (models.py:135-142)
  * ``desired_symbol_error_rate`` in (0, 0.5)        (models.py:144-151)
"""

from __future__ import annotations

import dataclasses
import json
import os
from enum import Enum
from typing import Optional, Tuple


class ConstellationType(str, Enum):
    QAM = "QAM"
    PSK = "PSK"

    def __str__(self) -> str:  # pragma: no cover - cosmetic
        return self.value


class PrefixType(str, Enum):
    CYCLIC = "CYCLIC"
    ZERO = "ZERO"
    NONE = "NONE"

    def __str__(self) -> str:  # pragma: no cover - cosmetic
        return self.value


class EqualizationMethod(str, Enum):
    ZF = "ZF"
    MMSE = "MMSE"
    NONE = "NONE"

    def __str__(self) -> str:  # pragma: no cover - cosmetic
        return self.value


class ModulationType(str, Enum):
    OFDM = "OFDM"
    SC_OFDM = "SC-OFDM"

    def __str__(self) -> str:  # pragma: no cover - cosmetic
        return self.value


class ChannelType(str, Enum):
    FLAT = "FLAT"
    CUSTOM = "CUSTOM"

    def __str__(self) -> str:  # pragma: no cover - cosmetic
        return self.value


class NoiseType(str, Enum):
    AWGN = "AWGN"
    NONE = "NONE"

    def __str__(self) -> str:  # pragma: no cover - cosmetic
        return self.value


class PowerAllocationType(str, Enum):
    UNIFORM = "UNIFORM"
    WATERFILLING = "WATERFILLING"

    def __str__(self) -> str:  # pragma: no cover - cosmetic
        return self.value


class AdaptiveModulationMode(str, Enum):
    FIXED = "FIXED"
    CAPACITY_BASED = "CAPACITY_BASED"

    def __str__(self) -> str:  # pragma: no cover - cosmetic
        return self.value


def _is_power_of_two(v: int) -> bool:
    return v >= 1 and (v & (v - 1)) == 0


def _load_json(file_path: str) -> dict:
    if not os.path.exists(file_path):
        raise FileNotFoundError(f"Configuration file not found: {file_path}")
    with open(file_path, "r", encoding="utf-8") as fh:
        return json.load(fh)


@dataclasses.dataclass(frozen=True)
class Settings:
    """Project-level settings (reference `Settings`, configuration/models.py:31-39)."""

    project_name: str
    version: str
    debug: bool = False

    @classmethod
    def from_json(cls, file_path: str) -> "Settings":
        data = _load_json(file_path)
        known = {f.name for f in dataclasses.fields(cls)}
        return cls(**{k: v for k, v in data.items() if k in known})

    def __str__(self) -> str:
        return f"{self.project_name}\n{self.version}\nDebug Mode: {self.debug}"


@dataclasses.dataclass(frozen=True)
class SimulationConfig:
    """One fully-specified simulation (all strategy axes + sizes).

    Frozen + hashable so it can be a `jax.jit` static argument.  Field names
    and defaults follow the reference `SimulationSettings`
    (configuration/models.py:42-151) with the reference's JSON key names kept
    in :meth:`from_json` for drop-in config-file compatibility.
    """

    # --- sizes -----------------------------------------------------------
    num_subcarriers: int = 64
    num_bits: Optional[int] = None
    num_symbols: Optional[int] = None

    # --- strategy axes ---------------------------------------------------
    constellation_order: int = 16
    constellation_type: ConstellationType = ConstellationType.QAM
    modulation_type: ModulationType = ModulationType.OFDM
    prefix_type: PrefixType = PrefixType.CYCLIC
    prefix_length_ratio: float = 1.0
    equalization_method: EqualizationMethod = EqualizationMethod.MMSE
    noise_type: NoiseType = NoiseType.AWGN
    power_allocation_type: PowerAllocationType = PowerAllocationType.UNIFORM
    adaptive_modulation_mode: AdaptiveModulationMode = AdaptiveModulationMode.FIXED

    # --- adaptive-modulation knobs ----------------------------------------
    min_constellation_order: int = 4
    max_constellation_order: int = 256
    desired_symbol_error_rate: float = 1e-3

    # --- channel -----------------------------------------------------------
    channel_type: ChannelType = ChannelType.FLAT
    # Name of a built-in channel model (ofdm_tpu.models.channels) or a path to
    # a `.npy` complex impulse response; None -> reference's hardcoded 4-tap
    # default multipath (simulation/models.py:237-245).
    channel_model: Optional[str] = None

    # --- link-level SNR (one point; sweeps carry a grid of configs) --------
    snr_db: float = 20.0

    # --- TPU execution knobs (no reference analog) --------------------------
    # Complex dtype for the hot path; "complex64" is the TPU-native choice.
    dtype: str = "complex64"
    # Execution engine: "planar" runs the f32 planar-complex path (MXU DFT
    # matmuls, gather-free mapping — required on TPU backends without native
    # complex/FFT support and fastest there); "complex" uses native complex
    # dtypes + jnp.fft (CPU/GPU, exact reference-parity testing); "auto"
    # picks planar on TPU, complex elsewhere.
    engine: str = "auto"
    # Number of OFDM symbols processed per lax.scan step; the driver picks
    # ceil(num_ofdm_symbols / chunk) steps.  0 = single chunk (exact
    # reference stream semantics for AWGN power measurement).
    symbols_per_chunk: int = 0
    # Apply sqrt(power_allocation) at TX (the reference computes but does NOT
    # apply it in the main path — simulation/models.py:508; its experiment
    # scripts DO apply it).  Exposed as a switch per SURVEY §7.3.
    apply_power_allocation: bool = False
    # Normalize demodulated symbols to unit average power before demapping
    # (commented out in the reference main path, simulation/models.py:574-586,
    # enabled in experiment scripts / NORMALIZATION_FIX.md).
    normalize_before_demap: bool = False
    # Hot-path selection.  "auto": fused Pallas kernel where it fits the
    # scoped-VMEM plan (narrow links, pallas_link._plan), else the XLA
    # matmul/CT-DFT chunk — measured fastest per width on the target TPU.
    # "pallas": force the kernel, including the tap-shift wide-link mode
    # (slower than the XLA matmul path at 1024 sc: 117.6M vs 2.12G QAM/s,
    # but a single kernel).  "matmul": XLA matmul-form operators.
    # Anything else: generic planar chunk.  (A "batchminor" (time, batch)
    # layout experiment was pruned in round 4 — measured slower, numbers in
    # docs/PERFORMANCE.md, code in git history.)
    hotpath: str = "auto"
    # bf16 split passes per MXU matmul in the fused Pallas kernel.  3 =
    # bf16x3 split (~1e-5 relative error, matches f32); 1 = single bf16 pass
    # (~6e-3 — measured +0.6% relative BER shift on 64-QAM @30 dB, well
    # inside Monte-Carlo noise, and ~1.3x faster end to end).  "auto" picks
    # 1 when the constellation's decision half-distance is >= 0.07 (QAM
    # order <= 256, PSK order <= 32) so the bf16 perturbation stays an
    # order of magnitude below the slicing threshold, else 3.
    matmul_passes: object = "auto"
    # PAPR sampling stride for the diag-mode fused kernel.  In diag mode
    # (ISI-free CP links) the time-domain TX plane feeds ONLY the PAPR
    # statistic — noise power is measured on the frequency plane (Parseval)
    # and the BER chain is elementwise — so the kernel computes it on every
    # S-th grid tile: PAPR becomes a strided-sample estimator over >= one
    # tile (thousands of OFDM symbols on real runs; small runs have one
    # tile and stay exact), while wide (1024-sc) links drop their dominant
    # MXU cost.  0 = auto (32 in diag mode); 1 = exact (every tile); must
    # be a power of two.  `results["papr_sample_fraction"]` records the
    # realized fraction; bit/symbol-error counts are stride-invariant.
    papr_stride: int = 0

    # Fields declared as str-Enums accept plain strings ("WATERFILLING") for
    # ergonomic direct construction; __post_init__ coerces them so downstream
    # `.name` / identity checks always see the enum member.
    _ENUM_FIELDS = {
        "constellation_type": ConstellationType,
        "modulation_type": ModulationType,
        "prefix_type": PrefixType,
        "equalization_method": EqualizationMethod,
        "noise_type": NoiseType,
        "power_allocation_type": PowerAllocationType,
        "adaptive_modulation_mode": AdaptiveModulationMode,
        "channel_type": ChannelType,
    }

    def __post_init__(self) -> None:
        for fname, enum_cls in self._ENUM_FIELDS.items():
            v = getattr(self, fname)
            if not isinstance(v, enum_cls):
                try:
                    member = enum_cls(v)  # by value ("SC-OFDM")
                except ValueError:
                    try:
                        member = enum_cls[v]  # by name ("SC_OFDM")
                    except KeyError:
                        raise ValueError(
                            f"{fname}={v!r} is not one of "
                            f"{[m.value for m in enum_cls]}"
                        ) from None
                object.__setattr__(self, fname, member)
        if self.matmul_passes not in ("auto", 1, 3):
            raise ValueError("matmul_passes must be 'auto', 1 or 3.")
        if self.num_bits is None and self.num_symbols is None:
            raise ValueError("Either num_bits or num_symbols must be specified.")
        if self.num_bits is not None and self.num_symbols is not None:
            raise ValueError("Only one of num_bits or num_symbols should be specified.")
        if not 0.0 <= self.prefix_length_ratio <= 2.0:
            raise ValueError("prefix_length_ratio must be between 0 and 2 (inclusive).")
        for v in (self.min_constellation_order, self.max_constellation_order):
            if v < 2 or v > 4096:
                raise ValueError("Constellation order must be between 2 and 4096.")
            if not _is_power_of_two(v):
                raise ValueError(f"Constellation order must be a power of 2, got {v}.")
        if not 0.0 < self.desired_symbol_error_rate < 0.5:
            raise ValueError("desired_symbol_error_rate must be in (0, 0.5).")
        if self.num_subcarriers <= 0:
            raise ValueError("num_subcarriers must be positive.")
        if not _is_power_of_two(self.constellation_order):
            raise ValueError("constellation_order must be a power of 2.")
        if self.papr_stride < 0 or (
            self.papr_stride > 1 and not _is_power_of_two(self.papr_stride)
        ):
            raise ValueError("papr_stride must be 0 (auto) or a power of 2.")

    # -- reference-compatible JSON loading ---------------------------------
    @classmethod
    def from_json(cls, file_path: str) -> Tuple["SimulationConfig", ...]:
        """Load a reference-format JSON settings file.

        The reference fans one settings file out into one `Simulation` per SNR
        value (simulation/models.py:190-212); we return a tuple of configs,
        one per entry of ``signal_noise_ratios``.
        """
        data = _load_json(file_path)
        return cls.from_reference_dict(data)

    @classmethod
    def from_reference_dict(cls, data: dict) -> Tuple["SimulationConfig", ...]:
        snrs = data.get("signal_noise_ratios", [data.get("snr_db", 20.0)])
        channel_type = ChannelType(data.get("channel_type", "FLAT"))
        channel_model = data.get("channel_model_path") or None
        common = dict(
            num_subcarriers=data.get("num_bands", 64),
            num_bits=data.get("num_bits"),
            num_symbols=data.get("num_symbols"),
            constellation_order=data.get("constellation_order", 16),
            constellation_type=ConstellationType(data.get("constellation_type", "PSK")),
            modulation_type=ModulationType(data.get("modulation_type", "OFDM")),
            prefix_type=PrefixType(data.get("prefix_type", "CYCLIC")),
            prefix_length_ratio=data.get("prefix_length_ratio", 0.25),
            equalization_method=EqualizationMethod(data.get("equalization_method", "MMSE")),
            noise_type=NoiseType(data.get("noise_type", "AWGN")),
            power_allocation_type=PowerAllocationType(
                data.get("power_allocation_type", "UNIFORM")
            ),
            adaptive_modulation_mode=AdaptiveModulationMode(
                data.get("adaptive_modulation_mode", "FIXED")
            ),
            min_constellation_order=data.get("min_constellation_order", 4),
            max_constellation_order=data.get("max_constellation_order", 256),
            desired_symbol_error_rate=data.get("desired_symbol_error_rate", 1e-3),
            channel_type=channel_type,
            channel_model=channel_model if channel_type == ChannelType.CUSTOM else None,
        )
        return tuple(cls(snr_db=float(snr), **common) for snr in snrs)

    # -- convenience -------------------------------------------------------
    @property
    def bits_per_symbol(self) -> int:
        return self.constellation_order.bit_length() - 1

    def replace(self, **kw) -> "SimulationConfig":
        return dataclasses.replace(self, **kw)

    @property
    def title(self) -> str:
        """Reference plot title (simulation/models.py:435-438)."""
        acr = {PrefixType.CYCLIC: "CP", PrefixType.ZERO: "ZP", PrefixType.NONE: ""}[
            self.prefix_type
        ]
        return f"{acr}-{self.modulation_type.name}-{self.equalization_method.name}"

    @property
    def subtitle(self) -> str:
        """Reference plot subtitle (simulation/models.py:439-442)."""
        return (
            f"{self.constellation_order}{self.constellation_type.name}-"
            f"SNR{self.snr_db}dB-{self.power_allocation_type.name}"
        )
