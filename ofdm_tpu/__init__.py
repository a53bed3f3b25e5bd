"""ofdm_tpu — a TPU-native OFDM / SC-FDE link-level simulation framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of the reference
simulator ``JomarJunior/ofdm-based-systems`` (see SURVEY.md): the full
TX -> channel -> RX chain (bit source, QAM/PSK Gray mapping, IFFT/FFT with
cyclic/zero prefix, multipath convolution + AWGN, ZF/MMSE per-subcarrier
equalization, demapping, BER/SER/PAPR metrics), plus waterfilling power
allocation, gap-function adaptive bit loading, and Monte-Carlo SNR sweeps
sharded over a TPU device mesh.

Design stance (not a port):
  * pure, shape-static, batched functions over ``(num_ofdm_symbols, n_sc)``
    complex arrays — `jit`/`vmap`/`shard_map` friendly;
  * strategy selection happens at *trace time* from a frozen config
    (enums branch before jit, never inside);
  * bits are integer arrays, PRNG is `jax.random` keys threaded explicitly;
  * Monte-Carlo axes shard over a `jax.sharding.Mesh`; error counters reduce
    with `psum`.
"""

from ofdm_tpu.config import (
    AdaptiveModulationMode,
    ChannelType,
    ConstellationType,
    EqualizationMethod,
    ModulationType,
    NoiseType,
    PowerAllocationType,
    PrefixType,
    Settings,
    SimulationConfig,
)

__version__ = "0.1.0"

__all__ = [
    "AdaptiveModulationMode",
    "ChannelType",
    "ConstellationType",
    "EqualizationMethod",
    "ModulationType",
    "NoiseType",
    "PowerAllocationType",
    "PrefixType",
    "Settings",
    "SimulationConfig",
    "__version__",
]
