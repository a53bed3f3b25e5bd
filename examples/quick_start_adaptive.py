"""Quick start: adaptive modulation in a few lines.

Equivalent of the reference's examples/quick_start_adaptive.py: run one
CAPACITY_BASED point with waterfilling and print the per-subcarrier orders.
"""

# Allow running straight from a source checkout (no install needed).
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import jax

from ofdm_tpu.config import (
    AdaptiveModulationMode,
    ChannelType,
    EqualizationMethod,
    PowerAllocationType,
    SimulationConfig,
)
from ofdm_tpu.pipeline import prepare, LinkRunner


def main() -> None:
    cfg = SimulationConfig(
        num_bits=500_000,
        num_subcarriers=64,
        channel_type=ChannelType.CUSTOM,
        channel_model="Lin-Phoong_P1",
        equalization_method=EqualizationMethod.MMSE,
        power_allocation_type=PowerAllocationType.WATERFILLING,
        adaptive_modulation_mode=AdaptiveModulationMode.CAPACITY_BASED,
        desired_symbol_error_rate=1e-3,
        snr_db=20.0,
    )
    setup = prepare(cfg)
    print("Constellation orders per subcarrier:")
    print(setup.constellation_orders)
    print(f"Water level: {setup.water_level:.6f}")
    print(f"Bits per OFDM symbol: {setup.bits_per_ofdm_symbol}")

    result = LinkRunner(setup).run(jax.random.PRNGKey(0))
    print(f"BER: {result['bit_error_rate']:.6f}")
    print(f"SER: {result['symbol_error_rate']:.6f}")
    print(f"Throughput: {result['ofdm_symbols_per_s']:,.0f} OFDM symbols/s")


if __name__ == "__main__":
    main()
