"""FIXED vs CAPACITY_BASED adaptive modulation comparison.

Equivalent of the reference's examples/adaptive_modulation_demo.py: run the
same channel/SNR grid in both modes and compare BER and spectral efficiency.
"""

# Allow running straight from a source checkout (no install needed).
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import jax
import numpy as np

from ofdm_tpu.config import (
    AdaptiveModulationMode,
    ChannelType,
    EqualizationMethod,
    PowerAllocationType,
    SimulationConfig,
)
from ofdm_tpu.parallel import run_sweep


def main() -> None:
    snrs = [10.0, 15.0, 20.0, 25.0]
    base = SimulationConfig(
        num_symbols=64 * 2000,  # FIXED: QAM symbols (reference quirk)
        num_subcarriers=64,
        constellation_order=16,
        channel_type=ChannelType.CUSTOM,
        channel_model="Lin-Phoong_P1",
        equalization_method=EqualizationMethod.MMSE,
        power_allocation_type=PowerAllocationType.WATERFILLING,
        snr_db=20.0,
    )

    print("--- FIXED 16-QAM ---")
    fixed = run_sweep(base, snrs=snrs, sharded=False, key=jax.random.PRNGKey(0))
    for r in fixed:
        print(f"  SNR {r['snr_db']:5.1f} dB: BER {r['bit_error_rate']:.5f} "
              f"(4.0 bits/subcarrier)")

    print("--- CAPACITY_BASED (gap-function bit loading) ---")
    adaptive = run_sweep(
        base.replace(
            num_symbols=2000,  # adaptive: OFDM symbols (reference quirk)
            adaptive_modulation_mode=AdaptiveModulationMode.CAPACITY_BASED,
        ),
        snrs=snrs,
        sharded=False,
        key=jax.random.PRNGKey(0),
    )
    for r in adaptive:
        orders = np.asarray(r["constellation_order_per_subcarrier"])
        bits = np.where(orders > 0, np.log2(np.maximum(orders, 1)), 0)
        print(f"  SNR {r['snr_db']:5.1f} dB: BER {r['bit_error_rate']:.5f} "
              f"({bits.mean():.1f} bits/subcarrier, "
              f"{int((orders > 0).sum())}/{len(orders)} active)")


if __name__ == "__main__":
    main()
