"""Render the adaptive constellation diagram colored by order.

Equivalent of the reference's examples/plot_adaptive_constellation_demo.py.
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
from ofdm_tpu.utils import plot_adaptive_constellation_diagram


def main() -> None:
    cfg = SimulationConfig(
        num_symbols=2000,
        num_subcarriers=64,
        channel_type=ChannelType.CUSTOM,
        channel_model="severe_multipath",
        equalization_method=EqualizationMethod.MMSE,
        power_allocation_type=PowerAllocationType.WATERFILLING,
        adaptive_modulation_mode=AdaptiveModulationMode.CAPACITY_BASED,
        snr_db=22.0,
    )
    setup = prepare(cfg)
    r = LinkRunner(setup).run(jax.random.PRNGKey(0), collect_symbols=32768)
    fig = plot_adaptive_constellation_diagram(
        r["received_symbols"],
        setup.constellation_orders,
        setup.amap.name,
        cfg.num_subcarriers,
        r["bit_error_rate"],
        r["symbol_error_rate"],
        r["snr_db"],
        r["papr_db"],
    )
    fig.savefig("adaptive_constellation.png", dpi=150)
    print(f"BER {r['bit_error_rate']:.5f}; saved adaptive_constellation.png")


if __name__ == "__main__":
    main()
