"""Drive simulations from reference-format JSON settings files.

Equivalent of the reference's examples/configurable_simulation_demo.py: load
a settings JSON, fan out one simulation per SNR, print the curve.
"""

# Allow running straight from a source checkout (no install needed).
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import jax

from ofdm_tpu.config import SimulationConfig
from ofdm_tpu.parallel import run_sweep


def main() -> None:
    configs = SimulationConfig.from_json("config/simulation_settings_waterfilling.json")
    base = configs[0].replace(num_symbols=64 * 1000)  # shrink for the demo
    snrs = [c.snr_db for c in configs]
    print(f"Loaded {len(configs)} simulation points: SNRs {snrs}")

    results = run_sweep(base, snrs=snrs, sharded=False, key=jax.random.PRNGKey(0))
    for r in results:
        print(
            f"  SNR {r['snr_db']:5.1f} dB -> BER {r['bit_error_rate']:.6f}, "
            f"PAPR {r['papr_db']:.2f} dB, water level "
            f"{r['water_level']:.4f}" if r["water_level"] else
            f"  SNR {r['snr_db']:5.1f} dB -> BER {r['bit_error_rate']:.6f}"
        )


if __name__ == "__main__":
    main()
