"""Custom channel models: built-ins, .npy files, and your own taps.

Equivalent of the reference's examples/custom_channel_demo.py +
CUSTOM_CHANNELS.md: load channels three ways and compare BER across them.
"""

# Allow running straight from a source checkout (no install needed).
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import jax
import numpy as np

from ofdm_tpu.config import ChannelType, EqualizationMethod, SimulationConfig
from ofdm_tpu.models import channels as chm
from ofdm_tpu.pipeline import simulate


def main() -> None:
    base = SimulationConfig(
        num_symbols=64 * 1000,
        num_subcarriers=64,
        constellation_order=16,
        channel_type=ChannelType.CUSTOM,
        equalization_method=EqualizationMethod.MMSE,
        snr_db=20.0,
    )

    print("Built-in channel models:", chm.list_channels())

    # 1. Built-in by name.
    for name in ("flat_fading", "two_ray", "severe_multipath"):
        r = simulate(base.replace(channel_model=name), jax.random.PRNGKey(0))
        print(f"  {name:20s}: BER {r['bit_error_rate']:.5f}")

    # 2. From a .npy file (reference CUSTOM-channel path semantics).
    r = simulate(
        base.replace(channel_model="config/channel_models/Lin-Phoong_P2.npy"),
        jax.random.PRNGKey(0),
    )
    print(f"  {'Lin-Phoong_P2.npy':20s}: BER {r['bit_error_rate']:.5f}")

    # 3. Your own impulse response, passed directly.
    my_channel = np.array([1.0 + 0.0j, 0.4 - 0.2j, 0.1 + 0.1j])
    r = simulate(base, jax.random.PRNGKey(0), channel_ir=my_channel)
    print(f"  {'custom 3-tap':20s}: BER {r['bit_error_rate']:.5f}")


if __name__ == "__main__":
    main()
