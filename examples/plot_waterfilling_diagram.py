"""Render the waterfilling water-level diagram for a channel.

Equivalent of the reference's examples/plot_waterfilling_diagram.py.
"""

# Allow running straight from a source checkout (no install needed).
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

from ofdm_tpu.models import channels as chm
from ofdm_tpu.ops import allocate as al
from ofdm_tpu.utils import plot_water_level_diagram


def main() -> None:
    n, snr_db = 64, 15.0
    noise_power = 10 ** (-snr_db / 10)
    gains = chm.channel_gains(chm.get_channel("severe_multipath"), n)
    power = al.waterfilling(float(n), gains, noise_power)
    mu = al.water_level(power, gains, noise_power)
    fig = plot_water_level_diagram(
        power, gains, noise_power, water_level=mu,
        title=f"Waterfilling over severe_multipath @ {snr_db:.0f} dB",
    )
    fig.savefig("waterfilling_diagram.png", dpi=150)
    print(f"Water level mu = {mu:.6f}; saved waterfilling_diagram.png")


if __name__ == "__main__":
    main()
