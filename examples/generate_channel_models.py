"""Export the built-in channel impulse responses as .npy assets.

Equivalent of the reference's examples/generate_channel_models.py:11-143
(same channel values; see ofdm_tpu/models/channels.py).
"""

# Allow running straight from a source checkout (no install needed).
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

from ofdm_tpu.models import channels as chm


def main() -> None:
    chm.export_channel_models("config/channel_models")
    print("Generated channel impulse response models:")
    for name in chm.list_channels():
        h = chm.get_channel(name)
        print(f"  config/channel_models/{name}.npy — {len(h)} taps")


if __name__ == "__main__":
    main()
