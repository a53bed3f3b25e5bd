"""Channel impulse-response time/frequency plot tool.

Port of the reference's ``utils/channel-plots.py`` (:1-29): normalize an
impulse response and plot its time response and N-point frequency-response
magnitude, stacked.  Generalized from the reference's hardcoded example
taps to any built-in channel model name or ``.npy`` path (host-side offline
tooling — matplotlib + numpy, nothing device-resident).

Usage:
    python -m ofdm_tpu.utils.channel_plots [channel] [--n 512] [--out FILE]
"""

from __future__ import annotations

import argparse
from typing import Optional

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt  # noqa: E402
import numpy as np  # noqa: E402
from numpy.typing import NDArray  # noqa: E402


def plot_channel_response(
    h: NDArray[np.complex128], n: int = 512, title_prefix: str = ""
):
    """Two-panel figure: time response and N-point |H(e^jw)| (ref :12-28)."""
    h = np.asarray(h, dtype=np.complex128)
    h = h / np.linalg.norm(h)  # normalize, as the reference does (:9)
    H = np.fft.fft(h, n)
    freq = np.linspace(0, 2 * np.pi, n)

    fig = plt.figure()
    ax1 = plt.subplot(2, 1, 1)
    if np.allclose(h.imag, 0):
        ax1.plot(h.real)
    else:
        ax1.plot(h.real, label="Re")
        ax1.plot(h.imag, label="Im")
        ax1.legend()
    ax1.set_title(f"{title_prefix}Time Response".strip())
    ax1.set_xlabel("Sample")
    ax1.set_ylabel("Amplitude")

    ax2 = plt.subplot(2, 1, 2)
    ax2.plot(freq, np.abs(H))
    ax2.set_title("Frequency Response")
    ax2.set_xlabel("Frequency (radians)")
    ax2.set_ylabel("Magnitude")

    fig.tight_layout()
    return fig


def main(argv: Optional[list] = None) -> int:
    from ofdm_tpu.models import channels as chm

    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument(
        "channel",
        nargs="?",
        default=None,
        help="built-in channel name or .npy path; default = the reference "
        "script's example taps [0.5, 0, 0, 0.3, 0.1]",
    )
    p.add_argument("--n", type=int, default=512, help="FFT length (default 512)")
    p.add_argument("--out", default="channel_response.png")
    args = p.parse_args(argv)

    if args.channel is None:
        h = np.array([0.5, 0, 0, 0.3, 0.1], dtype=np.complex128)  # ref :7
        prefix = ""
    else:
        h = chm.get_channel(args.channel)
        prefix = f"{args.channel}: "

    fig = plot_channel_response(h, n=args.n, title_prefix=prefix)
    fig.savefig(args.out)
    plt.close(fig)
    print(f"wrote {args.out}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
