"""Water-filling robustness experiment with colored noise bumps.

Reproduction of the reference's examples/waterfilling_noise_bump_experiment.py
(BASELINE configs[3]); the TPU-native core lives in
ofdm_tpu/experiments/noise_bump.py.  Outputs BER curves, per-SNR constellation
diagrams, and CSV summaries in the reference's layout.
"""

# Allow running straight from a source checkout (no install needed).
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

from ofdm_tpu.experiments import run_noise_bump_experiment


def main() -> None:
    results = run_noise_bump_experiment()
    print("\nBER summary (SNR 0..30 dB):")
    for name, bers in results.items():
        print(f"  {name}: " + " ".join(f"{b:.3e}" for b in bers))


if __name__ == "__main__":
    main()
