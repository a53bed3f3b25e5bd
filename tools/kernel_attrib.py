"""Kernel block attribution: marginal ns/sym per ablated block, on hardware.

Profiling tool (SURVEY §5 tracing): re-runs the headline (or wide) config
with each `OFDM_TPU_KERNEL_ABLATE` knob and reports run-size-differenced
marginal rates, which cancel the fixed relay-dispatch latency.  Ablated
kernels produce WRONG statistics by design — the spec carries the ablate
string, so ablated executables never alias real ones
(ofdm_tpu/ops/pallas_link._Spec.ablate).

Knobs: "" (base), notx (diag only), nopapr, nodemap, nored, noacc — plus
noise_type=NONE for the AWGN chain (a plain config axis).

Usage (each knob recompiles; minutes per knob on a remote-compile relay):

    python tools/kernel_attrib.py [--wide] [--knobs base,nored,...]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def build_runner(wide: bool, k: int, noise: str):
    from ofdm_tpu.config import SimulationConfig
    from ofdm_tpu.pipeline import LinkRunner, prepare

    n = 1024 if wide else 64
    cfg = SimulationConfig(
        num_symbols=n * (1 << k),
        num_subcarriers=n,
        constellation_order=16 if wide else 64,
        channel_type="CUSTOM",
        channel_model="severe_multipath" if wide else "Lin-Phoong_P2",
        prefix_type="CYCLIC",
        prefix_length_ratio=1.0,
        equalization_method="MMSE",
        noise_type=noise,
        snr_db=30.0,
        symbols_per_chunk=1 << (14 if wide else 17),
    )
    return LinkRunner(prepare(cfg))


def marginal_ns(wide: bool, k_small: int, k_big: int, noise: str, reps: int = 6):
    import jax

    walls = {}
    for k in (k_small, k_big):
        runner = build_runner(wide, k, noise)
        key = jax.random.PRNGKey(0)
        runner.run(key, snr_db=25.0)  # compile warmup
        best = None
        for rep in range(reps):
            t0 = time.perf_counter()
            runner.run(jax.random.fold_in(key, rep), snr_db=30.0)
            w = time.perf_counter() - t0
            best = w if best is None else min(best, w)
        walls[k] = best
    return (walls[k_big] - walls[k_small]) / ((1 << k_big) - (1 << k_small)) * 1e9


def main() -> int:
    parser = argparse.ArgumentParser()
    parser.add_argument("--wide", action="store_true", help="1024-sc link")
    parser.add_argument(
        "--knobs", default="base,nonoise,nored,nodemap,notx,nopapr"
    )
    args = parser.parse_args()
    ks = (21, 24) if args.wide else (24, 28)

    for knob in args.knobs.split(","):
        noise = "NONE" if knob == "nonoise" else "AWGN"
        os.environ["OFDM_TPU_KERNEL_ABLATE"] = (
            "" if knob in ("base", "nonoise") else knob
        )
        # pallas_link reads the env var at spec-build time; each knob needs
        # fresh runners (the env var is part of the spec, so the executable
        # cache keys correctly).
        ns = marginal_ns(args.wide, *ks, noise=noise)
        print(
            f"{knob:8s}: {ns:7.3f} ns/sym ({1e3 / ns:8.1f}M syms/s)",
            flush=True,
        )
    return 0


if __name__ == "__main__":
    sys.exit(main())
