"""Probe: does a larger grid tile speed the lr kernel at giant widths?

The lr plan inherits the dense-chain activation estimate (_ACT_ROWS_MM=14),
which caps the grid tile at 256 rows for 4096-subcarrier links (59 ps/bin
measured vs 42.6 at 2048/tile=512).  This probe monkeypatches the scoped
budget to admit tile=512 at 4096 sc and measures marginal rates both ways.

    python tools/lr_tile_probe.py [--act-rows 10] [--scoped 96000000]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def build(n, k, symbols_per_chunk):
    from ofdm_tpu.config import SimulationConfig
    from ofdm_tpu.pipeline import LinkRunner, prepare

    cfg = SimulationConfig(
        num_symbols=1 << k,
        num_subcarriers=n,
        constellation_order=64,
        channel_type="CUSTOM",
        channel_model="severe_multipath",
        prefix_type="ZERO",
        prefix_length_ratio=1.0,
        equalization_method="MMSE",
        snr_db=30.0,
        symbols_per_chunk=symbols_per_chunk,
    )
    return LinkRunner(prepare(cfg))


def marginal(n, k_small, k_big, spc, reps=5):
    import jax

    walls = {}
    bers = {}
    for k in (k_small, k_big):
        runner = build(n, k, spc)
        key = jax.random.PRNGKey(0)
        t0 = time.perf_counter()
        r = runner.run(key, snr_db=30.0)
        compile_wall = time.perf_counter() - t0
        bers[k] = float(r["bit_error_rate"])
        best = None
        for rep in range(reps):
            t0 = time.perf_counter()
            runner.run(jax.random.fold_in(key, rep + 1), snr_db=30.0)
            w = time.perf_counter() - t0
            best = w if best is None else min(best, w)
        walls[k] = best
        print(f"  k={k}: best wall {best:.3f}s (first+compile {compile_wall:.1f}s) "
              f"ber {bers[k]:.4g}", flush=True)
    dsym = ((1 << k_big) - (1 << k_small)) // n  # OFDM symbols
    dt = walls[k_big] - walls[k_small]
    rate = dsym / dt if dt > 0 else float("nan")
    print(f"  marginal {rate/1e6:.2f}M OFDM syms/s = {1e12/(rate*n):.1f} ps/bin")
    return rate


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--act-rows", type=int, default=0, help="override _ACT_ROWS_MM")
    ap.add_argument("--scoped", type=int, default=0, help="override _VMEM_SCOPED_LIMIT")
    ap.add_argument("--compiler-limit", type=int, default=0,
                    help="override _VMEM_COMPILER_LIMIT (vmem_limit_bytes)")
    ap.add_argument("--n", type=int, default=4096)
    # num_symbols = 1<<k QAM symbols; 4096-sc lr runs ~16.8G QAM/s so
    # k=33/35 gives ~0.5s/2s device walls — enough for differencing.
    ap.add_argument("--k-small", type=int, default=33)
    ap.add_argument("--k-big", type=int, default=35)
    # QAM symbols per chunk: 4096*512 rows so tile=512 divides the chunk.
    ap.add_argument("--spc", type=int, default=4096 * 512)
    args = ap.parse_args()

    from ofdm_tpu.ops import pallas_link as pk

    if args.act_rows:
        pk._ACT_ROWS_MM = args.act_rows
    if args.scoped:
        pk._VMEM_SCOPED_LIMIT = args.scoped
    if args.compiler_limit:
        pk._VMEM_COMPILER_LIMIT = args.compiler_limit
    import ofdm_tpu.pipeline  # noqa: F401  (imports resolve before run)

    print(f"n={args.n} act_rows={pk._ACT_ROWS_MM} scoped={pk._VMEM_SCOPED_LIMIT}")
    marginal(args.n, args.k_small, args.k_big, args.spc)


if __name__ == "__main__":
    main()
