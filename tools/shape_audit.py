"""Hardware shape audit: compile + run every production kernel shape.

Round-5 robustness tool: drives each (width x prefix x modulation x
constellation x adaptive) combination end-to-end on the real chip at its
largest grid tile (8192-row chunks), so planner/VMEM regressions surface
as compile failures instead of shipping (this audit caught the 128-sc ZP
tile-8192 VMEM OOM, docs/ROUND5_NOTES.md).

    python tools/shape_audit.py            # ~15-20 min of remote compiles
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

from ofdm_tpu.config import (  # noqa: E402
    AdaptiveModulationMode,
    ChannelType,
    ConstellationType,
    EqualizationMethod,
    ModulationType,
    PowerAllocationType,
    PrefixType,
    SimulationConfig,
)
from ofdm_tpu.pipeline import LinkRunner, prepare  # noqa: E402

KEY = jax.random.PRNGKey(0)
RESULTS = {"ok": 0, "bad": 0}


def run(tag, **kw):
    base = dict(
        num_symbols=64 * 16384,
        num_subcarriers=64,
        constellation_order=64,
        channel_type=ChannelType.CUSTOM,
        channel_model="severe_multipath",
        prefix_type=PrefixType.CYCLIC,
        prefix_length_ratio=1.0,
        equalization_method=EqualizationMethod.MMSE,
        snr_db=30.0,
        symbols_per_chunk=64 * 8192,
    )
    base.update(kw)
    try:
        r = LinkRunner(prepare(SimulationConfig(**base)))
        t0 = time.perf_counter()
        res = r.run(KEY, snr_db=base["snr_db"])
        print(
            f"OK  {tag:>22}: hot={res['hotpath_used']} "
            f"ber={res['bit_error_rate']:.2e} ({time.perf_counter() - t0:.0f}s)",
            flush=True,
        )
        RESULTS["ok"] += 1
    except Exception as e:  # noqa: BLE001 — audit must keep going
        print(f"BAD {tag}: {str(e)[:200]}", flush=True)
        RESULTS["bad"] += 1


def main() -> int:
    for n in (64, 128, 256, 512, 1024, 2048, 4096):
        for prefix, ratio in (
            (PrefixType.CYCLIC, 1.0),
            (PrefixType.CYCLIC, 0.34),
            (PrefixType.ZERO, 1.0),
        ):
            run(
                f"OFDM-{prefix.name[:2]}{ratio}-{n}",
                num_symbols=n * 16384,
                num_subcarriers=n,
                prefix_type=prefix,
                prefix_length_ratio=ratio,
                symbols_per_chunk=n * 8192,
            )
    for prefix in (PrefixType.CYCLIC, PrefixType.ZERO):
        for n in (64, 1024):
            run(
                f"SC-{prefix.name[:2]}1.0-{n}",
                modulation_type=ModulationType.SC_OFDM,
                prefix_type=prefix,
                num_symbols=n * 16384,
                num_subcarriers=n,
                symbols_per_chunk=n * 8192,
            )
    run("OFDM-NONE-64", prefix_type=PrefixType.NONE, snr_db=20.0)
    run(
        "PSK8-CP1.0-64",
        constellation_order=8,
        constellation_type=ConstellationType.PSK,
    )
    run(
        "PSK8-CP0.34-64",
        constellation_order=8,
        constellation_type=ConstellationType.PSK,
        prefix_length_ratio=0.34,
    )
    run(
        "ADAPT-WF-CP1.0-64",
        num_symbols=16384,
        power_allocation_type=PowerAllocationType.WATERFILLING,
        adaptive_modulation_mode=AdaptiveModulationMode.CAPACITY_BASED,
        snr_db=20.0,
        symbols_per_chunk=8192,
    )
    run(
        "ADAPT-WF-ZP0.5-256",
        num_symbols=16384,
        num_subcarriers=256,
        power_allocation_type=PowerAllocationType.WATERFILLING,
        adaptive_modulation_mode=AdaptiveModulationMode.CAPACITY_BASED,
        snr_db=20.0,
        prefix_type=PrefixType.ZERO,
        prefix_length_ratio=0.5,
        symbols_per_chunk=8192,
    )
    print(f"done: {RESULTS['ok']} ok, {RESULTS['bad']} bad", flush=True)
    return 1 if RESULTS["bad"] else 0


if __name__ == "__main__":
    sys.exit(main())
