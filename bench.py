"""Headline benchmark: OFDM symbols/s on the reference's published campaign.

Config (docs/OFDM-Based Systems.tex:199-219): 64 subcarriers, 64-QAM,
CP-OFDM with prefix ratio 1.0, MMSE equalization, Lin-Phoong P2 channel,
AWGN at 30 dB — the BER-table config of the reference paper.

Baseline: the reference simulator measured on this machine's CPU at its
published 6M-bit campaign size:

    551.2 OFDM symbols/s, BER = 0.01901       (2026-08-17, /root/reference)

    repro: Simulation(num_bits=6_000_000, num_subcarriers=64,
        constellation_order=64, QAM, OFDM, CYCLIC prefix ratio 1.0, MMSE,
        snr=30 dB, AWGN, Lin-Phoong_P2).run()  -> 28.35 s wall

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"} plus
diagnostic extras (BER gate vs the reference's 0.0190 so a fast-but-wrong
kernel can't win).
"""

import json
import sys
import time

REFERENCE_OFDM_SYMBOLS_PER_S = 551.2
REFERENCE_BER_30DB = 0.01901  # also docs/OFDM-Based Systems.tex:246-264 (0.0189)


def main() -> int:
    import os

    # Optional persistent compilation cache (jax_compilation_cache_dir).
    # OFF by default: on the axon relay backend, loading a cached executable
    # reproducibly wedges the process (entries are written but
    # deserialization hangs — probed 2026-08-17, tmp/cache_probe.py), so we
    # only enable it when the user opts in on a backend that supports it.
    cache_dir = os.environ.get("OFDM_TPU_COMPILE_CACHE")

    import jax

    if cache_dir:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from ofdm_tpu.config import (
        ChannelType,
        ConstellationType,
        EqualizationMethod,
        PrefixType,
        SimulationConfig,
    )
    from ofdm_tpu.pipeline import LinkRunner, prepare

    # Campaign size: large enough that the ~140 ms fixed relay-dispatch
    # latency is amortized (the kernel's marginal rate is ~2-6x the
    # small-run wall rate; measured slope 67-86M syms/s vs 12M reported at
    # 2^21 — see docs/PERFORMANCE.md "Where the time goes").
    # 2^31 OFDM symbols = 824G bits per run: the ~0.18 s fixed per-run
    # overhead (dispatch + host sums, measured by run-size differencing)
    # drops to ~2% of the ~8.9 s run (measured 2026-08-19: 241.5M syms/s
    # wall at 2^31 vs 236.9M at 2^30).  Counters stay exact: chunks
    # accumulate int32 on device, the host sums chunk totals in int64
    # (pipeline.py run()).
    num_ofdm_symbols = 1 << 31
    cfg = SimulationConfig(
        num_symbols=64 * num_ofdm_symbols,
        num_subcarriers=64,
        constellation_order=64,
        constellation_type=ConstellationType.QAM,
        channel_type=ChannelType.CUSTOM,
        channel_model="Lin-Phoong_P2",
        prefix_type=PrefixType.CYCLIC,
        prefix_length_ratio=1.0,
        equalization_method=EqualizationMethod.MMSE,
        snr_db=30.0,
        # Chunk-size sweep measured 2026-08-17: 2^17 vs 2^21 QAM symbols per
        # launch is within relay noise at this campaign size (92.59M vs
        # 92.31M syms/s), so the smaller verified chunk stays.
        symbols_per_chunk=1 << 17,
    )
    runner = LinkRunner(prepare(cfg))
    key = jax.random.PRNGKey(0)

    # Warmup (compile) on a point we don't score.
    t0 = time.perf_counter()
    runner.run(key, snr_db=25.0)
    compile_s = time.perf_counter() - t0

    best = 0.0
    run_s = None
    ber = None
    hotpath = passes = None
    # 4 reps: relay-side jitter puts ±2-8% on individual walls (r4 driver
    # bench read 449M/20.1M where an idle host measures 458M+/24.2M; the
    # extra reps make best-of robust to one or two slow rounds).
    for rep in range(4):
        r = runner.run(jax.random.fold_in(key, 100 + rep), snr_db=30.0)
        if r["ofdm_symbols_per_s"] > best:
            best = r["ofdm_symbols_per_s"]
            run_s = r["transmission_time_ms"] / 1000.0
        ber = r["bit_error_rate"]
        hotpath, passes = r["hotpath_used"], r["matmul_passes_used"]

    # Secondary (diagnostic, non-scoring): the BASELINE configs[4] wide
    # link — 1024 subcarriers, severe_multipath, CP ratio 1.0 — on the
    # raised-VMEM fused kernel.  Guarded so a relay hiccup on this extra
    # compile can't zero the headline.
    wide_rate = wide_ber = None
    try:
        # 2^27 OFDM symbols (824G bits): the wide run's fixed overhead is
        # ~0.38 s regardless of chunk count (measured 2026-08-19 by run-size
        # differencing), and the txext kernel's 39.6M syms/s marginal makes
        # a ~3.4 s campaign necessary to keep the wall rate within ~15% of
        # marginal.
        wide_n = 1 << 27
        wide_cfg = SimulationConfig(
            num_symbols=1024 * wide_n,
            num_subcarriers=1024,
            constellation_order=64,
            constellation_type=ConstellationType.QAM,
            channel_type=ChannelType.CUSTOM,
            channel_model="severe_multipath",
            prefix_type=PrefixType.CYCLIC,
            prefix_length_ratio=1.0,
            equalization_method=EqualizationMethod.MMSE,
            snr_db=30.0,
            symbols_per_chunk=1 << 17,
        )
        wide_runner = LinkRunner(prepare(wide_cfg))
        wide_runner.run(key, snr_db=25.0)  # compile
        for rep in range(4):
            rw = wide_runner.run(jax.random.fold_in(key, 200 + rep), snr_db=30.0)
            wide_rate = max(wide_rate or 0.0, rw["ofdm_symbols_per_s"])
            wide_ber = rw["bit_error_rate"]
    except Exception:
        pass

    # Diagnostic (non-scoring): the lr (low-rank factored ISI) kernel on
    # its headline cell — 1024 sc ZP ratio 1.0 MMSE, severe_multipath —
    # where the dense (T+E)-wide matmul chain used to run 3.84M syms/s and
    # the factored chain measures ~26M (docs/PERFORMANCE.md lr bullet).
    lr_rate = lr_ber = None
    try:
        lr_n = 1 << 26
        lr_cfg = SimulationConfig(
            num_symbols=1024 * lr_n,
            num_subcarriers=1024,
            constellation_order=64,
            constellation_type=ConstellationType.QAM,
            channel_type=ChannelType.CUSTOM,
            channel_model="severe_multipath",
            prefix_type=PrefixType.ZERO,
            prefix_length_ratio=1.0,
            equalization_method=EqualizationMethod.MMSE,
            snr_db=30.0,
            symbols_per_chunk=1 << 17,
        )
        lr_runner = LinkRunner(prepare(lr_cfg))
        lr_runner.run(key, snr_db=25.0)  # compile
        for rep in range(3):
            rl = lr_runner.run(jax.random.fold_in(key, 400 + rep), snr_db=30.0)
            lr_rate = max(lr_rate or 0.0, rl["ofdm_symbols_per_s"])
            lr_ber = rl["bit_error_rate"]
    except Exception:
        pass

    # Tertiary (diagnostic, non-scoring): the reference's DEFAULT config —
    # SC-FDE QPSK, Lin-Phoong P1, ZF — on the fused kernel (fold-mode lane
    # packing).  Guarded like the wide diagnostic.
    scfde_rate = scfde_ber = None
    try:
        from ofdm_tpu.config import ModulationType

        sc_n = 1 << 29  # 537M OFDM symbols (68.7G bits/run at QPSK)
        sc_cfg = SimulationConfig(
            num_symbols=64 * sc_n,
            num_subcarriers=64,
            constellation_order=4,
            constellation_type=ConstellationType.QAM,
            channel_type=ChannelType.CUSTOM,
            channel_model="Lin-Phoong_P1",
            modulation_type=ModulationType.SC_OFDM,
            prefix_type=PrefixType.CYCLIC,
            prefix_length_ratio=1.0,
            equalization_method=EqualizationMethod.ZF,
            snr_db=10.0,
            symbols_per_chunk=1 << 17,
        )
        sc_runner = LinkRunner(prepare(sc_cfg))
        sc_runner.run(key, snr_db=10.0)  # compile
        for rep in range(2):
            rs = sc_runner.run(jax.random.fold_in(key, 300 + rep), snr_db=10.0)
            scfde_rate = max(scfde_rate or 0.0, rs["ofdm_symbols_per_s"])
            scfde_ber = rs["bit_error_rate"]
    except Exception:
        pass

    # Always-on hardware PRNG statistics (VERDICT r3 item 8): sample the
    # kernel's exact Box-Muller chain on the real chip and moment-gate it,
    # so every round's BENCH_r*.json pins the noise path numerically, not
    # just via the BER gate.  2^22 samples/plane: sigma(mean)=4.9e-4,
    # sigma(var)~6.9e-4, sigma(tail3)=2.6e-5 — gates at ~6 sigma.
    noise = {"ok": None}
    try:
        import jax.numpy as jnp
        from ofdm_tpu.ops.pallas_link import boxmuller_sample

        z0, z1 = boxmuller_sample(987654321, 123456789, (1 << 15, 128))
        z0 = z0.reshape(-1)
        z1 = z1.reshape(-1)
        noise = {
            "mean": float(jnp.mean(z0)),
            "var": float(jnp.var(z0)),
            "tail3": float(jnp.mean((jnp.abs(z0) > 3.0).astype(jnp.float32))),
            "amax": float(jnp.maximum(jnp.max(jnp.abs(z0)), jnp.max(jnp.abs(z1)))),
            "corr": float(jnp.mean(z0 * z1)),
        }
        noise["ok"] = bool(
            abs(noise["mean"]) < 3e-3
            and abs(noise["var"] - 1.0) < 5e-3
            and 0.0025 <= noise["tail3"] <= 0.0029
            # 24-bit u1 caps the Box-Muller radius at sqrt(-2 ln 2^-24)=5.77.
            and 4.0 < noise["amax"] <= 5.78
            and abs(noise["corr"]) < 3e-3
        )
    except Exception:
        pass

    # Correctness gate: BER at 30 dB must match the reference's (0.0190).
    # At 25.8G bits the Monte-Carlo CI is ~1e-6; allow 1.5e-3 for the
    # (documented) bf16-matmul/f32/per-chunk-power differences (measured
    # +2.2e-4 at matmul_passes=1, docs/PERFORMANCE.md).
    ber_ok = abs(ber - REFERENCE_BER_30DB) < 1.5e-3
    # The noise-moment gate also zeroes the score when it FAILS (None =
    # sampler unavailable on this backend; the BER gate still stands).
    value = best if ber_ok and noise["ok"] is not False else 0.0

    print(
        json.dumps(
            {
                "metric": "ofdm_symbols_per_s",
                "value": round(value, 1),
                "unit": "OFDM symbols/s (64sc, 64-QAM, CP, MMSE, Lin-Phoong P2, 30 dB)",
                "vs_baseline": round(value / REFERENCE_OFDM_SYMBOLS_PER_S, 1),
                "ber_30db": ber,
                "ber_reference": REFERENCE_BER_30DB,
                "ber_match": ber_ok,
                # Honest wall split: compile_s is the one-time warmup
                # (remote compile on this relay); run_s is the measured
                # Monte-Carlo wall the throughput is computed from.
                "compile_s": round(compile_s, 1),
                "run_s": round(run_s, 2) if run_s is not None else None,
                "hotpath": hotpath,
                "matmul_passes": passes,
                "wide_1024sc_ofdm_symbols_per_s": (
                    round(wide_rate, 1) if wide_rate is not None else None
                ),
                "wide_1024sc_ber_30db": wide_ber,
                # lr factored-ISI kernel cell (1024 sc, ZP 1.0, MMSE).
                "lr_1024sc_zp_ofdm_symbols_per_s": (
                    round(lr_rate, 1) if lr_rate is not None else None
                ),
                "lr_1024sc_zp_ber_30db": lr_ber,
                # The reference's default config (SC-FDE QPSK ZF @10 dB);
                # its measured reference BER on this machine is ~0.0145.
                "scfde_default_ofdm_symbols_per_s": (
                    round(scfde_rate, 1) if scfde_rate is not None else None
                ),
                "scfde_default_ber_10db": scfde_ber,
                # Hardware noise-path moments (kernel's exact Box-Muller
                # chain, 2^22 samples) + pass/fail gate.
                "noise_moments": noise,
                "backend": jax.default_backend(),
            }
        )
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
