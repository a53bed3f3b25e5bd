"""Waterfilling robustness study under colored-noise bumps.

TPU-native reproduction of the reference's most complete manual pipeline
(`examples/waterfilling_noise_bump_experiment.py:43-260`, the BASELINE
configs[3] target).  Semantics preserved exactly:

  * noise profile = 1 except the top quarter band x 10^(bump/10)   (:43-52)
  * waterfilling on effective_gains = |H|^2 / noise_profile        (:133-139)
  * power floor 1e-4 then renormalize to the unit budget           (:144-147)
  * sqrt(P) applied at TX                                          (:148)
  * channel uses NO noise — the colored noise is injected *after*
    demodulation/equalization, per subcarrier                      (:165-172)
  * 1/sqrt(P) compensation with a 1e-10 guard                      (:174-178)
  * global unit-power normalization before demapping               (:180-183)

Three scenarios (uniform +3 dB, WF +3 dB, WF +6 dB) over SNR 0..30 dB;
outputs per-SNR constellation PNGs, per-scenario CSVs, and the comparison
semilogy plot, in the reference's directory/naming layout.

All three scenarios share ONE compiled executable: scenario/SNR differences
enter as traced vectors (sqrt-power, per-subcarrier noise std).

BER campaigns run on the FUSED Pallas kernel (round 4): the experiment's
post-equalization stages (colored noise, 1/sqrt(P) compensation, global
normalization) run in-kernel (pallas_link.make_noise_bump_chunk), so each
point's BER is measured over >= 2^24 OFDM symbols at the framework's full
throughput instead of the 2048-symbol XLA dispatch (which remains the
constellation-plot sampler).  One executable serves all 21 points.
"""

from __future__ import annotations

from dataclasses import dataclass
from pathlib import Path
from typing import Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ofdm_tpu.config import EqualizationMethod, PrefixType
from ofdm_tpu.models import channels as chm
from ofdm_tpu.ops import allocate as al
from ofdm_tpu.ops import channel as ch
from ofdm_tpu.ops import cplx
from ofdm_tpu.ops import equalize as eq
from ofdm_tpu.ops import mapping as mp
from ofdm_tpu.ops import metrics as mt
from ofdm_tpu.ops import ofdm
from ofdm_tpu.ops import prng


@dataclass(frozen=True)
class Scenario:
    key: str
    name: str
    short_prefix: str
    power_allocation: str  # "UNIFORM" | "WATERFILLING"
    noise_bump_db: float


SCENARIOS = (
    Scenario("uniform", "Baseline (Uniform Power, +3 dB bump)", "CP-OFDM-UNIFORM",
             "UNIFORM", 3.0),
    Scenario("wf_plus3", "Water-filling (+3 dB noise bump)", "CP-OFDM-WF-3dB",
             "WATERFILLING", 3.0),
    Scenario("wf_plus6", "Water-filling (+6 dB noise bump)", "CP-OFDM-WF-6dB",
             "WATERFILLING", 6.0),
)


def create_noise_profile(num_subcarriers: int, bump_db: float) -> np.ndarray:
    """Piecewise noise profile: +bump on the top quarter band (:43-52)."""
    profile = np.ones(num_subcarriers, dtype=np.float64)
    if bump_db <= 0:
        return profile
    profile[int(0.75 * num_subcarriers):] = 10 ** (bump_db / 10)
    return profile


def scenario_power(
    scenario: Scenario,
    channel_gains: np.ndarray,
    noise_profile: np.ndarray,
    snr_db: float,
) -> np.ndarray:
    """Per-point power allocation with the experiment's floor semantics."""
    n = len(channel_gains)
    if scenario.power_allocation == "WATERFILLING":
        effective_gains = channel_gains / noise_profile
        power = al.waterfilling(1.0, effective_gains, 10 ** (-snr_db / 10))
        power = np.maximum(power, 1e-4)
        power = power / power.sum()
    else:
        power = al.uniform(1.0, n)
    return power


class _Link:
    """One compiled colored-noise link; scenario params arrive as vectors."""

    def __init__(self, num_ofdm_symbols: int, num_subcarriers: int, order: int,
                 channel_ir: np.ndarray, planar: Optional[bool] = None):
        self.B = num_ofdm_symbols
        self.n = num_subcarriers
        self.const = mp.make_constellation("QAM", order)
        self.raw_ir = channel_ir
        self.taps_np = chm.normalize_impulse_response(channel_ir)
        self.h_freq_np = chm.channel_frequency_response(channel_ir, num_subcarriers)
        self.prefix_length = int(1.0 * chm.channel_order(channel_ir))
        if planar is None:
            planar = jax.default_backend() not in ("cpu", "gpu")
        self.planar = planar
        self._step = jax.jit(self._body)

    def _wrap(self, x):
        return cplx.from_complex(x) if self.planar else jnp.asarray(x, jnp.complex64)

    def _body(self, key, snr_db, sqrt_power, inv_sqrt_power, noise_std):
        n, B, L = self.n, self.B, self.prefix_length
        taps = self._wrap(self.taps_np)
        h_freq = self._wrap(self.h_freq_np)
        kbits, knoise = jax.random.split(key)

        tx_idx = prng.uniform_indices(kbits, (B, n), np.uint32(self.const.order - 1))
        if self.planar:
            symbols = mp.encode_indices_planar(tx_idx, self.const)
        else:
            symbols = mp.encode_indices(tx_idx, self.const, dtype=jnp.complex64)
        symbols = cplx.scale(symbols, sqrt_power)  # sqrt(P) applied at TX (:148)

        blocks = ofdm.ofdm_modulate(symbols, n, PrefixType.CYCLIC, L)
        rx_blocks, _ = ch.transmit(knoise, blocks, taps, snr_db, add_noise=False)
        freq = ofdm.ofdm_demodulate_to_freq(rx_blocks, n, PrefixType.CYCLIC, L)
        eqd = eq.equalize(freq, h_freq, EqualizationMethod.MMSE, snr_db)

        # Colored noise AFTER equalization, per subcarrier (:165-172).
        z0, z1 = prng.normal_planes(jax.random.fold_in(knoise, 1), eqd.shape)
        if self.planar:
            noisy = eqd + cplx.CArray(z0 * noise_std, z1 * noise_std)
        else:
            noisy = eqd + (z0 + 1j * z1) * noise_std.astype(jnp.complex64)

        # 1/sqrt(P) compensation (:174-178) then global normalization (:180-183).
        noisy = cplx.scale(noisy, inv_sqrt_power)
        avg = cplx.mean_abs2(noisy)
        noisy = cplx.where(avg > 1e-12, noisy / jnp.sqrt(avg), noisy)

        rx_idx = (
            mp.decode_hard_planar(noisy, self.const)
            if self.planar
            else mp.decode_hard(noisy, self.const)
        )
        bit_errors = mt.index_bit_errors(tx_idx, rx_idx, self.const.bits_per_symbol)
        return bit_errors, noisy.reshape(-1)

    def run_point(self, key, scenario: Scenario, noise_profile: np.ndarray, snr_db: float):
        power = scenario_power(
            scenario, np.abs(self.h_freq_np) ** 2, noise_profile, snr_db
        )
        sqrt_power = np.sqrt(power)
        inv = sqrt_power.copy()
        inv[inv < 1e-10] = 1.0  # the reference's guard (:176-177)
        noise_var = 10 ** (-snr_db / 10) * noise_profile
        noise_std = np.sqrt(noise_var / 2.0)
        errors, symbols = self._step(
            key,
            jnp.float32(snr_db),
            jnp.asarray(sqrt_power, jnp.float32),
            jnp.asarray(1.0 / inv, jnp.float32),
            jnp.asarray(noise_std, jnp.float32),
        )
        total_bits = self.B * self.n * self.const.bits_per_symbol
        return int(errors) / total_bits, cplx.to_numpy(symbols)


class _FusedLink:
    """Fused-kernel BER campaign for the experiment (plots stay on _Link).

    One compiled executable serves every (scenario, SNR) point: the
    per-point sqrt-power / compensation / noise-std lanes are traced rows
    stacked as the kernel's (3, n) ``rows`` argument.
    """

    def __init__(self, num_ofdm_symbols: int, num_subcarriers: int, order: int,
                 channel: str, chunk: int = 1 << 17, interpret: bool = False):
        from ofdm_tpu.config import SimulationConfig
        from ofdm_tpu.ops import pallas_link
        from ofdm_tpu.pipeline import LinkRunner, prepare, _acc_add, _acc_init

        chunk = min(chunk, num_ofdm_symbols)
        if num_ofdm_symbols % chunk:
            raise ValueError("num_ofdm_symbols must divide by the chunk size")
        cfg = SimulationConfig(
            num_symbols=num_subcarriers * num_ofdm_symbols,
            num_subcarriers=num_subcarriers,
            constellation_order=order,
            channel_type="CUSTOM",
            channel_model=channel,
            prefix_type=PrefixType.CYCLIC,
            prefix_length_ratio=1.0,
            equalization_method=EqualizationMethod.MMSE,
            noise_type="NONE",
            apply_power_allocation=True,
            normalize_before_demap=True,
            snr_db=30.0,
            engine="planar",
            hotpath="pallas",
            symbols_per_chunk=chunk,
        )
        self.runner = LinkRunner(prepare(cfg))
        self.runner._interpret = interpret
        lifted = pallas_link.make_noise_bump_chunk(self.runner, chunk, interpret)
        if lifted is None:
            raise RuntimeError("fused noise-bump kernel unavailable for this config")
        fn, consts, _spec = lifted
        self.B = num_ofdm_symbols
        self.bits = int(np.log2(order))
        self.n = num_subcarriers
        num_chunks = num_ofdm_symbols // chunk
        carry0 = self.runner._init_carry()

        def run_all(key, snr_db, rows):
            def body(cs, i):
                c, acc = cs
                stats, c2 = fn(jax.random.fold_in(key, i), c, snr_db, rows, consts)
                return (c2, _acc_add(acc, stats)), None

            (_, acc), _ = jax.lax.scan(
                body, (carry0, _acc_init()), jnp.arange(num_chunks)
            )
            return acc

        self._run = jax.jit(run_all)

    def run_point(self, key, scenario: Scenario, noise_profile: np.ndarray,
                  snr_db: float) -> float:
        from ofdm_tpu.pipeline import _acc_fetch

        h2 = np.abs(self.runner.setup.h_freq) ** 2
        power = scenario_power(scenario, h2, noise_profile, snr_db)
        sqrt_power = np.sqrt(power)
        inv = sqrt_power.copy()
        inv[inv < 1e-10] = 1.0  # the reference's guard (:176-177)
        noise_std = np.sqrt(10 ** (-snr_db / 10) * noise_profile / 2.0)
        rows = jnp.asarray(
            np.stack([sqrt_power, 1.0 / inv, noise_std]), jnp.float32
        )
        # Single-transfer totals (the relay pays ~140 ms per round trip).
        be, _se, _pp, _ps, _pc = _acc_fetch(self._run(key, jnp.float32(snr_db), rows))
        return be / (self.B * self.n * self.bits)


def run_noise_bump_experiment(
    snr_values: Sequence[float] = (0, 5, 10, 15, 20, 25, 30),
    num_ofdm_symbols: int = 2048,
    num_subcarriers: int = 64,
    constellation_order: int = 64,
    channel: str = "Lin-Phoong_P2",
    output_dir: str = "images/Lin-Phoong_P2/CP-OFDM-Waterfilling-Study",
    results_dir: str = "results",
    seed: int = 42,
    save_plots: bool = True,
    max_plot_symbols: int = 32768,
    fused_symbols_per_point: Optional[int] = None,
) -> Dict[str, List[float]]:
    """Run all three scenarios; returns {scenario name: [ber per snr]}.

    ``fused_symbols_per_point``: when set (default: 2^24 on a TPU backend,
    off on CPU), BERs are measured over that many OFDM symbols per point on
    the fused Pallas kernel; the XLA link still renders the constellation
    samples.  Pass 0 to force the XLA-only path.
    """
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    channel_ir = chm.get_channel(channel)
    link = _Link(num_ofdm_symbols, num_subcarriers, constellation_order, channel_ir)
    key = jax.random.PRNGKey(seed)

    if fused_symbols_per_point is None:
        fused_symbols_per_point = (
            1 << 24 if jax.default_backend() not in ("cpu", "gpu") else 0
        )
    fused = None
    if fused_symbols_per_point:
        try:
            fused = _FusedLink(
                fused_symbols_per_point, num_subcarriers, constellation_order,
                channel,
            )
        except Exception:
            fused = None  # fall back to the XLA-only campaign

    base_out = Path(output_dir)
    res_dir = Path(results_dir)
    res_dir.mkdir(parents=True, exist_ok=True)

    scenario_results: Dict[str, List[float]] = {}
    for s_i, scenario in enumerate(SCENARIOS):
        scen_dir = base_out / scenario.short_prefix
        if save_plots:
            scen_dir.mkdir(parents=True, exist_ok=True)
        noise_profile = create_noise_profile(num_subcarriers, scenario.noise_bump_db)
        bers: List[float] = []
        for p_i, snr_db in enumerate(snr_values):
            ber, symbols = link.run_point(
                jax.random.fold_in(key, s_i * 1000 + p_i), scenario, noise_profile,
                float(snr_db),
            )
            if fused is not None:
                # Fused-kernel BER over fused_symbols_per_point OFDM symbols
                # (the XLA sample above still feeds the constellation plot).
                ber = fused.run_point(
                    jax.random.fold_in(key, 500_000 + s_i * 1000 + p_i),
                    scenario, noise_profile, float(snr_db),
                )
            bers.append(ber)
            if save_plots:
                sample = symbols[:max_plot_symbols]
                ideal = link.const.table
                plt.figure(figsize=(6, 6))
                plt.scatter(sample.real, sample.imag, color="tab:blue", alpha=0.15,
                            s=6, label="Received Symbols")
                plt.scatter(ideal.real, ideal.imag, color="tab:red", marker="o",
                            s=30, label="Ideal Constellation")
                plt.title(f"{scenario.name}\nSNR = {snr_db} dB | BER = {ber:.3e}")
                plt.xlabel("In-Phase")
                plt.ylabel("Quadrature")
                plt.axhline(0, color="gray", linewidth=0.5)
                plt.axvline(0, color="gray", linewidth=0.5)
                plt.grid(True, linestyle=":", alpha=0.4)
                plt.legend(loc="upper right", fontsize=8)
                plt.xlim([-2.2, 2.2])
                plt.ylim([-2.2, 2.2])
                plt.gca().set_aspect("equal", adjustable="box")
                plt.tight_layout()
                plt.savefig(scen_dir / f"{scenario.short_prefix}-SNR{int(snr_db):02d}dB.png",
                            dpi=200)
                plt.close()
        scenario_results[scenario.name] = bers

        with (res_dir / f"ber_{scenario.key}_waterfilling_study.csv").open(
            "w", encoding="utf-8"
        ) as fp:
            fp.write("snr_db,bit_error_rate\n")
            for snr_db, ber in zip(snr_values, bers):
                fp.write(f"{snr_db},{ber}\n")

    if save_plots:
        base_out.mkdir(parents=True, exist_ok=True)
        plt.figure(figsize=(7, 5))
        for scenario in SCENARIOS:
            plt.semilogy(snr_values, scenario_results[scenario.name], marker="o",
                         linewidth=2, label=scenario.name)
        plt.title("CP-OFDM BER vs. SNR with Colored Noise Bumps")
        plt.xlabel("SNR (dB)")
        plt.ylabel("Bit Error Rate")
        plt.grid(True, which="both", linestyle=":", alpha=0.6)
        plt.legend()
        plt.tight_layout()
        plt.savefig(base_out / "CP-OFDM-waterfilling-ber-comparison.png", dpi=250)
        plt.close()

    return scenario_results


if __name__ == "__main__":  # pragma: no cover
    results = run_noise_bump_experiment()
    for name, bers in results.items():
        print(name, ["%.3e" % b for b in bers])
