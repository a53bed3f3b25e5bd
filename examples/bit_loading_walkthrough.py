"""Bit loading walkthrough: M-QAM / M-PSK adaptive OFDM, step by step.

TPU-native equivalent of the reference's `notebook/bit-loading.ipynb`:
given a power budget P, N subcarriers, a global SNR, and a target symbol
error rate, derive the waterfilling power allocation, the per-subcarrier
SNRs and Shannon capacities, and the gap-function constellation orders —
then run the adaptive link end to end and plot the order-colored
constellation.  Every step is a pure batched JAX op (no per-symbol Python
loops), so the same code path scales from this demo to the fused-kernel
pipeline in ofdm_tpu.pipeline.

The derivation chain (notebook cells 5-11; math in its closing cell):

    SNR_lin   = 10^(SNR_dB/10)
    I         = P / SNR_lin                      (total noise power)
    P_k       = waterfilling(P, |H_k|^2, I)      (power per subcarrier)
    gamma_k   = P_k |H_k|^2 / I                  (per-subcarrier SNR)
    C_k       = log2(1 + gamma_k)                (capacity, bits/symbol)
    b_k       = round(log2(1 + gamma_k / Gamma)) (gap function, QAM: even)
    order_k   = 2^b_k                            (0 = subcarrier off)

where Gamma = (1/3) Qinv(SER/4)^2 is the QAM SNR gap
(constellation/models.py:297-321 in the reference; ops/mapping.py here).

Run:  python examples/bit_loading_walkthrough.py [--num-ofdm-symbols N]
                                                  [--out DIR] [--psk]
"""

# Allow running straight from a source checkout (no install needed).
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

# This walkthrough uses native complex dtypes for readability (the
# production hot path — ofdm_tpu.pipeline — runs the planar-f32 + Pallas
# form on TPU instead; see ofdm_tpu/ops/cplx.py).  Deployment TPU relays
# have no complex-dtype lowering, so the demo pins itself to CPU unless
# told otherwise: OFDM_TPU_WALKTHROUGH_PLATFORM=tpu overrides.
_platform = _os.environ.get("OFDM_TPU_WALKTHROUGH_PLATFORM", "cpu")
_os.environ["JAX_PLATFORMS"] = _platform

import argparse

import jax

# The image's sitecustomize imports jax and registers the TPU plugin before
# this script runs, so the env var alone is too late (see tests/conftest.py).
jax.config.update("jax_platforms", _platform)
import jax.numpy as jnp
import numpy as np

from ofdm_tpu.config import EqualizationMethod, PrefixType
from ofdm_tpu.models import channels as chm
from ofdm_tpu.ops import adaptive as ad
from ofdm_tpu.ops import allocate as al
from ofdm_tpu.ops import bits as bi
from ofdm_tpu.ops import channel as ch
from ofdm_tpu.ops import equalize as eq
from ofdm_tpu.ops import framing
from ofdm_tpu.ops import mapping as mp
from ofdm_tpu.ops import metrics
from ofdm_tpu.ops import ofdm


def main() -> None:
    p = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    p.add_argument("--num-ofdm-symbols", type=int, default=10_000 // 64)
    p.add_argument("--total-power", type=float, default=1.0)
    p.add_argument("--num-subcarriers", type=int, default=64)
    p.add_argument("--snr-db", type=float, default=20.0)
    p.add_argument("--ser", type=float, default=1e-3)
    p.add_argument("--channel", default="Lin-Phoong_P2")
    p.add_argument("--psk", action="store_true", help="PSK instead of QAM")
    p.add_argument("--out", default=None, help="write plots to this directory")
    args = p.parse_args()

    kind = "PSK" if args.psk else "QAM"
    n_sc = args.num_subcarriers
    total_power = args.total_power

    # -- Step 1: SNR and noise power (notebook cells 5-6) --------------------
    snr_linear = 10.0 ** (args.snr_db / 10.0)
    noise_power = total_power / snr_linear
    print(f"SNR: {args.snr_db} dB = {snr_linear:.1f} linear")
    print(f"Noise power I = P/SNR = {noise_power:.6f} W")

    # -- Step 2: channel frequency response and gains (cell 7) ---------------
    taps = chm.normalize_impulse_response(chm.get_channel(args.channel))
    h_freq = chm.channel_frequency_response(taps, n_sc)
    gains = chm.channel_gains(taps, n_sc)
    print(f"Channel '{args.channel}': {len(taps)} taps, order {len(taps) - 1}")
    print(f"Gains |H_k|^2: min {gains.min():.4f}, max {gains.max():.4f}")

    # -- Step 3: waterfilling power allocation (cell 8) ----------------------
    power = al.waterfilling(total_power, gains, noise_power)
    mu = al.water_level(power, gains, noise_power)
    assert np.isclose(power.sum(), total_power), "budget must be conserved"
    print(f"Waterfilling: water level mu = {mu:.6f}, "
          f"{int((power > 1e-10).sum())}/{n_sc} subcarriers powered")

    # -- Step 4: per-subcarrier SNR and capacity (cells 9-10) ----------------
    # The noise each subcarrier sees is the spectral density N0 = I / (N*BW)
    # (notebook cell 9, BW = 1), not the whole-band noise power.
    n0 = noise_power / n_sc
    print(f"Noise spectral power density N0 = I/N = {n0:.3e} W/Hz")
    snr_per_sc = power * gains / n0
    cap_per_sc = al.capacity_per_subcarrier(power, gains, n0)
    stats = al.compare_allocations(
        al.uniform(total_power, n_sc), power, gains, n0
    )
    print(f"Capacity: {stats['waterfilling_capacity']:.4f} bits/use "
          f"(uniform {stats['uniform_capacity']:.4f}, "
          f"+{stats['capacity_gain_percent']:.2f}%)")

    # -- Step 5: gap-function bit loading (cell 11) ---------------------------
    orders = mp.bit_loading_orders(kind, args.ser, snr_per_sc)
    mapper = ad.make_adaptive_mapper(kind, orders)
    total_bits, bits_per_sc = ad.calculate_requirements(
        orders, args.num_ofdm_symbols
    )
    print(f"Constellation orders ({mapper.name}):")
    print("  " + " ".join(str(int(o)) for o in orders))
    print(f"Bits per OFDM symbol: {mapper.bits_per_ofdm_symbol} "
          f"(Shannon bound {cap_per_sc.sum():.1f})")
    print(f"Total bits for {args.num_ofdm_symbols} OFDM symbols: {total_bits}")

    # -- Step 6: TX — bits -> symbols -> scaled -> OFDM (cells 12-14) --------
    key = jax.random.PRNGKey(0)
    k_bits, k_chan = jax.random.split(key)
    tx_bits = bi.random_bits(k_bits, (args.num_ofdm_symbols, mapper.bits_per_ofdm_symbol))
    tx_symbols, tx_idx = ad.encode(tx_bits, mapper)            # (B, N)
    sqrt_power = jnp.sqrt(jnp.asarray(power, jnp.float32))
    scaled = tx_symbols * sqrt_power[None, :]
    tx_power = float(jnp.mean(jnp.abs(scaled) ** 2) * n_sc)
    print(f"TX power after sqrt(P_k) scaling: {tx_power:.3f} W "
          f"(budget {total_power})")

    prefix_len = len(taps) - 1  # CP absorbs the full channel order
    blocks = ofdm.ofdm_modulate(scaled, n_sc, PrefixType.CYCLIC, prefix_len)
    pwr = jnp.abs(blocks) ** 2
    papr_db = float(
        metrics.papr_db(jnp.max(pwr), jnp.sum(pwr), pwr.size)
    )
    print(f"PAPR of the OFDM time signal: {papr_db:.2f} dB")

    # -- Step 7: channel (cell 15) --------------------------------------------
    rx_blocks, _ = ch.transmit(k_chan, blocks, jnp.asarray(taps), args.snr_db)

    # -- Step 8: RX — demodulate, equalize, compensate, decode (cells 16-19) --
    rx_freq = ofdm.ofdm_demodulate_to_freq(
        rx_blocks, n_sc, PrefixType.CYCLIC, prefix_len
    )
    equalized = eq.equalize(
        rx_freq, jnp.asarray(h_freq), EqualizationMethod.MMSE, args.snr_db
    )
    # Undo the TX power scaling per subcarrier before hard decisions
    # (the notebook normalizes to unit power; 1/sqrt(P_k) with a guard is
    # the per-subcarrier form the noise-bump experiment uses).
    comp = jnp.where(sqrt_power > 1e-10, 1.0 / jnp.maximum(sqrt_power, 1e-10), 0.0)
    rx_symbols = equalized * comp[None, :]
    rx_bits, rx_idx = ad.decode(rx_symbols, mapper)

    # -- Step 9: metrics (cell 19) --------------------------------------------
    ber = float(jnp.mean((tx_bits != rx_bits).astype(jnp.float32)))
    active = mapper.active
    ser = float(jnp.mean((tx_idx != rx_idx)[:, jnp.asarray(active)].astype(jnp.float32)))
    print(f"BER: {ber:.6f}   SER: {ser:.6f} "
          f"(target SER {args.ser:g} at the gap-function design point)")

    # -- Step 10: order-colored constellation (cell 20) -----------------------
    if args.out:
        import matplotlib
        matplotlib.use("Agg")
        from ofdm_tpu.utils.visualization import (
            plot_adaptive_constellation_diagram,
            plot_water_level_diagram,
        )

        _os.makedirs(args.out, exist_ok=True)
        fig = plot_adaptive_constellation_diagram(
            received_symbols=np.asarray(
                framing.to_serial(rx_symbols), dtype=np.complex128
            ),
            constellation_orders=orders,
            constellation_title=kind,
            num_subcarriers=n_sc,
            ber=ber,
            ser=ser,
            snr_db=args.snr_db,
            papr_db=papr_db,
        )
        path = _os.path.join(args.out, "bit_loading_constellation.png")
        fig.savefig(path, dpi=100)
        fig2 = plot_water_level_diagram(power, gains, noise_power, mu)
        path2 = _os.path.join(args.out, "bit_loading_water_level.png")
        fig2.savefig(path2, dpi=100)
        print(f"Plots: {path}, {path2}")


if __name__ == "__main__":
    main()
