"""Overview: the full adaptive bit-loading pipeline, built by hand from ops.

Equivalent of the reference's examples/overview.py (its most complete manual
walk-through, :50-300): waterfilling -> gap-function bit loading -> adaptive
mapping -> OFDM over a multipath channel -> per-subcarrier normalization ->
demapping -> BER, assembled step by step from the public ops so you can see
every stage.  The packaged pipeline (ofdm_tpu.pipeline) fuses exactly these
stages under jit.
"""

# Allow running straight from a source checkout (no install needed).
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from ofdm_tpu.config import EqualizationMethod, PrefixType
from ofdm_tpu.models import channels as chm
from ofdm_tpu.ops import adaptive as ad
from ofdm_tpu.ops import allocate as al
from ofdm_tpu.ops import bits as bitops
from ofdm_tpu.ops import channel as ch
from ofdm_tpu.ops import equalize as eq
from ofdm_tpu.ops import mapping as mp
from ofdm_tpu.ops import metrics as mt
from ofdm_tpu.ops import ofdm


def main() -> None:
    key = jax.random.PRNGKey(42)
    n, snr_db, num_ofdm_symbols = 64, 20.0, 1000
    desired_ser = 1e-3

    # --- channel -------------------------------------------------------------
    raw_ir = chm.get_channel("Lin-Phoong_P1")
    taps = jnp.asarray(chm.normalize_impulse_response(raw_ir), jnp.complex64)
    h_freq = chm.channel_frequency_response(raw_ir, n)
    gains = np.abs(h_freq) ** 2
    noise_power = 10 ** (-snr_db / 10)
    prefix_len = chm.channel_order(raw_ir)
    print(f"Channel: {len(raw_ir)} taps, prefix length {prefix_len}")

    # --- waterfilling + gap-function bit loading --------------------------------
    power = al.waterfilling(float(n), gains, noise_power)
    snr_per_sc = power * gains / noise_power
    orders = mp.qam_bit_loading_orders(desired_ser, snr_per_sc)
    mapper = ad.make_adaptive_mapper("QAM", orders)
    print(f"Orders: min {orders[orders>0].min()}, max {orders.max()}, "
          f"{(orders > 0).sum()}/{n} active, "
          f"{mapper.bits_per_ofdm_symbol} bits/OFDM symbol")

    # --- TX ---------------------------------------------------------------------
    kbits, knoise = jax.random.split(key)
    tx_bits = bitops.random_bits(kbits, (num_ofdm_symbols, mapper.bits_per_ofdm_symbol))
    symbols, tx_idx = ad.encode(tx_bits, mapper)
    # Apply the power allocation (the experiment-script path; the main
    # reference path computes but does not apply it).
    symbols = symbols * jnp.sqrt(jnp.asarray(power)).astype(symbols.dtype)
    blocks = ofdm.ofdm_modulate(symbols, n, PrefixType.CYCLIC, prefix_len)

    # --- channel ------------------------------------------------------------------
    rx_blocks, _ = ch.transmit(knoise, blocks, taps, snr_db)

    # --- RX -------------------------------------------------------------------------
    freq = ofdm.ofdm_demodulate_to_freq(rx_blocks, n, PrefixType.CYCLIC, prefix_len)
    eqd = eq.equalize(freq, jnp.asarray(h_freq, jnp.complex64),
                      EqualizationMethod.MMSE, snr_db)
    # Per-subcarrier normalization to unit average power before demapping
    # (reference overview.py / NORMALIZATION_FIX.md semantics).
    per_sc_power = jnp.mean(jnp.abs(eqd) ** 2, axis=0, keepdims=True)
    eqd = jnp.where(per_sc_power > 1e-10, eqd / jnp.sqrt(per_sc_power), eqd)

    rx_bits, rx_idx = ad.decode(eqd, mapper)

    # --- metrics ------------------------------------------------------------------------
    total_bits = num_ofdm_symbols * mapper.bits_per_ofdm_symbol
    errors = int(mt.bit_errors(tx_bits, rx_bits))
    print(f"BER: {errors}/{total_bits} = {errors / total_bits:.6f}")
    print(f"SER: {int(mt.symbol_errors(tx_idx, rx_idx)) / tx_idx.size:.6f}")


if __name__ == "__main__":
    main()
