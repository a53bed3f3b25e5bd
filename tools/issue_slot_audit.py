"""Issue-slot audit: is the fused kernel's headline config VPU-bound at peak?

The round-3 verdict asked either to beat ~1.6 ns/sym on the demap+count
chain or to PROVE the ~22 ps/bin packed cost is the hardware floor.  This
tool makes the floor argument quantitative and reproducible:

1. Each kernel stage (encode, diag channel multiply, AWGN, MMSE equalize,
   demap, xor+popcount+reduce) is traced STANDALONE with jax.make_jaxpr on
   one packed vreg row (8, 128) — exactly the element math the Mosaic
   kernel runs, because every stage is built from the same shared helpers
   (pallas_link._encode_tile/_demap_tile/_cossin_u24/...).
2. Vector primitives are counted per element with a weight table
   (transcendentals expanded to their polynomial cost, converts/selects 1,
   divides/rsqrts by their NR-iteration cost).  PRNG draws are counted at
   1 slot/word (pltpu.prng_random_bits emits one u32 word per element per
   draw on the VPU's PRNG port).
3. The total is converted to ps/bin at the chip's VPU peak
   (8 sublanes x 128 lanes x N_ALU per cycle) and compared against the
   MEASURED marginal per-bin cost from bench/PERFORMANCE.md.

Result (v5e, 940 MHz, 4 VPU ALUs -> 3.85e12 elem-ops/s; see
docs/PERFORMANCE.md "issue-slot audit" for the table this produced):
the counted chain lands within ~10-15% of the measured 33-36 ps/bin wall
cost, i.e. the kernel is ISSUE-BOUND at >=85-90% of VPU peak — further
gains require REMOVING ops (whole blocks), not rescheduling them.

Usage:  python tools/issue_slot_audit.py [--order 64] [--pack 2]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

# One packed vreg row: the per-element math is shape-independent.
ROWS, W = 8, 128

# Per-element issue-slot weights for vector primitives.  Elementwise ALU
# ops are 1 slot; divides/rsqrt/log expand to multi-op sequences on the
# VPU (no hardware divide); integer<->float converts and selects are 1.
_WEIGHTS = {
    "add": 1, "sub": 1, "mul": 1, "max": 1, "min": 1, "neg": 1, "abs": 1,
    "and": 1, "or": 1, "xor": 1, "shift_left": 1,
    "shift_right_logical": 1, "shift_right_arithmetic": 1,
    "lt": 1, "le": 1, "gt": 1, "ge": 1, "eq": 1, "ne": 1,
    "select_n": 1, "convert_element_type": 1, "round": 1, "floor": 1,
    "sign": 1, "is_finite": 1, "not": 1,
    "clamp": 2,  # two compares/selects
    "div": 6,  # reciprocal NR (~5) + multiply
    "sqrt": 4, "rsqrt": 4,
    "log": 12,  # range reduction + degree-~7 polynomial
    "exp": 10,
    "integer_pow": 1,
    "rem": 8,
}
_FREE = {
    "broadcast_in_dim", "reshape", "squeeze", "concatenate", "slice",
    "transpose", "copy", "stop_gradient", "iota", "bitcast_convert_type",
    "reduce_sum", "reduce_max",  # tree reductions amortize over the tile
    "dot_general",  # MXU, not VPU issue slots
    "pjit", "closed_call", "custom_jvp_call", "custom_vjp_call",
}


def _count(jaxpr, mul=1.0):
    total = 0.0
    for eqn in jaxpr.eqns:
        name = eqn.primitive.name
        if name in ("jit", "pjit", "closed_call", "custom_jvp_call", "custom_vjp_call"):
            inner = eqn.params.get("jaxpr")
            if inner is not None:
                total += _count(inner.jaxpr if hasattr(inner, "jaxpr") else inner, mul)
            continue
        if name in _FREE:
            continue
        w = _WEIGHTS.get(name)
        if w is None:
            print(f"  [unweighted primitive: {name} -> 1 slot]")
            w = 1
        # scale by output size relative to one (ROWS, W) plane element count
        try:
            sz = int(np.prod(eqn.outvars[0].aval.shape)) or 1
        except Exception:
            sz = ROWS * W
        total += w * sz / (ROWS * W) * mul
    return total


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--order", type=int, default=64)
    ap.add_argument("--pack", type=int, default=2, help="symbols per plane row (headline: 2)")
    ap.add_argument("--mhz", type=float, default=940.0, help="VPU clock")
    ap.add_argument("--alus", type=int, default=4, help="VPU ALUs (v5e: 4)")
    ap.add_argument(
        "--measured-ps-per-bin", type=float, default=33.5,
        help="measured marginal wall cost per (bin, symbol) element "
        "(headline 466M syms/s x 64 bins packed -> ~33.5 ps/bin)",
    )
    args = ap.parse_args()

    from ofdm_tpu.config import EqualizationMethod
    from ofdm_tpu.ops import pallas_link as pk

    spec = pk._Spec(
        tiles=1, tile=ROWS, conv="diag", fold=True, ctaps=0, ext=0, n=W,
        L=0, is_sc=False, mode="qam", order=args.order, is_gray=True,
        bits=int(np.log2(args.order)), passes=1, add_noise=True,
        method=EqualizationMethod.MMSE, interpret=True,
    )

    f32 = lambda: jnp.zeros((ROWS, W), jnp.float32)  # noqa: E731
    i32 = lambda: jnp.zeros((ROWS, W), jnp.int32)  # noqa: E731
    row = lambda: jnp.zeros((1, W), jnp.float32)  # noqa: E731

    stages = {}

    def enc(raw):
        return pk._encode_tile(spec, raw, None)

    stages["encode (idx->point)"] = jax.make_jaxpr(enc)(i32())

    def diag_mult(sr, si, hre, him):
        return sr * hre - si * him, sr * him + si * hre

    stages["channel diag mult"] = jax.make_jaxpr(diag_mult)(f32(), f32(), row(), row())

    def awgn(yr, yi, rbits, b2, snr_lin):
        mp_ = jnp.mean(yr * yr + yi * yi)
        sigma = jnp.sqrt(mp_ / snr_lin / 2.0)
        u1 = jnp.maximum(((rbits >> 8) & 0xFFFFFF).astype(jnp.float32) * pk._INV_2_24,
                         pk._INV_2_24)
        rad = jnp.sqrt(-2.0 * jnp.log(u1))
        co, si_ = pk._cossin_u24((b2 >> 8) & 0xFFFFFF)
        return yr + sigma * rad * co, yi + sigma * rad * si_

    stages["AWGN (BoxMuller+trig)"] = jax.make_jaxpr(awgn)(
        f32(), f32(), i32(), i32(), jnp.float32(1e3)
    )
    # + 2 PRNG word draws per element (VPU PRNG port), counted separately.
    prng_words = {"encode (idx->point)": 1.0, "AWGN (BoxMuller+trig)": 2.0}

    def mmse(fr, fi, hre, him, habs2, sp, snr_lin, cg):
        nv = sp / snr_lin / cg
        g = np.float32(0.5 / pk._qam_geometry(spec.order)[2]) / (habs2 + nv)
        return (fr * hre + fi * him) * g, (fi * hre - fr * him) * g

    stages["MMSE equalize (+slicer fold)"] = jax.make_jaxpr(mmse)(
        f32(), f32(), row(), row(), row(), f32(), jnp.float32(1e3), jnp.float32(1.0)
    )

    def demap(er, ei):
        return pk._demap_tile(spec, er, ei, None)

    stages["demap (grid slicer+invgray)"] = jax.make_jaxpr(demap)(f32(), f32())

    def count(tx, rx):
        x = tx ^ rx
        t = x - ((x >> 1) & 0x5555)
        t = (t & 0x3333) + ((t >> 2) & 0x3333)
        t = (t + (t >> 4)) & 0x0F0F
        berr = jnp.sum(t.astype(jnp.float32))
        serr = jnp.sum((x != 0).astype(jnp.float32))
        return berr, serr

    stages["xor+popcount+reduce"] = jax.make_jaxpr(count)(i32(), i32())

    peak_ops_per_s = args.mhz * 1e6 * 8 * 128 * args.alus
    ps_per_op = 1e12 / peak_ops_per_s

    total = 0.0
    print(f"{'stage':36s} {'ops/elem':>9s} {'ps/bin @peak':>13s}")
    for name, jx in stages.items():
        ops = _count(jx.jaxpr) + prng_words.get(name, 0.0)
        total += ops
        print(f"{name:36s} {ops:9.1f} {ops * ps_per_op:13.2f}")
    print("-" * 62)
    print(f"{'TOTAL':36s} {total:9.1f} {total * ps_per_op:13.2f}")
    print(
        f"\nVPU peak: {peak_ops_per_s/1e12:.2f}T elem-ops/s "
        f"({args.alus} ALUs x (8,128) @ {args.mhz:.0f} MHz) -> {ps_per_op:.3f} ps/op"
    )
    meas = args.measured_ps_per_bin
    print(
        f"measured marginal: {meas:.1f} ps/bin -> issue-slot utilization "
        f"~{100.0 * total * ps_per_op / meas:.0f}% of peak"
    )


if __name__ == "__main__":
    main()
