"""Hardware-only statistical tests for the Pallas PRNG/noise path.

The Mosaic interpreter used by CPU CI emulates `prng_random_bits` as zeros,
so the Box-Muller samplers are numerically exercised ONLY on real TPU
hardware (VERDICT r1 item 8: previously pinned solely by bench.py's BER
gate).  These tests run the noise generators on the axon TPU in a
subprocess (tests/conftest.py forces the in-process backend to CPU) and
moment-test the draws: mean, variance, cross-correlation, and 3-sigma tail
mass over 2^24 samples.

Opt-in: set OFDM_TPU_TPU_TESTS=1 (the relay backend is slow to compile and
occasionally wedges; CPU CI must not block on it).

    OFDM_TPU_TPU_TESTS=1 python -m pytest tests/test_tpu_hardware.py -v
"""

import json
import os
import subprocess
import sys

import pytest

pytestmark = [
    pytest.mark.tpu,
    pytest.mark.skipif(
        os.environ.get("OFDM_TPU_TPU_TESTS") != "1",
        reason="TPU hardware tests are opt-in (OFDM_TPU_TPU_TESTS=1)",
    ),
]

_MOMENTS_SCRIPT = r"""
import json, sys
sys.path.insert(0, {repo!r})
import jax
import jax.numpy as jnp
import numpy as np

N = 1 << 24
SHAPE = (N // 128, 128)

def moments(z0, z1):
    z0 = z0.astype(jnp.float32).reshape(-1)
    z1 = z1.astype(jnp.float32).reshape(-1)
    out = {{}}
    for name, z in (("z0", z0), ("z1", z1)):
        out[name] = dict(
            mean=float(jnp.mean(z)),
            var=float(jnp.var(z)),
            tail3=float(jnp.mean((jnp.abs(z) > 3.0).astype(jnp.float32))),
            amax=float(jnp.max(jnp.abs(z))),
        )
    out["corr"] = float(jnp.mean(z0 * z1))
    return out

from ofdm_tpu.ops import prng
key = jax.random.PRNGKey(42)
z0, z1 = jax.jit(lambda k: prng.normal_planes(k, SHAPE))(key)
res = {{"normal_planes": moments(z0, z1)}}

# The fused link kernel's AWGN variant: Box-Muller phase from the
# quarter-range polynomial pair (ops/pallas_link._cossin_u24) — reproduced
# in a minimal kernel so a regression there is caught without a full bench
# run.
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
from ofdm_tpu.ops.pallas_link import _cossin_u24
_INV = float(1.0 / 16777216.0)

def kern(seed_ref, z0_ref, z1_ref):
    # Per-block seed mix (same Weyl constant as ops/prng._mix) so every grid
    # step draws an independent stream.
    pltpu.prng_seed(seed_ref[0] + pl.program_id(0) * jnp.int32(-1640531527),
                    seed_ref[1])
    rbits = pltpu.bitcast(pltpu.prng_random_bits(z0_ref.shape), jnp.int32)
    u1 = jnp.maximum(((rbits >> 8) & 0xFFFFFF).astype(jnp.float32) * _INV, _INV)
    b2 = pltpu.bitcast(pltpu.prng_random_bits(z0_ref.shape), jnp.int32)
    rad = jnp.sqrt(-2.0 * jnp.log(u1))
    co, si = _cossin_u24((b2 >> 8) & 0xFFFFFF)
    z0_ref[:] = rad * co
    z1_ref[:] = rad * si

BLK = 2048  # rows per grid step: 2 x (BLK,128) f32 outputs = 2 MB VMEM
z0, z1 = pl.pallas_call(
    kern,
    grid=(SHAPE[0] // BLK,),
    in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)],
    out_specs=(pl.BlockSpec((BLK, 128), lambda i: (i, 0)),) * 2,
    out_shape=(jax.ShapeDtypeStruct(SHAPE, jnp.float32),) * 2,
)(jnp.asarray([123, 456], jnp.int32))
res["polyphase_bm"] = moments(z0, z1)
print(json.dumps(res))
"""


def _run_on_tpu(script: str) -> dict:
    env = {k: v for k, v in os.environ.items() if k != "JAX_PLATFORMS"}
    env.pop("XLA_FLAGS", None)
    # conftest exports JAX_ENABLE_X64=1 for CPU parity tests; on the TPU
    # backend x64 mode makes scalar ints i64, which Mosaic cannot lower
    # ("failed to legalize func.return (i64)").
    env["JAX_ENABLE_X64"] = "0"
    proc = subprocess.run(
        [sys.executable, "-c", script],
        capture_output=True,
        text=True,
        timeout=560,
        env=env,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    return json.loads(proc.stdout.strip().splitlines()[-1])


def test_noise_path_moments_on_hardware():
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    res = _run_on_tpu(_MOMENTS_SCRIPT.format(repo=repo))
    # N = 2^24: sigma(mean)=2.4e-4, sigma(var)~3.5e-4, sigma(tail3)=1.3e-5.
    for variant in ("normal_planes", "polyphase_bm"):
        m = res[variant]
        for plane in ("z0", "z1"):
            assert abs(m[plane]["mean"]) < 1.5e-3, (variant, plane, m)
            assert abs(m[plane]["var"] - 1.0) < 4e-3, (variant, plane, m)
            assert 0.00255 <= m[plane]["tail3"] <= 0.00285, (variant, plane, m)
            # 24-bit u1 caps the radius at sqrt(-2 ln 2^-24) = 5.77.
            assert 4.0 < m[plane]["amax"] <= 5.78, (variant, plane, m)
        assert abs(m["corr"]) < 2e-3, (variant, m)


_PACK_BER_SCRIPT = r"""
import json, sys
sys.path.insert(0, {repo!r})
import jax
import jax.numpy as jnp

from ofdm_tpu.config import SimulationConfig
from ofdm_tpu.pipeline import LinkRunner, prepare
from ofdm_tpu.ops import pallas_link

cfg = SimulationConfig(
    num_symbols=64 * (1 << 22),
    num_subcarriers=64,
    constellation_order=64,
    channel_type="CUSTOM",
    channel_model="Lin-Phoong_P2",
    prefix_type="CYCLIC",
    prefix_length_ratio=1.0,
    equalization_method="MMSE",
    snr_db=30.0,
    symbols_per_chunk=1 << 17,
)
runner = LinkRunner(prepare(cfg))
key = jax.random.PRNGKey(7)
n_chunk = 1 << 17

out = {{}}
for label, force_pack in (("packed", None), ("unpacked", 1)):
    lifted = pallas_link.make_pallas_chunk_lifted(runner, n_chunk, False)
    fn, consts, spec = lifted
    if force_pack is not None:
        spec = spec._replace(pack=force_pack)
        fn = pallas_link._fn_for_spec(spec)
        consts = pallas_link._consts_for(runner, spec)
    jfn = jax.jit(fn)
    carry = runner._init_carry()
    bits = errs = 0
    for c in range(32):
        stats, carry = jfn(
            jax.random.fold_in(key, c), carry, jnp.float32(30.0),
            jnp.ones(64, jnp.float32), consts,
        )
        errs += int(stats["bit_errors"])
        bits += n_chunk * 6
    out[label] = {{"pack": spec.pack, "errors": errs, "bits": bits}}
print(json.dumps(out))
"""


def test_packed_kernel_ber_matches_unpacked_on_hardware():
    """Under REAL hardware PRNG + AWGN, the packed kernel's BER equals the
    forced pack=1 kernel's within the Wilson interval at 25M bits — the
    lane-packed layout changes the PRNG stream consumption but not the
    statistics (interpret-mode CI only covers the zero-PRNG chain)."""
    from ofdm_tpu.ops import metrics

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    res = _run_on_tpu(_PACK_BER_SCRIPT.format(repo=repo))
    assert res["packed"]["pack"] > 1
    assert res["unpacked"]["pack"] == 1
    assert metrics.ber_equivalent(
        res["packed"]["errors"],
        res["packed"]["bits"],
        res["unpacked"]["errors"],
        res["unpacked"]["bits"],
    ), res
