"""ThroughputMeter / trace helper tests."""

import os

import pytest

from ofdm_tpu.utils.profiling import ThroughputMeter, trace


def test_throughput_meter_accumulates():
    m = ThroughputMeter()
    with m.section(ofdm_symbols=100, bits=600):
        pass
    with m.section(ofdm_symbols=50, bits=300):
        pass
    assert m.ofdm_symbols == 150
    assert m.bits == 900
    assert m.seconds > 0
    assert m.ofdm_symbols_per_s > 0
    rep = m.report(num_devices=2)
    assert "150" in rep and "Mbit/s" in rep


def test_throughput_meter_requires_start():
    m = ThroughputMeter()
    with pytest.raises(RuntimeError):
        m.stop(1, 1)


def test_trace_context(tmp_path):
    d = str(tmp_path / "trace")
    import jax
    import jax.numpy as jnp

    with trace(d):
        jax.jit(lambda x: x * 2)(jnp.ones(8)).block_until_ready()
    # The profiler wrote something under the log dir.
    assert os.path.isdir(d)
    assert any(os.scandir(d))
