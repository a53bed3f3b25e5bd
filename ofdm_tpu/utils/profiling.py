"""Tracing / profiling helpers (SURVEY §5 gap: the reference's only timing is
one perf_counter window, simulation/models.py:536-537,804-816).

Provides:
  * :func:`trace` — context manager around `jax.profiler` for TensorBoard
    traces of the hot path;
  * :class:`ThroughputMeter` — explicit OFDM-symbols/s and bits/s counters
    per run, with per-device rates on a mesh.
"""

from __future__ import annotations

import contextlib
import dataclasses
import time
from typing import Iterator, Optional

import jax


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/ofdm_tpu_trace") -> Iterator[None]:
    """Capture a jax.profiler trace around a block.

    View with TensorBoard's profile plugin or xprof.  Example:

        with profiling.trace("/tmp/trace"):
            runner.run(key)
    """
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


@dataclasses.dataclass
class ThroughputMeter:
    """Accumulates work counters across timed sections."""

    ofdm_symbols: int = 0
    bits: int = 0
    seconds: float = 0.0
    _t0: Optional[float] = None

    def start(self) -> None:
        self._t0 = time.perf_counter()

    def stop(self, ofdm_symbols: int, bits: int) -> None:
        if self._t0 is None:
            raise RuntimeError("stop() without start()")
        self.seconds += time.perf_counter() - self._t0
        self.ofdm_symbols += ofdm_symbols
        self.bits += bits
        self._t0 = None

    @contextlib.contextmanager
    def section(self, ofdm_symbols: int, bits: int) -> Iterator[None]:
        self.start()
        try:
            yield
        finally:
            self.stop(ofdm_symbols, bits)

    @property
    def ofdm_symbols_per_s(self) -> float:
        return self.ofdm_symbols / self.seconds if self.seconds else 0.0

    @property
    def bits_per_s(self) -> float:
        return self.bits / self.seconds if self.seconds else 0.0

    def report(self, num_devices: Optional[int] = None) -> str:
        n = num_devices or jax.device_count()
        return (
            f"{self.ofdm_symbols:,} OFDM symbols / {self.bits:,} bits in "
            f"{self.seconds:.3f}s -> {self.ofdm_symbols_per_s:,.0f} syms/s "
            f"({self.ofdm_symbols_per_s / n:,.0f}/device), "
            f"{self.bits_per_s / 1e6:,.1f} Mbit/s"
        )
