"""Serial <-> parallel framing (the reference's S/P "DSP block").

The reference exposes serial/parallel conversion as a component
(serial_parallel/models.py:5-21) — a validated reshape to ``(-1, streams)``
and back.  The TPU pipeline keeps data batched throughout, but the public
API exists for users porting manual pipelines; works on jnp/np arrays and
planar CArray alike.
"""

from __future__ import annotations

from ofdm_tpu.ops.cplx import Complexish


def to_parallel(data: Complexish, num_streams: int) -> Complexish:
    """1D stream -> (blocks, num_streams); validates divisibility."""
    if data.ndim != 1:
        raise ValueError("Input data must be a 1D array.")
    if num_streams <= 0:
        raise ValueError("Number of streams must be a positive integer.")
    if data.shape[0] % num_streams != 0:
        raise ValueError("Length of data must be divisible by number of streams.")
    return data.reshape(-1, num_streams)


def to_serial(data: Complexish) -> Complexish:
    """(blocks, num_streams) -> flat 1D stream."""
    if data.ndim != 2:
        raise ValueError("Input data must be a 2D array.")
    return data.reshape(-1)
