"""Planar complex arrays + engine dispatch for TPU-portable complex DSP.

TPU compilers vary in native complex support (the backend available here
supports f32/int ops and MXU matmuls but not complex dtypes, FFT custom
calls, gathers, or argmin/argmax).  The hot path therefore runs on a
*planar* representation: a :class:`CArray` pytree of separate float32
real/imag planes.  All complex arithmetic expands to VPU-friendly real ops,
and the DFT becomes MXU matmuls (ofdm_tpu.ops.dft).

Every op in this module dispatches on the array type, so the same pipeline
code runs with either native complex arrays (CPU/GPU, used for reference
parity tests) or CArray (TPU hot path).

Precision note: the MXU multiplies in bf16.  Exact-enough f32 matmuls use a
3-pass bf16 split (``dot3``); this backend also *elides* f32->bf16->f32
convert pairs unless an optimization barrier pins the bf16 value, hence the
barrier inside :func:`split_bf16`.
"""

from __future__ import annotations

import dataclasses
from typing import Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass(frozen=True)
class CArray:
    """Complex array as separate real/imag planes (same shape & dtype)."""

    re: jnp.ndarray
    im: jnp.ndarray

    # -- pytree ------------------------------------------------------------
    def tree_flatten(self):
        return (self.re, self.im), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)

    # -- shape -------------------------------------------------------------
    @property
    def shape(self):
        return self.re.shape

    @property
    def ndim(self):
        return self.re.ndim

    @property
    def size(self):
        return self.re.size

    def reshape(self, *shape) -> "CArray":
        return CArray(self.re.reshape(*shape), self.im.reshape(*shape))

    def __getitem__(self, idx) -> "CArray":
        return CArray(self.re[idx], self.im[idx])

    # -- arithmetic ---------------------------------------------------------
    def __add__(self, other):
        if isinstance(other, CArray):
            return CArray(self.re + other.re, self.im + other.im)
        return CArray(self.re + other, self.im)

    def __sub__(self, other):
        if isinstance(other, CArray):
            return CArray(self.re - other.re, self.im - other.im)
        return CArray(self.re - other, self.im)

    def __mul__(self, other):
        if isinstance(other, CArray):
            return CArray(
                self.re * other.re - self.im * other.im,
                self.re * other.im + self.im * other.re,
            )
        return CArray(self.re * other, self.im * other)  # real scalar/array

    def __rmul__(self, other):
        return self.__mul__(other)

    def __truediv__(self, other):
        if isinstance(other, CArray):
            d = other.abs2()
            return CArray(
                (self.re * other.re + self.im * other.im) / d,
                (self.im * other.re - self.re * other.im) / d,
            )
        return CArray(self.re / other, self.im / other)

    def conj(self) -> "CArray":
        return CArray(self.re, -self.im)

    def abs2(self) -> jnp.ndarray:
        return self.re * self.re + self.im * self.im


Complexish = Union[jnp.ndarray, CArray]


# ---------------------------------------------------------------------------
# Constructors / conversion
# ---------------------------------------------------------------------------


def from_complex(x, dtype=jnp.float32) -> CArray:
    """Host numpy/jnp complex array -> CArray."""
    x = np.asarray(x)
    return CArray(jnp.asarray(x.real, dtype), jnp.asarray(x.imag, dtype))


def to_numpy(x: Complexish) -> np.ndarray:
    if isinstance(x, CArray):
        return np.asarray(x.re) + 1j * np.asarray(x.im)
    return np.asarray(x)


def is_planar(x) -> bool:
    return isinstance(x, CArray)


# ---------------------------------------------------------------------------
# Generic ops used by the pipeline (dispatch on type)
# ---------------------------------------------------------------------------


def real(x: Complexish) -> jnp.ndarray:
    return x.re if isinstance(x, CArray) else jnp.real(x)


def imag(x: Complexish) -> jnp.ndarray:
    return x.im if isinstance(x, CArray) else jnp.imag(x)


def conj(x: Complexish) -> Complexish:
    return x.conj() if isinstance(x, CArray) else jnp.conj(x)


def abs2(x: Complexish) -> jnp.ndarray:
    if isinstance(x, CArray):
        return x.abs2()
    return jnp.real(x) ** 2 + jnp.imag(x) ** 2


def scale(x: Complexish, s: jnp.ndarray) -> Complexish:
    """Multiply by a real scalar/array."""
    if isinstance(x, CArray):
        return CArray(x.re * s, x.im * s)
    return x * s.astype(x.dtype) if hasattr(s, "astype") else x * s


def where(mask: jnp.ndarray, a: Complexish, b: Complexish) -> Complexish:
    if isinstance(a, CArray):
        return CArray(jnp.where(mask, a.re, b.re), jnp.where(mask, a.im, b.im))
    return jnp.where(mask, a, b)


def zeros(shape, like: Complexish) -> Complexish:
    if isinstance(like, CArray):
        return CArray(
            jnp.zeros(shape, like.re.dtype), jnp.zeros(shape, like.im.dtype)
        )
    return jnp.zeros(shape, like.dtype)


def concat(xs, axis: int) -> Complexish:
    if isinstance(xs[0], CArray):
        return CArray(
            jnp.concatenate([x.re for x in xs], axis=axis),
            jnp.concatenate([x.im for x in xs], axis=axis),
        )
    return jnp.concatenate(xs, axis=axis)


def pad_last(x: Complexish, before: int, after: int) -> Complexish:
    pad = [(0, 0)] * (x.ndim - 1) + [(before, after)]
    if isinstance(x, CArray):
        return CArray(jnp.pad(x.re, pad), jnp.pad(x.im, pad))
    return jnp.pad(x, pad)


def at_add(x: Complexish, idx, value: Complexish) -> Complexish:
    if isinstance(x, CArray):
        return CArray(x.re.at[idx].add(value.re), x.im.at[idx].add(value.im))
    return x.at[idx].add(value)


def mean_abs2(x: Complexish, axis=None, keepdims=False) -> jnp.ndarray:
    return jnp.mean(abs2(x), axis=axis, keepdims=keepdims)


# ---------------------------------------------------------------------------
# Precise f32 matmul on bf16 MXUs
# ---------------------------------------------------------------------------


def split_bf16(a: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Split f32 into (bf16-representable hi, residual lo), hi + lo == a.

    The optimization barrier pins the bf16 intermediate: this backend
    otherwise elides the f32->bf16->f32 convert pair, collapsing lo to 0.
    """
    h16 = jax.lax.optimization_barrier(a.astype(jnp.bfloat16))
    hi = h16.astype(jnp.float32)
    return hi, a - hi


def dot3(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """~f32-accurate matmul from 3 bf16 MXU passes (drops the lo*lo term)."""
    ah, al = split_bf16(a)
    bh, bl = split_bf16(b)
    d = lambda p, q: jnp.dot(p, q, preferred_element_type=jnp.float32)  # noqa: E731
    return d(ah, bh) + (d(ah, bl) + d(al, bh))


def dot_precise(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Backend-adaptive precise matmul: plain dot where f32 MXU/FPU is exact
    (CPU/GPU), 3-pass bf16 split on TPU."""
    if jax.default_backend() in ("cpu", "gpu"):
        return jnp.dot(a, b, preferred_element_type=jnp.float32)
    return dot3(a, b)


def dot1(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Single bf16 MXU pass (~6e-3 rel err; exact f32 dot on CPU/GPU).

    The XLA analog of the fused kernel's ``matmul_passes=1`` mode: operands
    round to bf16 once, one MXU pass per real matmul.  bf16's relative
    rounding error is length-independent (error per term scales with the
    term), so the 0.07 decision-half-distance gate calibrated at 64
    subcarriers holds at any DFT length."""
    if jax.default_backend() in ("cpu", "gpu"):
        return jnp.dot(a, b, preferred_element_type=jnp.float32)
    return jnp.dot(
        a.astype(jnp.bfloat16), b.astype(jnp.bfloat16),
        preferred_element_type=jnp.float32,
    )


def matmul(x: Complexish, wr: jnp.ndarray, wi: jnp.ndarray, passes: int = 3) -> Complexish:
    """Complex matmul x @ (wr + i wi) with 3-multiplication Karatsuba.

    P1 = xr@wr, P2 = xi@wi, P3 = (xr+xi)@(wr+wi);
    yr = P1 - P2, yi = P3 - P1 - P2.

    ``passes`` selects the per-real-matmul numeric mode: 3 = bf16x3 split
    (f32-grade, default), 1 = single bf16 pass (3 MXU passes per complex
    matmul instead of 9; gated by SimulationConfig.matmul_passes).
    """
    xr, xi = (x.re, x.im) if isinstance(x, CArray) else (jnp.real(x), jnp.imag(x))
    d = dot1 if passes == 1 else dot_precise
    p1 = d(xr, wr)
    p2 = d(xi, wi)
    p3 = d(xr + xi, wr + wi)
    yr, yi = p1 - p2, p3 - p1 - p2
    if isinstance(x, CArray):
        return CArray(yr, yi)
    return (yr + 1j * yi).astype(x.dtype)
