"""Power allocation: uniform & waterfilling, plus Shannon-capacity helpers.

Two implementations of waterfilling:
  * :func:`waterfilling` — host NumPy float64, bisection with the reference's
    exact bounds/tolerance/renormalization (power_allocation/models.py:140-225).
    Used at setup time so water levels and adaptive order selections match the
    reference bit-for-bit (SURVEY §7.3 float discipline).
  * :func:`waterfilling_jax` — fixed-iteration bisection, jit/vmap-able for
    batched on-device grids of channel realizations / noise profiles
    (SURVEY §3.4 note).

Reference quirks preserved:
  * the floor is N0 / (|H|^2 * N) — note the extra factor of the number of
    subcarriers in the denominator (power_allocation/models.py:161);
  * binary search on sum(max(0, mu - floor)) with bounds
    [0, P_total + max(floor)], <=100 iterations, tol 1e-8 (:178-225);
  * exact budget renormalization afterwards (:170-176).
"""

from __future__ import annotations

from typing import Dict

import jax.numpy as jnp
import numpy as np
from numpy.typing import NDArray


def uniform(total_power: float, num_subcarriers: int) -> NDArray[np.float64]:
    """Equal power per subcarrier (power_allocation/models.py:31-69)."""
    if total_power < 0:
        raise ValueError(f"Total power must be non-negative, got {total_power}")
    if num_subcarriers <= 0:
        raise ValueError(f"Number of subcarriers must be positive, got {num_subcarriers}")
    return np.full(num_subcarriers, total_power / num_subcarriers, dtype=np.float64)


def waterfilling(
    total_power: float,
    channel_gains: NDArray[np.float64],
    noise_power: float,
    tolerance: float = 1e-8,
    max_iterations: int = 100,
) -> NDArray[np.float64]:
    """Waterfilling allocation (host float64, exact reference semantics)."""
    channel_gains = np.asarray(channel_gains, dtype=np.float64)
    if total_power < 0:
        raise ValueError(f"Total power must be non-negative, got {total_power}")
    if noise_power < 0:
        raise ValueError(f"Noise power must be non-negative, got {noise_power}")
    if channel_gains.size == 0:
        raise ValueError("Channel gains array cannot be empty")
    if np.any(channel_gains <= 0):
        raise ValueError("All channel gains must be positive")

    floor = noise_power / (channel_gains * len(channel_gains))

    mu_min, mu_max = 0.0, total_power + float(np.max(floor))
    mu = (mu_min + mu_max) / 2
    for _ in range(max_iterations):
        mu = (mu_min + mu_max) / 2
        power_sum = float(np.sum(np.maximum(0.0, mu - floor)))
        if abs(power_sum - total_power) < tolerance:
            break
        if power_sum < total_power:
            mu_min = mu
        else:
            mu_max = mu

    power = np.maximum(0.0, mu - floor)
    s = power.sum()
    if s > 0:
        power = power * (total_power / s)
    return power


def water_level(
    power: NDArray[np.float64],
    channel_gains: NDArray[np.float64],
    noise_power: float,
) -> float:
    """Reported water level = mean(P + N0/|H|^2) over active subcarriers.

    Matches simulation/models.py:310-313 (note: *without* the extra 1/N factor
    used inside the allocator's floor).
    """
    floor = noise_power / np.asarray(channel_gains, dtype=np.float64)
    lvl = power + floor
    active = power > 1e-10
    return float(np.mean(lvl[active])) if np.any(active) else float("nan")


def waterfilling_jax(
    total_power: jnp.ndarray | float,
    channel_gains: jnp.ndarray,
    noise_power: jnp.ndarray | float,
    num_iterations: int = 64,
) -> jnp.ndarray:
    """Fixed-iteration bisection waterfilling — jit/vmap-able over grids."""
    gains = channel_gains.astype(jnp.float32)
    n = gains.shape[-1]
    floor = noise_power / (gains * n)
    mu_min = jnp.zeros(floor.shape[:-1], floor.dtype)
    mu_max = total_power + jnp.max(floor, axis=-1)

    def body(_, mm):
        lo, hi = mm
        mu = (lo + hi) / 2
        psum = jnp.sum(jnp.maximum(0.0, mu[..., None] - floor), axis=-1)
        too_low = psum < total_power
        return jnp.where(too_low, mu, lo), jnp.where(too_low, hi, mu)

    import jax.lax as lax

    mu_min, mu_max = lax.fori_loop(0, num_iterations, body, (mu_min, mu_max))
    mu = (mu_min + mu_max) / 2
    power = jnp.maximum(0.0, mu[..., None] - floor)
    s = jnp.sum(power, axis=-1, keepdims=True)
    return jnp.where(s > 0, power * (total_power / s), power)


# ---------------------------------------------------------------------------
# Capacity helpers (power_allocation/models.py:228-334)
# ---------------------------------------------------------------------------


def capacity(
    power: NDArray[np.float64],
    channel_gains: NDArray[np.float64],
    noise_power: float,
) -> float:
    """Shannon capacity C = sum(log2(1 + P|H|^2/N0 + 1e-12)) bits/use."""
    snr = np.asarray(power) * np.asarray(channel_gains) / noise_power
    return float(np.sum(np.log2(1.0 + snr + 1e-12)))


def capacity_per_subcarrier(
    power: NDArray[np.float64],
    channel_gains: NDArray[np.float64],
    noise_power: float,
) -> NDArray[np.float64]:
    snr = np.asarray(power) * np.asarray(channel_gains) / noise_power
    return np.log2(1.0 + snr + 1e-12)


def compare_allocations(
    uniform_power: NDArray[np.float64],
    waterfilling_power: NDArray[np.float64],
    channel_gains: NDArray[np.float64],
    noise_power: float,
) -> Dict[str, float]:
    cap_u = capacity(uniform_power, channel_gains, noise_power)
    cap_w = capacity(waterfilling_power, channel_gains, noise_power)
    return {
        "uniform_capacity": cap_u,
        "waterfilling_capacity": cap_w,
        "capacity_gain": cap_w - cap_u,
        "capacity_gain_percent": 100 * (cap_w - cap_u) / cap_u if cap_u > 0 else 0.0,
    }
