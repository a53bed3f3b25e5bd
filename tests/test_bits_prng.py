"""Bit-source tests mirroring the reference bits_generation suite themes:
reproducibility with a seed, scale, distribution, pack/unpack semantics,
plus PRNG statistical sanity for the index/normal generators.
"""

import jax
import jax.numpy as jnp
import numpy as np

from ofdm_tpu.ops import bits as bitops
from ofdm_tpu.ops import prng


def test_random_bits_zero_one_only():
    b = np.asarray(bitops.random_bits(jax.random.PRNGKey(0), (10_000,)))
    assert set(np.unique(b)) <= {0, 1}


def test_random_bits_seeded_reproducibility():
    a = np.asarray(bitops.random_bits(jax.random.PRNGKey(7), (4096,)))
    b = np.asarray(bitops.random_bits(jax.random.PRNGKey(7), (4096,)))
    c = np.asarray(bitops.random_bits(jax.random.PRNGKey(8), (4096,)))
    np.testing.assert_array_equal(a, b)
    assert not np.array_equal(a, c)


def test_random_bits_balanced():
    """~50% ones (reference: statistical bit balance)."""
    b = np.asarray(bitops.random_bits(jax.random.PRNGKey(1), (1_000_000,)))
    assert abs(b.mean() - 0.5) < 0.002


def test_million_bit_scale():
    b = bitops.random_bits(jax.random.PRNGKey(2), (1_048_576,))
    assert b.shape == (1_048_576,)


def test_pack_unpack_round_trip():
    rng = np.random.RandomState(0)
    bits = jnp.asarray(rng.randint(0, 2, size=(3, 64)), jnp.uint8)
    packed = bitops.pack_bits(bits)
    assert packed.shape == (3, 8)
    np.testing.assert_array_equal(np.asarray(bitops.unpack_bits(packed)), np.asarray(bits))
    # MSB-first semantics (reference BytesIO convention).
    one_byte = bitops.pack_bits(jnp.asarray([1, 0, 0, 0, 0, 0, 0, 1], jnp.uint8))
    assert int(one_byte[0]) == 0b10000001


def test_pack_requires_multiple_of_8():
    import pytest

    with pytest.raises(ValueError):
        bitops.pack_bits(jnp.zeros(7, jnp.uint8))


def test_pack_matches_numpy_packbits():
    rng = np.random.RandomState(3)
    bits = rng.randint(0, 2, size=256).astype(np.uint8)
    ours = np.asarray(bitops.pack_bits(jnp.asarray(bits)))
    np.testing.assert_array_equal(ours, np.packbits(bits))


# ---------------------------------------------------------------------------
# PRNG statistical sanity (hot-path index/normal draws)
# ---------------------------------------------------------------------------


def test_uniform_indices_distribution():
    idx = np.asarray(
        prng.uniform_indices(jax.random.PRNGKey(0), (200_000,), np.uint32(63))
    )
    assert idx.min() >= 0 and idx.max() <= 63
    counts = np.bincount(idx, minlength=64)
    # Each of 64 values ~ 3125 +- 5 sigma.
    assert np.all(np.abs(counts - 200_000 / 64) < 5 * np.sqrt(200_000 / 64))


def test_uniform_indices_per_position_mask():
    mask = np.array([3, 15, 0, 63], dtype=np.uint32)
    idx = np.asarray(prng.uniform_indices(jax.random.PRNGKey(1), (1000, 4), mask))
    assert idx[:, 0].max() <= 3
    assert idx[:, 1].max() <= 15
    assert np.all(idx[:, 2] == 0)
    assert idx[:, 3].max() <= 63


def test_normal_planes_moments_and_independence():
    z0, z1 = prng.normal_planes(jax.random.PRNGKey(2), (500_000,))
    for z in (np.asarray(z0), np.asarray(z1)):
        assert abs(z.mean()) < 0.01
        assert abs(z.std() - 1.0) < 0.01
        # Kurtosis of a Gaussian is 3.
        assert abs(np.mean(((z - z.mean()) / z.std()) ** 4) - 3.0) < 0.1
    corr = np.corrcoef(np.asarray(z0), np.asarray(z1))[0, 1]
    assert abs(corr) < 0.01


def test_normal_planes_keyed_streams_differ():
    a, _ = prng.normal_planes(jax.random.PRNGKey(3), (1000,))
    b, _ = prng.normal_planes(jax.random.PRNGKey(4), (1000,))
    assert not np.allclose(np.asarray(a), np.asarray(b))
