"""Matching kernel tests: MXU Hamming identity vs brute force, masked
matching gates, duplicate resolution, rotation histogram."""

import numpy as np
import jax.numpy as jnp

from tpuslam.ops.hamming import hamming_matrix, hamming_packed, hamming_pairs, popcount_u32
from tpuslam.ops import match as M
from tpuslam.ops.orb import pack_bits


def rand_bits(rng, n):
    return (rng.rand(n, 256) > 0.5).astype(np.uint8)


def test_hamming_matrix_vs_bruteforce(rng):
    a, b = rand_bits(rng, 64), rand_bits(rng, 48)
    D = np.asarray(hamming_matrix(jnp.asarray(a), jnp.asarray(b)))
    ref = (a[:, None, :] != b[None, :, :]).sum(-1)
    np.testing.assert_array_equal(D, ref)


def test_hamming_packed_matches_matrix(rng):
    a, b = rand_bits(rng, 32), rand_bits(rng, 32)
    pa = jnp.asarray(np.asarray(pack_bits(jnp.asarray(a))))
    pb = jnp.asarray(np.asarray(pack_bits(jnp.asarray(b))))
    D1 = np.asarray(hamming_packed(pa, pb))
    D2 = np.asarray(hamming_matrix(jnp.asarray(a), jnp.asarray(b)))
    np.testing.assert_array_equal(D1, D2)


def test_popcount(rng):
    x = rng.randint(0, 2 ** 32, 1000, dtype=np.uint32)
    got = np.asarray(popcount_u32(jnp.asarray(x)))
    ref = np.array([bin(v).count("1") for v in x])
    np.testing.assert_array_equal(got, ref)


def test_hamming_pairs(rng):
    a, b = rand_bits(rng, 20), rand_bits(rng, 20)
    got = np.asarray(hamming_pairs(jnp.asarray(a), jnp.asarray(b)))
    np.testing.assert_array_equal(got, (a != b).sum(-1))


def test_match_exact_with_noise(rng):
    """B = permuted A with k flipped bits -> match recovers the permutation."""
    a = rand_bits(rng, 100)
    perm = rng.permutation(100)
    b = a[perm].copy()
    # flip 20 random bits in each b (within TH_LOW=50)
    for i in range(100):
        idx = rng.choice(256, 20, replace=False)
        b[i, idx] ^= 1
    mask = jnp.ones((100, 100), bool)
    midx, dist = M.match(jnp.asarray(a), jnp.asarray(b), mask, max_dist=50)
    midx = np.asarray(midx)
    inv = np.empty(100, int)
    inv[perm] = np.arange(100)
    assert (midx == inv).mean() > 0.95


def test_match_respects_mask(rng):
    a = rand_bits(rng, 10)
    b = a.copy()  # identical
    mask = np.ones((10, 10), bool)
    mask[3, :] = False  # row 3 has no candidates
    midx, _ = M.match(jnp.asarray(a), jnp.asarray(b), jnp.asarray(mask))
    midx = np.asarray(midx)
    assert midx[3] == -1
    assert (midx[np.arange(10) != 3] == np.arange(10)[np.arange(10) != 3]).all()


def test_match_ratio_test(rng):
    a = rand_bits(rng, 4)
    # b0 close to a0 (5 flips), b1 also close to a0 (8 flips) -> ambiguous
    b = np.concatenate([a[0:1].copy(), a[0:1].copy(), rand_bits(rng, 2)], 0)
    b[0, :5] ^= 1
    b[1, :8] ^= 1
    mask = jnp.ones((4, 4), bool)
    midx, _ = M.match(jnp.asarray(a), jnp.asarray(b), mask, max_dist=50, nn_ratio=0.6)
    assert np.asarray(midx)[0] == -1  # 5 !< 0.6*8 -> rejected


def test_resolve_duplicates(rng):
    a = rand_bits(rng, 3)
    b = a[0:1].copy()  # single column; a1,a2 = near-duplicates of a0
    a[1] = a[0] ^ np.eye(256, dtype=np.uint8)[0][None] * 0  # same desc
    a[1, :3] ^= 1
    a[2, :6] ^= 1
    mask = jnp.ones((3, 1), bool)
    midx, _ = M.match(jnp.asarray(a), jnp.asarray(b), mask, max_dist=50)
    midx = np.asarray(midx)
    assert midx[0] == 0 and midx[1] == -1 and midx[2] == -1


def test_rotation_consistency(rng):
    n = 200
    valid = np.ones(n, bool)
    ang_a = rng.uniform(0, 2 * np.pi, n)
    ang_b = ang_a - 0.5  # consistent rotation of 0.5 rad
    out = np.asarray(
        M.rotation_consistency(jnp.asarray(ang_a), jnp.asarray(ang_b), jnp.asarray(valid))
    )
    assert out.mean() > 0.9
    # inconsistent outliers get dropped
    ang_b2 = ang_b.copy()
    ang_b2[:40] = rng.uniform(0, 2 * np.pi, 40) + ang_a[:40] + 1.7
    out2 = np.asarray(
        M.rotation_consistency(jnp.asarray(ang_a), jnp.asarray(ang_b2), jnp.asarray(valid))
    )
    assert out2[40:].mean() > 0.9
    assert out2[:40].mean() < 0.35


def test_window_and_level_masks():
    xy_pred = jnp.asarray([[10.0, 10.0], [50.0, 50.0]])
    xy_b = jnp.asarray([[12.0, 9.0], [48.0, 53.0], [100.0, 100.0]])
    w = np.asarray(M.window_mask(xy_pred, xy_b, 5.0))
    np.testing.assert_array_equal(w, [[True, False, False], [False, True, False]])
    lv = np.asarray(
        M.level_mask(jnp.asarray([2, 0]), jnp.asarray([1, 2, 5]), lo_off=1, hi_off=1)
    )
    np.testing.assert_array_equal(lv, [[True, True, False], [True, False, False]])
