"""Masked nearest-neighbour descriptor matching.

One generic kernel re-expresses every matching strategy of the reference
ORBmatcher (src/ORBmatcher.cc): SearchByProjection (:48,:477,:592,:2183),
SearchByBoW (:273,:827), SearchForInitialization (:710),
SearchForTriangulation (:969), Fuse (:1403,:1615). Each strategy differs only
in the CANDIDATE MASK (grid window, scale gate, epipolar gate, BoW-node
alignment) and its gates (TH_LOW/TH_HIGH, ratio test, rotation histogram) —
so the TPU design is: build a [N,M] boolean mask with vector ops, add it to
the MXU Hamming matrix as +inf, then do batched top-2/argmin + gating.

Constants mirror ORBmatcher.cc:40-42.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from .hamming import hamming_matrix

TH_LOW = 50
TH_HIGH = 100
HISTO_LENGTH = 30
BIG = 1 << 20  # "infinite" hamming distance


def masked_best2(dist, mask):
    """dist [N,M] int32, mask [N,M] bool (True=allowed) ->
    (best_idx [N], best [N], second [N]) where second is the best distance at
    a DIFFERENT pyramid-level-agnostic candidate (plain top-2 like the
    reference's bestDist/bestDist2 loops)."""
    d = jnp.where(mask, dist, BIG)
    best_idx = jnp.argmin(d, axis=1).astype(jnp.int32)
    best = jnp.take_along_axis(d, best_idx[:, None], axis=1)[:, 0]
    d2 = d.at[jnp.arange(d.shape[0]), best_idx].set(BIG)
    second = d2.min(axis=1)
    return best_idx, best, second


def masked_best2_idx(dist, mask):
    """Like masked_best2 but also returns the SECOND-best candidate index
    (for the reference's same-octave-only ratio test,
    SearchByProjection ORBmatcher.cc:130 bestLevel==bestLevel2)."""
    d = jnp.where(mask, dist, BIG)
    best_idx = jnp.argmin(d, axis=1).astype(jnp.int32)
    best = jnp.take_along_axis(d, best_idx[:, None], axis=1)[:, 0]
    d2 = d.at[jnp.arange(d.shape[0]), best_idx].set(BIG)
    second_idx = jnp.argmin(d2, axis=1).astype(jnp.int32)
    second = jnp.take_along_axis(d2, second_idx[:, None], axis=1)[:, 0]
    return best_idx, best, second_idx, second


def rotation_consistency(ang_a, ang_b_of_match, valid):
    """Keep only matches whose angle difference falls in the 3 most common
    of 30 bins (ref: ORBmatcher ComputeThreeMaxima + rotHist usage)."""
    diff = ang_a - ang_b_of_match
    two_pi = 2.0 * np.pi
    diff = jnp.mod(diff, two_pi)
    bins = jnp.clip((diff * (HISTO_LENGTH / two_pi)).astype(jnp.int32), 0, HISTO_LENGTH - 1)
    hist = jnp.zeros(HISTO_LENGTH, jnp.int32).at[bins].add(valid.astype(jnp.int32))
    counts, idxs = jax.lax.top_k(hist, 3)
    # reference drops bins 2,3 if < 0.1 * bin 1 (ComputeThreeMaxima)
    keep_bin = jnp.zeros(HISTO_LENGTH, jnp.bool_)
    keep_bin = keep_bin.at[idxs[0]].set(True)
    keep_bin = keep_bin.at[idxs[1]].set(counts[1].astype(jnp.float32) >= 0.1 * counts[0])
    keep_bin = keep_bin.at[idxs[2]].set(counts[2].astype(jnp.float32) >= 0.1 * counts[0])
    return valid & keep_bin[bins]


def resolve_duplicates(match_idx, best, valid, m_size: int):
    """Enforce one-to-one: if several rows matched the same column, keep the
    lowest distance (ref: e.g. ORBmatcher.cc:477 vnMatches21 bookkeeping)."""
    col = jnp.where(valid, match_idx, m_size)
    col_best = jnp.full((m_size + 1,), BIG, best.dtype).at[col].min(best)
    is_winner = valid & (best <= col_best[col])
    # among equal-distance winners keep the first row
    row_ids = jnp.arange(match_idx.shape[0], dtype=jnp.int32)
    col_winner_row = (
        jnp.full((m_size + 1,), 1 << 30, jnp.int32)
        .at[jnp.where(is_winner, col, m_size)]
        .min(jnp.where(is_winner, row_ids, 1 << 30))
    )
    final = is_winner & (col_winner_row[col] == row_ids)
    return jnp.where(final, match_idx, -1), final


def unpack_mask(packed, m: int):
    """Device-side unpack of a bit-packed boolean mask: [N, ceil(M/8)] u8
    (numpy packbits, bitorder='little') -> [N, M] bool.

    Host->device mask transfer is the dominant cost of the mapping-side
    matcher calls through a tunneled backend (round-4 profile: the fuse
    step's [T*N, P] dense bool mask was ~30 MB per keyframe at ~50 MB/s);
    packing cuts the payload 8x for one cheap device-side shift."""
    bits = (packed[:, :, None] >> jnp.arange(8, dtype=jnp.uint8)) & 1
    return bits.reshape(packed.shape[0], -1)[:, :m].astype(jnp.bool_)


@functools.partial(
    jax.jit,
    static_argnames=("max_dist", "nn_ratio", "use_rot", "one_to_one",
                     "ratio_same_octave", "packed_mask"),
)
def _match_core(bits_a, bits_b, mask, ang_a, ang_b, max_dist, nn_ratio,
                use_rot, one_to_one, oct_b=None,
                ratio_same_octave: bool = False, packed_mask: bool = False):
    if packed_mask:
        mask = unpack_mask(mask, bits_b.shape[0])
    dist = hamming_matrix(bits_a, bits_b)
    if ratio_same_octave and nn_ratio is not None:
        # ref SearchByProjection (ORBmatcher.cc:130): the ratio test only
        # applies when best and second-best live on the SAME pyramid level
        idx, best, idx2, second = masked_best2_idx(dist, mask)
        same_oct = jnp.take(oct_b, idx) == jnp.take(oct_b, idx2)
        ratio_ok = (~same_oct) | (
            best.astype(jnp.float32) < nn_ratio * second.astype(jnp.float32))
        valid = (best <= max_dist) & ratio_ok
    else:
        idx, best, second = masked_best2(dist, mask)
        valid = best <= max_dist
        if nn_ratio is not None:
            valid = valid & (
                best.astype(jnp.float32) < nn_ratio * second.astype(jnp.float32))
    if use_rot:
        ang_match = jnp.take(ang_b, idx)
        valid = rotation_consistency(ang_a, ang_match, valid)
    if one_to_one:
        idx, valid = resolve_duplicates(idx, best, valid, bits_b.shape[0])
    return jnp.where(valid, idx, -1), jnp.where(valid, best, BIG)


def match(
    bits_a,
    bits_b,
    mask,
    max_dist: int = TH_LOW,
    nn_ratio: float | None = None,
    ang_a=None,
    ang_b=None,
    one_to_one: bool = True,
    oct_b=None,
    ratio_same_octave: bool = False,
    packed_mask: bool = False,
):
    """Generic masked matcher (jit'd; one compiled program per shape bucket
    and flag combination).

    ratio_same_octave: apply nn_ratio only when best and second-best are on
    the same pyramid level of B (requires oct_b; ref ORBmatcher.cc:130).
    packed_mask: mask is [N, M/8] u8 bit-packed (little bit order), unpacked
    on device (8x smaller host->device transfer).
    Returns (match_idx [N] int32 into B or -1, dist [N] int32).
    """
    use_rot = ang_a is not None
    if not use_rot:
        ang_a = jnp.zeros(bits_a.shape[0], jnp.float32)
        ang_b = jnp.zeros(bits_b.shape[0], jnp.float32)
    if oct_b is None:
        oct_b = jnp.zeros(bits_b.shape[0], jnp.int32)
    return _match_core(
        bits_a, bits_b, mask, ang_a, ang_b, int(max_dist),
        None if nn_ratio is None else float(nn_ratio), use_rot, one_to_one,
        oct_b=oct_b, ratio_same_octave=bool(ratio_same_octave),
        packed_mask=bool(packed_mask),
    )


def match_padded(bits_a, bits_b, mask, ang_a=None, ang_b=None, oct_b=None,
                 **kw):
    """Numpy-facing matcher that pads both sides to shape buckets so the
    frame loop reuses a handful of compiled programs. All inputs numpy.
    The mask ships bit-packed (see unpack_mask)."""
    from ..utils.pad import bucket, pad_to

    n, m = len(bits_a), len(bits_b)
    nb, mb = bucket(n), bucket(m)
    mask_p = np.zeros((nb, mb), bool)
    mask_p[:n, :m] = np.asarray(mask)
    packed = np.packbits(mask_p, axis=1, bitorder="little")
    bits_a = pad_to(np.asarray(bits_a), nb)
    bits_b = pad_to(np.asarray(bits_b), mb)
    if ang_a is not None:
        ang_a = jnp.asarray(pad_to(np.asarray(ang_a, np.float32), nb))
        ang_b = jnp.asarray(pad_to(np.asarray(ang_b, np.float32), mb))
    if oct_b is not None:
        oct_b = jnp.asarray(pad_to(np.asarray(oct_b, np.int32), mb))
    midx, dist = match(
        jnp.asarray(bits_a), jnp.asarray(bits_b), jnp.asarray(packed),
        ang_a=ang_a, ang_b=ang_b, oct_b=oct_b, packed_mask=True, **kw,
    )
    return np.asarray(midx)[:n], np.asarray(dist)[:n]


# ---------------------------------------------------------------------------
# Mask builders (vector ops only; combine freely with &)
# ---------------------------------------------------------------------------


def window_mask(xy_a_pred, xy_b, radius):
    """|proj(a) - kp_b|_inf within radius. xy_a_pred [N,2], xy_b [M,2],
    radius scalar or [N] -> [N,M]."""
    r = jnp.asarray(radius)
    if r.ndim == 1:
        r = r[:, None]
    dx = jnp.abs(xy_a_pred[:, None, 0] - xy_b[None, :, 0])
    dy = jnp.abs(xy_a_pred[:, None, 1] - xy_b[None, :, 1])
    return (dx <= r) & (dy <= r)


def level_mask(pred_level, octave_b, lo_off: int = 0, hi_off: int = 1):
    """Scale gate: octave_b in [pred-lo_off, pred+hi_off]
    (ref: SearchByProjection nPredictedLevel gating ORBmatcher.cc:90-95)."""
    pl = pred_level[:, None]
    ob = octave_b[None, :]
    return (ob >= pl - lo_off) & (ob <= pl + hi_off)


def epipolar_mask(xy_b, F12_lines, octave_b, level_sigma2, threshold: float = 3.84):
    """Distance of kp_b to epipolar line of kp_a under F12.
    F12_lines [N,3] = (a,b,c) line coeffs for each a-feature; xy_b [M,2].
    (ref: CheckDistEpipolarLine ORBmatcher.cc:229 — 3.84 chi2 1dof)."""
    num = (
        F12_lines[:, None, 0] * xy_b[None, :, 0]
        + F12_lines[:, None, 1] * xy_b[None, :, 1]
        + F12_lines[:, None, 2]
    )
    den2 = F12_lines[:, 0] ** 2 + F12_lines[:, 1] ** 2
    d2 = num * num / jnp.maximum(den2[:, None], 1e-12)
    sigma2 = jnp.take(jnp.asarray(level_sigma2), octave_b)
    return d2 < threshold * sigma2[None, :]


def node_mask(nodes_a, nodes_b):
    """BoW FeatureVector alignment: same vocabulary node id
    (ref: SearchByBoW node-aligned loops ORBmatcher.cc:289-297)."""
    return nodes_a[:, None] == nodes_b[None, :]


# ------------------------- numpy mask builders (host-side, for match_padded)


def window_mask_np(xy_a_pred, xy_b, radius):
    r = np.asarray(radius)
    if r.ndim == 1:
        r = r[:, None]
    dx = np.abs(xy_a_pred[:, None, 0] - xy_b[None, :, 0])
    dy = np.abs(xy_a_pred[:, None, 1] - xy_b[None, :, 1])
    return (dx <= r) & (dy <= r)


def level_mask_np(pred_level, octave_b, lo_off=0, hi_off=1):
    pl = np.asarray(pred_level)[:, None]
    ob = np.asarray(octave_b)[None, :]
    return (ob >= pl - lo_off) & (ob <= pl + hi_off)


def epipolar_mask_np(xy_b, lines, octave_b, level_sigma2, threshold=3.84):
    num = (
        lines[:, None, 0] * xy_b[None, :, 0]
        + lines[:, None, 1] * xy_b[None, :, 1]
        + lines[:, None, 2]
    )
    den2 = lines[:, 0] ** 2 + lines[:, 1] ** 2
    d2 = num * num / np.maximum(den2[:, None], 1e-12)
    sigma2 = np.asarray(level_sigma2)[np.asarray(octave_b)]
    return d2 < threshold * sigma2[None, :]
