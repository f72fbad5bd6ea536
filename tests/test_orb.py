"""ORB front-end tests. cv2 is the golden reference for FAST only
(set-level parity, not bit-exactness — see SURVEY.md §7 hard parts)."""

import cv2
import numpy as np
import jax
import jax.numpy as jnp

from tpuslam.ops.fast import fast_score, nms3x3
from tpuslam.ops.orb import OrbExtractor, OrbConfig, pack_bits


def make_texture(rng, h=240, w=376):
    img = cv2.GaussianBlur(rng.randint(0, 255, (h, w)).astype(np.float32), (0, 0), 2.0)
    return ((img - img.min()) / np.ptp(img) * 255).astype(np.uint8)


def test_fast_finds_all_cv2_corners(rng):
    img = make_texture(rng)
    s = np.asarray(nms3x3(fast_score(jnp.asarray(img, jnp.float32))))
    ours = s > 20
    det = cv2.FastFeatureDetector_create(
        threshold=20, nonmaxSuppression=True, type=cv2.FastFeatureDetector_TYPE_9_16
    )
    kps = det.detect(img)
    assert len(kps) > 100
    hit = 0
    for k in kps:
        x, y = int(round(k.pt[0])), int(round(k.pt[1]))
        if ours[max(y - 1, 0) : y + 2, max(x - 1, 0) : x + 2].any():
            hit += 1
    assert hit / len(kps) > 0.98


def test_fast_score_matches_cv2_offby1(rng):
    # OpenCV's response is (max threshold - 1) relative to our score
    img = make_texture(rng)
    s = np.asarray(nms3x3(fast_score(jnp.asarray(img, jnp.float32))))
    det = cv2.FastFeatureDetector_create(
        threshold=20, nonmaxSuppression=True, type=cv2.FastFeatureDetector_TYPE_9_16
    )
    kps = det.detect(img)
    diffs = []
    for k in kps:
        x, y = int(round(k.pt[0])), int(round(k.pt[1]))
        if s[y, x] > 0:
            diffs.append(abs((s[y, x] - 1) - k.response))
    assert len(diffs) > 50
    assert np.mean(diffs) < 0.5


def test_extractor_budget_and_levels(rng):
    img = make_texture(rng)
    cfg = OrbConfig(n_features=300)
    ext = OrbExtractor(*img.shape, cfg)
    out = ext(jnp.asarray(img, jnp.float32))
    v = np.asarray(out["valid"])
    assert v.sum() > 250  # rich texture fills most of the budget
    oct_hist = np.bincount(np.asarray(out["octave"])[v], minlength=8)
    assert oct_hist[0] > oct_hist[4]  # geometric level budgets
    xy = np.asarray(out["xy"])[v]
    assert xy[:, 0].min() >= 0 and xy[:, 0].max() < img.shape[1]
    assert xy[:, 1].min() >= 0 and xy[:, 1].max() < img.shape[0]


def test_extractor_spatial_uniformity(rng):
    img = make_texture(rng)
    ext = OrbExtractor(*img.shape, OrbConfig(n_features=300))
    out = ext(jnp.asarray(img, jnp.float32))
    v = np.asarray(out["valid"])
    xy = np.asarray(out["xy"])[v]
    # quadrant occupancy: every quadrant gets a reasonable share
    qx = (xy[:, 0] > img.shape[1] / 2).astype(int)
    qy = (xy[:, 1] > img.shape[0] / 2).astype(int)
    counts = np.bincount(qy * 2 + qx, minlength=4)
    assert counts.min() > len(xy) * 0.1


def test_pack_bits_roundtrip(rng):
    bits = (rng.rand(16, 256) > 0.5).astype(np.uint8)
    packed = np.asarray(pack_bits(jnp.asarray(bits)))
    for w in range(8):
        for i in range(32):
            got = (packed[:, w] >> np.uint32(i)) & np.uint32(1)
            np.testing.assert_array_equal(got, bits[:, w * 32 + i])


def test_descriptor_rotation_invariance(rng):
    img = make_texture(rng, 320, 400)
    ext = OrbExtractor(*img.shape, OrbConfig(n_features=300))
    out1 = ext(jnp.asarray(img, jnp.float32))
    M = cv2.getRotationMatrix2D((200, 160), 30, 1.0)
    rimg = cv2.warpAffine(img, M, (400, 320))
    out2 = ext(jnp.asarray(rimg, jnp.float32))
    v1, v2 = np.asarray(out1["valid"]), np.asarray(out2["valid"])
    b1 = np.asarray(out1["bits"])[v1]
    b2 = np.asarray(out2["bits"])[v2]
    xy1 = np.asarray(out1["xy"])[v1]
    xy2 = np.asarray(out2["xy"])[v2]
    gt = np.concatenate([xy1, np.ones((len(xy1), 1))], 1) @ M.T
    inside = (
        (gt[:, 0] > 20) & (gt[:, 0] < 380) & (gt[:, 1] > 20) & (gt[:, 1] < 300)
    )
    D = (b1[inside, None, :] != b2[None, :, :]).sum(-1)
    nn = D.argmin(1)
    dist = np.linalg.norm(gt[inside] - xy2[nn], axis=1)
    assert (dist < 3).mean() > 0.35  # weak texture; real scenes are higher
