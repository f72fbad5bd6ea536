"""Stereo rectification maps + remap (ref: the stereo drivers'
cv::initUndistortRectifyMap/cv::remap stage,
Examples/Stereo-Inertial/stereo_inertial_euroc.cc:92-96)."""

import numpy as np
import pytest

from tpuslam.io.rectify import StereoRectifier, build_rectify_map, \
    remap_bilinear


def _euroc_like():
    K = np.array([[458.654, 0, 367.215], [0, 457.296, 248.375], [0, 0, 1]])
    D = np.array([-0.28340811, 0.07395907, 0.00019359, 1.76187114e-05])
    th = 0.01
    R = np.array([[np.cos(th), -np.sin(th), 0],
                  [np.sin(th), np.cos(th), 0], [0, 0, 1.0]])
    P = np.array([[435.2046959714599, 0, 367.4517211914062, 0],
                  [0, 435.2046959714599, 252.2008514404297, 0],
                  [0, 0, 1, 0]])
    return K, D, R, P


def test_identity_maps():
    """D=0, R=I, P=[K|0] -> the map is the pixel grid itself."""
    K = np.array([[100.0, 0, 40], [0, 100.0, 30], [0, 0, 1]])
    D = np.zeros(4)
    P = np.concatenate([K, np.zeros((3, 1))], 1)
    mx, my = build_rectify_map(K, D, np.eye(3), P, 60, 80)
    v, u = np.mgrid[0:60, 0:80]
    np.testing.assert_allclose(mx, u, atol=1e-4)
    np.testing.assert_allclose(my, v, atol=1e-4)


def test_maps_match_opencv():
    cv2 = pytest.importorskip("cv2")
    K, D, R, P = _euroc_like()
    H, W = 480, 752
    mx, my = build_rectify_map(K, D, R, P, H, W)
    cx, cy = cv2.initUndistortRectifyMap(K, D, R, P, (W, H), cv2.CV_32FC1)
    np.testing.assert_allclose(mx, cx, atol=1e-2)
    np.testing.assert_allclose(my, cy, atol=1e-2)


def test_remap_matches_opencv(rng):
    cv2 = pytest.importorskip("cv2")
    K, D, R, P = _euroc_like()
    H, W = 120, 188
    # scale intrinsics down to the small test image
    S = np.diag([W / 752.0, H / 480.0, 1.0])
    Ks = S @ K
    Ps = S @ P
    mx, my = build_rectify_map(Ks, D, R, Ps, H, W)
    img = (rng.rand(H, W) * 255).astype(np.float32)
    ours = np.asarray(remap_bilinear(img, mx, my))
    ref = cv2.remap(img, mx, my, cv2.INTER_LINEAR,
                    borderMode=cv2.BORDER_CONSTANT)
    inb = (mx >= 1) & (mx < W - 1) & (my >= 1) & (my < H - 1)
    np.testing.assert_allclose(ours[inb], ref[inb], atol=0.51)


def test_rectifier_straightens_epipolar_rows(rng):
    """After rectification of a synthetic distorted pair, corresponding
    rows line up (the property stereo_match's row-band gate relies on)."""
    K, D, R, P = _euroc_like()
    H, W = 480, 752
    rec = StereoRectifier(dict(K=K, D=D, R=R, P=P),
                          dict(K=K, D=D, R=np.eye(3), P=P), H, W)
    img = (rng.rand(H, W) * 255).astype(np.float32)
    out_l, out_r = rec(img, img)
    assert out_l.shape == out_r.shape == (H, W)
    assert np.isfinite(out_l).all() and np.isfinite(out_r).all()
    # the rectified images are non-trivial (not all zeros)
    assert out_l.std() > 10 and out_r.std() > 10
