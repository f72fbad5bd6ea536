"""Camera model tests. cv2 is used ONLY as a golden reference for validation
(the runtime path never touches OpenCV)."""

import cv2
import numpy as np
import jax
import jax.numpy as jnp

from tpuslam.cameras import Pinhole, KannalaBrandt8

# EuRoC cam0 intrinsics (Examples/Monocular/EuRoC.yaml in the reference)
EUROC = dict(
    fx=458.654, fy=457.296, cx=367.215, cy=248.375,
    dist=[-0.28340811, 0.07395907, 0.00019359, 1.76187114e-05],
    w=752, h=480,
)
# TUM-VI 512 fisheye (Examples/Monocular/TUM_512.yaml)
TUMVI = dict(
    fx=190.97847715128717, fy=190.9733070521226,
    cx=254.93170605935475, cy=256.8974428996504,
    k=[0.0034823894022493434, 0.0007150348452162257,
       -0.0020532361418706202, 0.00020293673591811182],
    w=512, h=512,
)


def make_pinhole():
    c = EUROC
    return Pinhole([c["fx"], c["fy"], c["cx"], c["cy"]], c["w"], c["h"], dist=c["dist"])


def make_kb8():
    c = TUMVI
    return KannalaBrandt8(
        [c["fx"], c["fy"], c["cx"], c["cy"]] + c["k"], c["w"], c["h"]
    )


def test_pinhole_project_unproject(rng):
    cam = make_pinhole()
    X = rng.randn(256, 3).astype(np.float64)
    X[:, 2] = np.abs(X[:, 2]) + 0.5
    uv = cam.project(jnp.asarray(X))
    rays = cam.unproject(uv)
    Xn = X / X[:, 2:3]
    np.testing.assert_allclose(np.asarray(rays), Xn, atol=1e-9)


def test_pinhole_jacobian_vs_autodiff(rng):
    cam = make_pinhole()
    X = rng.randn(32, 3).astype(np.float64)
    X[:, 2] = np.abs(X[:, 2]) + 0.5
    J = np.asarray(cam.project_jac(jnp.asarray(X)))
    J_auto = np.asarray(jax.vmap(jax.jacfwd(cam.project))(jnp.asarray(X)))
    np.testing.assert_allclose(J, J_auto, atol=1e-8)


def test_pinhole_undistort_matches_cv2(rng):
    cam = make_pinhole()
    uv = np.stack(
        [rng.uniform(50, cam.width - 50, 200), rng.uniform(50, cam.height - 50, 200)],
        axis=-1,
    )
    ours = np.asarray(cam.undistort_points(jnp.asarray(uv)))
    K = cam.K().astype(np.float64)
    D = cam.dist[:4].astype(np.float64)
    ref = cv2.undistortPoints(uv.reshape(-1, 1, 2), K, np.concatenate([D[:2], D[2:4], [0]]), P=K)
    ref = ref.reshape(-1, 2)
    # cv2's 5-iteration fixed point is only ~0.3px self-consistent; ours
    # converges to <1e-5 px (checked below), so only match cv2 loosely.
    np.testing.assert_allclose(ours, ref, atol=0.6)
    back = np.asarray(cam.distort_points(jnp.asarray(ours)))
    np.testing.assert_allclose(back, uv, atol=1e-4)


def test_pinhole_distort_roundtrip(rng):
    cam = make_pinhole()
    uv = np.stack(
        [rng.uniform(100, cam.width - 100, 200), rng.uniform(100, cam.height - 100, 200)],
        axis=-1,
    )
    und = cam.undistort_points(jnp.asarray(uv))
    back = np.asarray(cam.distort_points(und))
    np.testing.assert_allclose(back, uv, atol=1e-2)


def test_kb8_project_matches_cv2(rng):
    cam = make_kb8()
    X = rng.randn(256, 3)
    X[:, 2] = np.abs(X[:, 2]) + 0.3
    ours = np.asarray(cam.project(jnp.asarray(X)))
    K = cam.K().astype(np.float64)
    D = np.asarray(cam.k, np.float64).reshape(4, 1)
    ref, _ = cv2.fisheye.projectPoints(
        X.reshape(-1, 1, 3).astype(np.float64),
        np.zeros(3), np.zeros(3), K, D,
    )
    np.testing.assert_allclose(ours, ref.reshape(-1, 2), atol=1e-3)


def test_kb8_unproject_roundtrip(rng):
    # Sample inside the illuminated fisheye circle (theta < ~76deg); beyond
    # 90deg a z=1 ray is undefined (same property as the reference's
    # KannalaBrandt8::unproject which also returns z=1 rays).
    cam = make_kb8()
    ang = rng.uniform(0, 2 * np.pi, 256)
    rad = rng.uniform(0, 240, 256)
    uv = np.stack(
        [cam.cx + rad * np.cos(ang), cam.cy + rad * np.sin(ang)], axis=-1
    )
    rays = cam.unproject(jnp.asarray(uv))
    back = np.asarray(cam.project(rays))
    np.testing.assert_allclose(back, uv, atol=1e-3)


def test_kb8_jacobian_vs_autodiff(rng):
    cam = make_kb8()
    X = rng.randn(32, 3)
    X[:, 2] = np.abs(X[:, 2]) + 0.3
    J = np.asarray(cam.project_jac(jnp.asarray(X)))
    J_auto = np.asarray(jax.vmap(jax.jacfwd(cam.project))(jnp.asarray(X)))
    np.testing.assert_allclose(J, J_auto, atol=1e-6)


def test_kb8_wide_angle_rays(rng):
    # fisheye sees ~75deg off-axis rays (TUM-VI 512 half-FOV): still inside
    cam = make_kb8()
    X = np.array([[1.0, 0.0, 0.3], [-1.0, 0.2, 0.35], [0.5, 0.5, 0.25]])
    uv = np.asarray(cam.project(jnp.asarray(X)))
    assert np.all(uv[:, 0] > 0) and np.all(uv[:, 0] < cam.width)
    rays = np.asarray(cam.unproject(jnp.asarray(uv)))
    Xn = X / X[:, 2:3]
    np.testing.assert_allclose(rays, Xn, rtol=2e-3, atol=2e-3)
