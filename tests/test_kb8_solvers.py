"""Camera-generic optimization: KB8 fisheye residuals in the solvers.

VERDICT r2 missing #1: every solver used to hardcode the pinhole
projection, so fisheye pixels fed a pinhole residual — systematically
wrong away from the image center (ref projects every edge through
GeometricCamera: OptimizableTypes.h:31-196, G2oTypes.cc EdgeMono).
These tests build synthetic wide-FOV KB8 observations and check that

  * pose optimization through the true KB8 model recovers the pose,
  * the pinhole approximation on the same raw fisheye pixels is
    demonstrably biased (an order of magnitude worse),
  * full BA and the rig right-camera (Trl) path converge too.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from tpuslam.cameras.kb8 import KannalaBrandt8, kb8_project
from tpuslam.solve.reproj import CamSpec, make_kb8_spec
from tpuslam.solve.pose_opt import pose_optimize
from tpuslam.solve.ba import ba_solve_np

# TUM-VI 512 left camera (Examples/Stereo-Inertial/TUM_512.yaml)
KB_PARAMS = [190.97847715128717, 190.9733070521226,
             254.93170605935475, 256.8974428996504,
             0.0034823894022493434, 0.0007150348452162257,
             -0.0020532361418706202, 0.00020293673591811182]
W = H = 512


def _scene(rng, n=200, z_range=(2.0, 6.0)):
    """World points spread across the fisheye's wide FOV (up to ~75 deg
    off-axis — far outside any pinhole approximation's comfort zone)."""
    theta = rng.uniform(0.0, np.deg2rad(75.0), n)
    phi = rng.uniform(-np.pi, np.pi, n)
    z = rng.uniform(*z_range, n)
    d = np.stack(
        [np.sin(theta) * np.cos(phi), np.sin(theta) * np.sin(phi),
         np.cos(theta)], -1)
    return (d * (z / d[:, 2])[:, None]).astype(np.float64)


def _rot(axis, ang):
    axis = np.asarray(axis, np.float64)
    axis = axis / np.linalg.norm(axis)
    K = np.array([[0, -axis[2], axis[1]], [axis[2], 0, -axis[0]],
                  [-axis[1], axis[0], 0]])
    return np.eye(3) + np.sin(ang) * K + (1 - np.cos(ang)) * (K @ K)


def test_pose_opt_kb8_converges_where_pinhole_biases(rng):
    cam = KannalaBrandt8(KB_PARAMS, W, H)
    spec = make_kb8_spec(cam)
    X = _scene(rng)
    R_gt = _rot([0.3, 1.0, 0.1], 0.05)
    t_gt = np.array([0.1, -0.05, 0.08])
    Xc = X @ R_gt.T + t_gt
    uv = np.asarray(kb8_project(tuple(cam.full_params), jnp.asarray(Xc)))
    uvr = np.concatenate([uv, np.zeros((len(X), 1))], -1)
    n = len(X)
    args = (
        jnp.asarray(X), jnp.asarray(uvr), jnp.ones(n),
        jnp.zeros(n, bool), jnp.ones(n, bool),
        cam.fx, cam.fy, cam.cx, cam.cy, 0.0,
    )
    R0 = jnp.eye(3, dtype=jnp.float64)
    t0 = jnp.zeros(3, dtype=jnp.float64)

    Rk, tk, inl_k, _ = pose_optimize(R0, t0, *args, cam=spec)
    err_kb8 = np.linalg.norm(np.asarray(tk) - t_gt) + np.linalg.norm(
        np.asarray(Rk) - R_gt)
    assert err_kb8 < 1e-5, err_kb8
    assert int(np.asarray(inl_k).sum()) >= 0.95 * n

    # pinhole residual on the SAME raw fisheye pixels: biased
    Rp, tp, _, _ = pose_optimize(R0, t0, *args)  # default pinhole
    err_pin = np.linalg.norm(np.asarray(tp) - t_gt) + np.linalg.norm(
        np.asarray(Rp) - R_gt)
    assert err_pin > 10 * max(err_kb8, 1e-6), (err_pin, err_kb8)


def test_pose_opt_kb8_rig_right_camera(rng):
    """Right-camera observations through the fixed Trl (ref
    EdgeSE3ProjectXYZOnlyPoseToBody, OptimizableTypes.h:59)."""
    cam = KannalaBrandt8(KB_PARAMS, W, H)
    cam2 = KannalaBrandt8(
        [190.44236969414825, 190.4344384721956, 252.59949716835982,
         254.91723064636983, 0.0034003170790442797, 0.001766278153469831,
         -0.00266312569781606, 0.0003299517423931039], W, H)
    Trl = np.eye(4)
    Trl[:3, :3] = _rot([0.0, 1.0, 0.0], 0.02)
    Trl[:3, 3] = [-0.101, 0.0018, -0.0014]  # ~TUM-VI baseline
    spec = make_kb8_spec(cam, cam2, Trl)
    X = _scene(rng, n=240)
    R_gt = _rot([0.1, 0.8, -0.2], 0.04)
    t_gt = np.array([-0.06, 0.02, 0.1])
    Xc = X @ R_gt.T + t_gt
    is_right = rng.rand(len(X)) < 0.5
    Xr = Xc @ Trl[:3, :3].T + Trl[:3, 3]
    uv_l = np.asarray(kb8_project(tuple(cam.full_params), jnp.asarray(Xc)))
    uv_r = np.asarray(kb8_project(tuple(cam2.full_params), jnp.asarray(Xr)))
    uv = np.where(is_right[:, None], uv_r, uv_l)
    uvr = np.concatenate([uv, np.zeros((len(X), 1))], -1)
    n = len(X)
    R, t, inl, _ = pose_optimize(
        jnp.eye(3, dtype=jnp.float64), jnp.zeros(3, dtype=jnp.float64),
        jnp.asarray(X), jnp.asarray(uvr), jnp.ones(n),
        jnp.zeros(n, bool), jnp.ones(n, bool),
        cam.fx, cam.fy, cam.cx, cam.cy, 0.0,
        cam=spec, is_right=jnp.asarray(is_right),
    )
    assert np.linalg.norm(np.asarray(t) - t_gt) < 1e-5
    assert np.linalg.norm(np.asarray(R) - R_gt) < 1e-5
    assert int(np.asarray(inl).sum()) >= 0.95 * n


def test_ba_kb8_converges(rng):
    """Full BA (poses + landmarks, Schur) through the KB8 model."""
    cam = KannalaBrandt8(KB_PARAMS, W, H)
    spec = make_kb8_spec(cam)
    P = 60
    X_gt = _scene(rng, n=P, z_range=(3.0, 6.0))
    K = 4
    R_gt = [np.eye(3)]
    t_gt = [np.zeros(3)]
    for k in range(1, K):
        R_gt.append(_rot([0.1, 1.0, 0.05], 0.03 * k))
        t_gt.append(np.array([0.15 * k, 0.02 * k, -0.05 * k]))
    obs_kf, obs_pt, uvr = [], [], []
    for k in range(K):
        Xc = X_gt @ R_gt[k].T + t_gt[k]
        uv = np.asarray(kb8_project(tuple(cam.full_params), jnp.asarray(Xc)))
        inb = (Xc[:, 2] > 0.1) & (np.abs(uv[:, 0] - cam.cx) < 250) & (
            np.abs(uv[:, 1] - cam.cy) < 250)
        for j in np.where(inb)[0]:
            obs_kf.append(k)
            obs_pt.append(j)
            uvr.append([uv[j, 0], uv[j, 1], 0.0])
    O = len(obs_kf)
    # perturb
    R0 = [R_gt[0]] + [(_rot(rng.randn(3), 0.01) @ R_gt[k]) for k in range(1, K)]
    t0 = [t_gt[0]] + [t_gt[k] + rng.randn(3) * 0.02 for k in range(1, K)]
    X0 = X_gt + rng.randn(P, 3) * 0.03
    fixed = np.zeros(K, bool)
    fixed[0] = True
    Rf, tf, Xf, chi2, posz = ba_solve_np(
        np.stack(R0), np.stack(t0), X0,
        np.asarray(obs_kf, np.int32), np.asarray(obs_pt, np.int32),
        np.asarray(uvr), np.ones(O), np.zeros(O, bool), np.ones(O, bool),
        fixed, cam.fx, cam.fy, cam.cx, cam.cy, 0.0,
        n_iters=15, cam=spec,
    )
    # gauge is fixed by pose 0 only; mono BA has a free global scale, so
    # compare after optimal-scale alignment of the translations
    s = np.sum([tf[k] @ t_gt[k] for k in range(K)]) / max(
        np.sum([tf[k] @ tf[k] for k in range(K)]), 1e-12)
    for k in range(1, K):
        assert np.linalg.norm(s * tf[k] - t_gt[k]) < 5e-3, k
    assert np.median(chi2) < 1e-6
