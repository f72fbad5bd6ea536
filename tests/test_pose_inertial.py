"""Tracking-time VI frame optimization (pose_inertial_solve): recover a
perturbed frame state against a fixed KF anchor, chain the marginalization
prior across frames, and handle a body!=camera extrinsic (Tbc).

Reference semantics: Optimizer::PoseInertialOptimizationLastKeyFrame
(src/Optimizer.cc:7479), ...LastFrame (:7874), ConstraintPoseImu /
EdgePriorPoseImu (src/G2oTypes.h:703-783)."""

import numpy as np
import jax
import jax.numpy as jnp

from tpuslam.core import lie
from tpuslam.imu import preintegration as PI
from tpuslam.imu.preintegration import ImuCalib
from tpuslam.io.synthetic import SyntheticSequence
from tpuslam.solve.pose_inertial import pose_inertial_solve

FX = FY = 300.0
CX = CY = 200.0


def _make(rng, n_frames=3, P=80, calib=None):
    """GT body states at frame times + landmarks + preintegrations."""
    seq = SyntheticSequence(n_frames=n_frames, fps=5.0, imu_rate=500.0)
    tr = seq.traj
    times = seq.timestamps()
    if calib is None:
        calib = ImuCalib()
    # body == the synthetic trajectory frame; camera hangs off via Tbc
    Rwb = np.stack([tr.pose_cw(t)[0].T for t in times])
    p = np.stack([tr.pos(t) for t in times])
    v = np.stack([tr.vel(t) for t in times])
    mid = n_frames // 2
    Xb = np.stack(
        [rng.uniform(-2, 2, P), rng.uniform(-1.5, 1.5, P),
         rng.uniform(3, 8, P)], 1)
    X = Xb @ Rwb[mid].T + p[mid]
    pres = []
    for k in range(n_frames - 1):
        ts, ws, accs = seq.imu_between(times[k], times[k + 1])
        dts = np.diff(np.concatenate([[times[k]], ts]))
        pres.append(jax.tree.map(np.asarray, PI.preintegrate(
            jnp.asarray(ws), jnp.asarray(accs), jnp.asarray(dts),
            jnp.zeros(3), jnp.zeros(3), 1e-6, 1e-5, 1e-9, 1e-8)))
    return dict(Rwb=Rwb, p=p, v=v, X=X, pres=pres, calib=calib,
                times=times)


def _obs(d, k):
    """Pixel observations of frame k through the camera (body o Tbc)."""
    calib = d["calib"]
    Rcw, tcw = calib.cam_from_body(d["Rwb"][k], d["p"][k])
    Xc = d["X"] @ Rcw.T + tcw
    z = Xc[:, 2]
    uvr = np.stack([FX * Xc[:, 0] / z + CX, FY * Xc[:, 1] / z + CY,
                    np.zeros_like(z)], 1)
    valid = z > 0.2
    return uvr, valid


def _solve(d, k_anchor, k_frame, R2, p2, v2, bg2, ba2,
           prior=None, anchor_fixed=True):
    calib = d["calib"]
    uvr, valid = _obs(d, k_frame)
    P = len(uvr)
    pre = d["pres"][k_frame - 1]
    info9 = np.asarray(PI.information_from_cov(
        jnp.asarray(pre["C"][:9, :9].astype(np.float64))))
    dT = float(pre["dT"])
    pr = prior or dict(H=np.zeros((15, 15)), R=d["Rwb"][k_anchor],
                       p=d["p"][k_anchor], v=d["v"][k_anchor],
                       bg=np.zeros(3), ba=np.zeros(3))
    out = pose_inertial_solve(
        jnp.asarray(d["Rwb"][k_anchor]), jnp.asarray(d["p"][k_anchor]),
        jnp.asarray(d["v"][k_anchor]), jnp.zeros(3), jnp.zeros(3),
        jnp.asarray(R2), jnp.asarray(p2), jnp.asarray(v2),
        jnp.asarray(bg2), jnp.asarray(ba2),
        jnp.asarray(d["X"]), jnp.asarray(uvr), jnp.ones(P),
        jnp.zeros(P, bool), jnp.asarray(valid),
        jax.tree.map(lambda x: jnp.asarray(np.asarray(x, np.float64)), pre),
        jnp.asarray(info9), jnp.zeros(3), jnp.zeros(3),
        1.0 / (1e-9 * dT), 1.0 / (1e-8 * dT),
        jnp.asarray(pr["H"]), jnp.asarray(pr["R"]), jnp.asarray(pr["p"]),
        jnp.asarray(pr["v"]), jnp.asarray(pr["bg"]), jnp.asarray(pr["ba"]),
        anchor_fixed,
        jnp.asarray(calib.Rcb), jnp.asarray(calib.tcb),
        FX, FY, CX, CY, 0.0,
    )
    return [np.asarray(x) for x in out]


def _perturbed(rng, d, k):
    R2 = d["Rwb"][k] @ np.asarray(lie.so3_exp(jnp.asarray(rng.randn(3) * 0.02)))
    p2 = d["p"][k] + rng.randn(3) * 0.05
    v2 = d["v"][k] + rng.randn(3) * 0.1
    return R2, p2, v2


def test_kf_anchor_recovers_frame_state(rng):
    d = _make(rng)
    R2, p2, v2 = _perturbed(rng, d, 1)
    Rf, pf, vf, bgf, baf, inl, H15, n_inl = _solve(
        d, 0, 1, R2, p2, v2, np.zeros(3), np.zeros(3))
    np.testing.assert_allclose(pf, d["p"][1], atol=2e-3)
    np.testing.assert_allclose(vf, d["v"][1], atol=2e-2)
    err = np.asarray(lie.so3_log(jnp.asarray(Rf.T @ d["Rwb"][1])))
    assert np.linalg.norm(err) < 2e-3
    assert int(n_inl) > 50
    # marginal information is symmetric PSD with a well-constrained pose
    w = np.linalg.eigvalsh(H15)
    assert w.min() > -1e-6
    assert w.max() > 1.0


def test_prior_chain_last_frame_anchor(rng):
    """Frame 1 solved against KF 0, then frame 2 against frame 1 using the
    marginalization prior (LastFrame variant, free anchor)."""
    d = _make(rng)
    R1s, p1s, v1s, bg1, ba1, _, H15, _ = _solve(
        d, 0, 1, *_perturbed(rng, d, 1), np.zeros(3), np.zeros(3))
    prior = dict(H=H15, R=R1s, p=p1s, v=v1s, bg=bg1, ba=ba1)
    # anchor = solved frame 1 (enters free, held by the prior)
    d2 = dict(d)
    d2["Rwb"] = d["Rwb"].copy()
    d2["p"] = d["p"].copy()
    d2["v"] = d["v"].copy()
    d2["Rwb"][1], d2["p"][1], d2["v"][1] = R1s, p1s, v1s
    R2, p2, v2 = _perturbed(rng, d, 2)
    Rf, pf, vf, *_rest = _solve(
        d2, 1, 2, R2, p2, v2, bg1, ba1, prior=prior, anchor_fixed=False)
    np.testing.assert_allclose(pf, d["p"][2], atol=5e-3)
    err = np.asarray(lie.so3_log(jnp.asarray(Rf.T @ d["Rwb"][2])))
    assert np.linalg.norm(err) < 5e-3


def test_tbc_lever_arm(rng):
    """Non-identity Tbc: camera 10 cm / rotated off the body. Observations
    are generated through the camera; the solver estimates the BODY state."""
    Tbc = np.eye(4)
    Tbc[:3, :3] = np.asarray(lie.so3_exp(jnp.asarray([0.1, -0.2, 0.3])))
    Tbc[:3, 3] = [0.1, -0.05, 0.02]
    calib = ImuCalib(Tbc=Tbc)
    d = _make(rng, calib=calib)
    R2, p2, v2 = _perturbed(rng, d, 1)
    Rf, pf, vf, *_ = _solve(d, 0, 1, R2, p2, v2, np.zeros(3), np.zeros(3))
    np.testing.assert_allclose(pf, d["p"][1], atol=3e-3)
    np.testing.assert_allclose(vf, d["v"][1], atol=3e-2)
    err = np.asarray(lie.so3_log(jnp.asarray(Rf.T @ d["Rwb"][1])))
    assert np.linalg.norm(err) < 3e-3


def test_outlier_rejection(rng):
    """Corrupted observations land outside the chi2 gate."""
    d = _make(rng)
    uvr, valid = _obs(d, 1)
    bad = rng.choice(np.nonzero(valid)[0], 15, replace=False)
    d = dict(d)
    # bake corruption in by shifting X of the bad points' obs: easier to
    # corrupt uvr via a wrapper around _solve — replicate its body here
    pre = d["pres"][0]
    info9 = np.asarray(PI.information_from_cov(
        jnp.asarray(pre["C"][:9, :9].astype(np.float64))))
    dT = float(pre["dT"])
    uvr = uvr.copy()
    uvr[bad, :2] += rng.uniform(30, 80, (15, 2)) * np.sign(rng.randn(15, 2))
    P = len(uvr)
    calib = d["calib"]
    R2, p2, v2 = _perturbed(rng, d, 1)
    out = pose_inertial_solve(
        jnp.asarray(d["Rwb"][0]), jnp.asarray(d["p"][0]),
        jnp.asarray(d["v"][0]), jnp.zeros(3), jnp.zeros(3),
        jnp.asarray(R2), jnp.asarray(p2), jnp.asarray(v2),
        jnp.zeros(3), jnp.zeros(3),
        jnp.asarray(d["X"]), jnp.asarray(uvr), jnp.ones(P),
        jnp.zeros(P, bool), jnp.asarray(valid),
        jax.tree.map(lambda x: jnp.asarray(np.asarray(x, np.float64)), pre),
        jnp.asarray(info9), jnp.zeros(3), jnp.zeros(3),
        1.0 / (1e-9 * dT), 1.0 / (1e-8 * dT),
        jnp.zeros((15, 15)), jnp.asarray(d["Rwb"][0]), jnp.asarray(d["p"][0]),
        jnp.asarray(d["v"][0]), jnp.zeros(3), jnp.zeros(3),
        True, jnp.eye(3), jnp.zeros(3), FX, FY, CX, CY, 0.0,
    )
    Rf, pf, vf, bgf, baf, inl, H15, n_inl = [np.asarray(x) for x in out]
    assert not inl[bad].any()          # corrupted obs rejected
    np.testing.assert_allclose(pf, d["p"][1], atol=5e-3)
