"""IMU preintegration tests against direct numerical integration and the
synthetic trajectory's analytic ground truth."""

import numpy as np
import jax.numpy as jnp

from tpuslam.core import lie
from tpuslam.imu import preintegration as PI
from tpuslam.io.synthetic import SyntheticSequence


def integrate_direct(w, a, dt, bg, ba):
    """Naive reference integration (same discretization)."""
    dR = np.eye(3)
    dV = np.zeros(3)
    dP = np.zeros(3)
    for wi, ai, dti in zip(w, a, dt):
        if dti <= 0:
            continue
        acc = ai - ba
        dP = dP + dV * dti + 0.5 * dR @ acc * dti * dti
        dV = dV + dR @ acc * dti
        dR = dR @ np.asarray(lie.so3_exp(jnp.asarray((wi - bg) * dti)))
    return dR, dV, dP


def test_preintegrate_matches_direct(rng):
    n = 50
    w = rng.randn(n, 3) * 0.3
    a = rng.randn(n, 3) * 2.0 + [0, 0, 9.81]
    dt = np.full(n, 0.005)
    bg = np.array([0.01, -0.02, 0.005])
    ba = np.array([0.1, 0.05, -0.08])
    pre = PI.preintegrate(
        jnp.asarray(w), jnp.asarray(a), jnp.asarray(dt),
        jnp.asarray(bg), jnp.asarray(ba), 1e-6, 1e-4, 1e-8, 1e-6,
    )
    dR, dV, dP = integrate_direct(w, a, dt, bg, ba)
    np.testing.assert_allclose(np.asarray(pre["dR"]), dR, atol=1e-9)
    np.testing.assert_allclose(np.asarray(pre["dV"]), dV, atol=1e-9)
    np.testing.assert_allclose(np.asarray(pre["dP"]), dP, atol=1e-9)
    assert abs(float(pre["dT"]) - 0.25) < 1e-9


def test_padding_inert(rng):
    n = 30
    w = rng.randn(n, 3) * 0.3
    a = rng.randn(n, 3)
    dt = np.full(n, 0.005)
    dt[20:] = 0.0  # padding
    pre = PI.preintegrate(
        jnp.asarray(w), jnp.asarray(a), jnp.asarray(dt),
        jnp.zeros(3), jnp.zeros(3), 1e-6, 1e-4, 1e-8, 1e-6,
    )
    pre2 = PI.preintegrate(
        jnp.asarray(w[:20]), jnp.asarray(a[:20]), jnp.asarray(dt[:20]),
        jnp.zeros(3), jnp.zeros(3), 1e-6, 1e-4, 1e-8, 1e-6,
    )
    np.testing.assert_allclose(np.asarray(pre["dR"]), np.asarray(pre2["dR"]), atol=1e-12)
    np.testing.assert_allclose(np.asarray(pre["dP"]), np.asarray(pre2["dP"]), atol=1e-12)


def test_bias_jacobians_first_order(rng):
    """corrected_delta(pre, db) ~ preintegrate at (b + db)."""
    n = 40
    w = rng.randn(n, 3) * 0.3
    a = rng.randn(n, 3) * 2.0
    dt = np.full(n, 0.005)
    bg0 = np.zeros(3)
    ba0 = np.zeros(3)
    args = (1e-6, 1e-4, 1e-8, 1e-6)
    pre0 = PI.preintegrate(jnp.asarray(w), jnp.asarray(a), jnp.asarray(dt),
                           jnp.asarray(bg0), jnp.asarray(ba0), *args)
    dbg = np.array([0.002, -0.001, 0.0015])
    dba = np.array([0.01, 0.02, -0.015])
    pre1 = PI.preintegrate(jnp.asarray(w), jnp.asarray(a), jnp.asarray(dt),
                           jnp.asarray(bg0 + dbg), jnp.asarray(ba0 + dba), *args)
    dRc, dVc, dPc = PI.corrected_delta(pre0, jnp.asarray(dbg), jnp.asarray(dba))
    np.testing.assert_allclose(np.asarray(dRc), np.asarray(pre1["dR"]), atol=1e-6)
    np.testing.assert_allclose(np.asarray(dVc), np.asarray(pre1["dV"]), atol=1e-5)
    np.testing.assert_allclose(np.asarray(dPc), np.asarray(pre1["dP"]), atol=1e-6)


def test_predict_state_on_synthetic_trajectory():
    """Perfect IMU from the synthetic trajectory must predict the GT pose."""
    seq = SyntheticSequence(n_frames=3, fps=5.0, imu_rate=1000.0)
    tr = seq.traj
    t0, t1 = 0.2, 0.4
    ts, ws, accs = seq.imu_between(t0, t1)
    dts = np.diff(np.concatenate([[t0], ts]))
    pre = PI.preintegrate(
        jnp.asarray(ws), jnp.asarray(accs), jnp.asarray(dts),
        jnp.zeros(3), jnp.zeros(3), 1e-8, 1e-8, 1e-10, 1e-10,
    )
    Rcw0, tcw0 = tr.pose_cw(t0)
    Rwb0 = Rcw0.T  # body == camera in synthetic data
    p0 = tr.pos(t0)
    v0 = tr.vel(t0)
    Rwb1, p1, v1 = PI.predict_state(
        jnp.asarray(Rwb0), jnp.asarray(p0), jnp.asarray(v0), pre
    )
    Rcw1, _ = tr.pose_cw(t1)
    np.testing.assert_allclose(np.asarray(Rwb1), Rcw1.T, atol=2e-4)
    np.testing.assert_allclose(np.asarray(p1), tr.pos(t1), atol=2e-4)
    np.testing.assert_allclose(np.asarray(v1), tr.vel(t1), atol=2e-3)


def test_inertial_residual_zero_at_truth():
    seq = SyntheticSequence(n_frames=3, fps=5.0, imu_rate=1000.0)
    tr = seq.traj
    t0, t1 = 0.2, 0.4
    ts, ws, accs = seq.imu_between(t0, t1)
    dts = np.diff(np.concatenate([[t0], ts]))
    pre = PI.preintegrate(
        jnp.asarray(ws), jnp.asarray(accs), jnp.asarray(dts),
        jnp.zeros(3), jnp.zeros(3), 1e-8, 1e-8, 1e-10, 1e-10,
    )
    R0, _ = tr.pose_cw(t0)
    R1, _ = tr.pose_cw(t1)
    r = PI.inertial_residual(
        jnp.asarray(R0.T), jnp.asarray(tr.pos(t0)), jnp.asarray(tr.vel(t0)),
        jnp.asarray(R1.T), jnp.asarray(tr.pos(t1)), jnp.asarray(tr.vel(t1)),
        jnp.zeros(3), jnp.zeros(3), jnp.zeros(3), jnp.zeros(3), pre,
    )
    assert np.abs(np.asarray(r)).max() < 5e-3


def test_covariance_psd(rng):
    n = 60
    w = rng.randn(n, 3) * 0.2
    a = rng.randn(n, 3)
    dt = np.full(n, 0.005)
    pre = PI.preintegrate(jnp.asarray(w), jnp.asarray(a), jnp.asarray(dt),
                          jnp.zeros(3), jnp.zeros(3), 1e-6, 1e-4, 1e-8, 1e-6)
    C = np.asarray(pre["C"])
    eig = np.linalg.eigvalsh(0.5 * (C + C.T))
    assert eig.min() > -1e-12
    info = np.asarray(PI.information_from_cov(jnp.asarray(C[:9, :9])))
    assert np.isfinite(info).all()
