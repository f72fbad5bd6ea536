"""Distributed FullInertialBA on the virtual 8-device CPU mesh (VERDICT
r3 item 4: 'extend the sharded step with the inertial chain' — ref:
Optimizer::FullInertialBA Optimizer.cc:420, the solve the reference's
GBA runs on inertial maps, LoopClosing.cc:2437-2440).

Visual observation blocks are sharded over the "obs" axis; the inertial
chain / bias-RW / prior edges are replicated (E = K-1 << O); the 15-dim
reduced system is solved with the matrix-free block-Jacobi PCG
(solve/schur_cg.py::pcg_solve_vi)."""

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh

from tpuslam.core import lie
from tpuslam.parallel.dist_ba import dist_viba_solve
from tests.test_inertial_ba import _make_problem


def _dist_solve(d, Rwb0, p0, v0, bg0, ba0, X0, fixed, n_devices=8,
                n_iters=10, cg_iters=300):
    devices = np.array(jax.devices()[:n_devices])
    mesh = Mesh(devices, ("obs",))
    K = d["K"]
    return dist_viba_solve(
        mesh, Rwb0, p0, v0, bg0, ba0, X0,
        d["obs_kf"], d["obs_pt"], d["uvr"], d["inv_sigma2"], d["stereo"],
        d["valid"], d["edges_a"], d["edges_b"], d["pre_stack"], d["info9"],
        np.zeros((K, 3)), np.zeros((K, 3)),
        d["rw_info_g"], d["rw_info_a"], fixed,
        d["fx"], d["fy"], d["cx"], d["cy"], 0.0,
        np.eye(3), np.zeros(3),
        n_iters=n_iters, cg_iters=cg_iters,
    )


def test_dist_viba_zero_residual_at_truth(rng):
    d = _make_problem(rng)
    K = d["K"]
    fixed = np.zeros(K, bool)
    fixed[0] = True
    Rf, pf, vf, bgf, baf, Xf, cost = _dist_solve(
        d, d["Rwb"], d["p"], d["v"], np.zeros((K, 3)), np.zeros((K, 3)),
        d["X"], fixed, n_iters=2)
    assert cost < 1.0
    np.testing.assert_allclose(pf, d["p"], atol=1e-3)


def test_dist_viba_recovers_perturbed_states(rng):
    """Same gates as the single-chip vi_ba_solve recovery test: the
    sharded 15-dim solve must pull poses/velocities/biases back to the
    ground truth from a perturbed start."""
    d = _make_problem(rng)
    K, P = d["K"], d["P"]
    fixed = np.zeros(K, bool)
    fixed[0] = True
    Rn = d["Rwb"].copy()
    pn = d["p"].copy()
    vn = d["v"] + rng.randn(K, 3) * 0.05
    for k in range(1, K):
        Rn[k] = Rn[k] @ np.asarray(
            lie.so3_exp(jnp.asarray(rng.randn(3) * 0.02)))
        pn[k] = pn[k] + rng.randn(3) * 0.05
    Xn = d["X"] + rng.randn(P, 3) * 0.05
    bgn = np.tile(rng.randn(3) * 0.01, (K, 1))
    ban = np.tile(rng.randn(3) * 0.05, (K, 1))
    Rf, pf, vf, bgf, baf, Xf, cost = _dist_solve(
        d, Rn, pn, vn, bgn, ban, Xn, fixed, n_iters=60)
    # tolerances match test_inertial_ba's perturbation test: with the
    # round-5 CORRECTED preintegration information the near-noiseless
    # problem has an elongated basin whose last ~2 cm converge only
    # asymptotically (stable at GT; cost drops ~1e3x from the start)
    np.testing.assert_allclose(pf, d["p"], atol=3e-2)
    np.testing.assert_allclose(vf, d["v"], atol=5e-2)
    for k in range(K):
        err = np.asarray(lie.so3_log(jnp.asarray(Rf[k].T @ d["Rwb"][k])))
        assert np.linalg.norm(err) < 1e-2, k
    assert np.abs(bgf).max() < 5e-3
    assert np.abs(baf).max() < 6e-2


def test_engine_routes_to_dist_viba(rng, monkeypatch):
    """window_inertial_ba with DIST_VIBA_MIN_OBS=0 must route through the
    distributed solver and land on (essentially) the same map state as
    the single-chip path — the ENGINE's inertial BA is the distributed
    FullInertialBA serving path."""
    import tpuslam.engine.inertial as EI
    from tests.test_engine_vi import _Cam, _build_map

    m1, calib, kfs, *_ = _build_map(np.random.RandomState(7))
    m2, _, _, *_ = _build_map(np.random.RandomState(7))
    EI.window_inertial_ba(
        m1, _Cam(), calib, np.ones(8), opt_kfs=kfs, fixed_kfs=[],
        n_iters=12, fix_first=True)
    monkeypatch.setattr(EI, "DIST_VIBA_MIN_OBS", 0)
    EI.window_inertial_ba(
        m2, _Cam(), calib, np.ones(8), opt_kfs=kfs, fixed_kfs=[],
        n_iters=12, fix_first=True)
    for k in kfs:
        assert np.abs(m1.kf_t[k] - m2.kf_t[k]).max() < 5e-3, k
        assert np.abs(m1.kf_R[k] - m2.kf_R[k]).max() < 5e-3, k


def test_dist_viba_fixed_pose_stays(rng):
    d = _make_problem(rng)
    K = d["K"]
    fixed = np.zeros(K, bool)
    fixed[0] = True
    Rn = d["Rwb"].copy()
    pn = d["p"] + np.concatenate(
        [np.zeros((1, 3)), rng.randn(K - 1, 3) * 0.03])
    Rf, pf, *_ = _dist_solve(
        d, Rn, pn, d["v"], np.zeros((K, 3)), np.zeros((K, 3)), d["X"],
        fixed, n_iters=8)
    np.testing.assert_allclose(pf[0], d["p"][0], atol=1e-12)
    np.testing.assert_allclose(Rf[0], d["Rwb"][0], atol=1e-12)
