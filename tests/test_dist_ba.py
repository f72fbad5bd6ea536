"""Distributed BA on the virtual 8-device CPU mesh: must match the
single-device Schur BA solution."""

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh

from tpuslam.parallel import dist_ba as D
from tpuslam.solve import ba as B
from tests.test_solve import _prep_ba, FX, FY, CX, CY, BF


def test_dist_ba_matches_single(rng):
    R, t, X, args = _prep_ba(rng, n_pts=80, n_kf=5, noise=0.3)
    devices = np.array(jax.devices()[:8])
    mesh = Mesh(devices, ("obs",))
    Rf, tf, Xf, cost = D.dist_ba_solve(
        mesh,
        np.asarray(args["R"]), np.asarray(args["t"]), np.asarray(args["X"]),
        np.asarray(args["obs_kf"]), np.asarray(args["obs_pt"]),
        np.asarray(args["uvr"]), np.asarray(args["inv_sigma2"]),
        np.asarray(args["stereo"]), np.asarray(args["valid"]),
        np.asarray(args["fixed"]), FX, FY, CX, CY, BF, n_iters=12,
    )
    # converged to ground truth (same criteria as single-chip test)
    for k in range(2, len(R)):
        assert np.abs(Rf[k] - R[k]).max() < 2e-3
        assert np.abs(tf[k] - t[k]).max() < 2e-2
    # and agrees with the single-device solver's solution closely
    R1, t1, X1, _, _ = B.ba_solve_np(
        np.asarray(args["R"]), np.asarray(args["t"]), np.asarray(args["X"]),
        np.asarray(args["obs_kf"]), np.asarray(args["obs_pt"]),
        np.asarray(args["uvr"]), np.asarray(args["inv_sigma2"]),
        np.asarray(args["stereo"]), np.asarray(args["valid"]),
        np.asarray(args["fixed"]), FX, FY, CX, CY, BF, n_iters=12,
    )
    assert np.abs(Rf - R1).max() < 1e-4
    assert np.abs(tf - t1).max() < 1e-3


def test_shard_observations_balanced(rng):
    """Round-robin sharding: exact load balance; cross-shard landmark
    sums are handled by the psum in the matrix-free Schur solve, so no
    landmark alignment is required."""
    obs_pt = rng.randint(0, 50, 400).astype(np.int32)
    shards, per = D.shard_observations(obs_pt, 4)
    assert sum(len(s) for s in shards) == 400
    sizes = [len(s) for s in shards]
    assert max(sizes) - min(sizes) <= 1
    assert per >= max(sizes)


def test_dist_ba_in_step_acceptance(rng):
    """Hard problem (large initial noise + outliers): the in-step
    accept/reject must keep the cost monotone non-increasing. The
    round-2 lagged schedule applied iteration i's accept decision to
    iteration i-1's cost and could lock in a diverging step."""
    # 10x the usual initial perturbation: early LM trials overshoot and
    # must be REJECTED on their own post-step cost, then retried damped
    R, t, X, args = _prep_ba(rng, n_pts=60, n_kf=4, noise=0.3,
                             perturb_pose=0.3, perturb_pt=0.5)
    devices = np.array(jax.devices()[:4])
    mesh = Mesh(devices, ("obs",))
    Rf, tf, Xf, cost = D.dist_ba_solve(
        mesh,
        np.asarray(args["R"]), np.asarray(args["t"]), np.asarray(args["X"]),
        np.asarray(args["obs_kf"]), np.asarray(args["obs_pt"]),
        np.asarray(args["uvr"]), np.asarray(args["inv_sigma2"]),
        np.asarray(args["stereo"]), np.asarray(args["valid"]),
        np.asarray(args["fixed"]), FX, FY, CX, CY, BF, n_iters=25,
    )
    # still converges to ground truth from the hard start
    for k in range(2, len(R)):
        assert np.abs(Rf[k] - R[k]).max() < 5e-3, k
        assert np.abs(tf[k] - t[k]).max() < 5e-2, k
