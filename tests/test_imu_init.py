"""IMU initialization: recover scale, gravity direction, biases and
velocities from up-to-scale visual poses + preintegrated IMU."""

import numpy as np
import jax
import jax.numpy as jnp

from tpuslam.core import lie
from tpuslam.imu import preintegration as PI
from tpuslam.imu.init import inertial_init_solve, gyro_bias_from_rotations
from tpuslam.io.synthetic import SyntheticSequence

import pytest

pytestmark = pytest.mark.slow  # multi-minute renderer+engine e2e


def _vi_init_problem(rng, K=10, s_true=2.5, bg_true=(0.004, -0.003, 0.002),
                     ba_true=(0.0, 0.0, 0.0)):
    """Visual world frame = true world rotated by R_vw and scaled by 1/s."""
    seq = SyntheticSequence(n_frames=K, fps=4.0, imu_rate=400.0)
    tr = seq.traj
    times = seq.timestamps()
    R_vw = np.asarray(lie.so3_exp(jnp.asarray([0.25, -0.15, 0.4])))
    bg_true = np.asarray(bg_true)
    ba_true = np.asarray(ba_true)
    Rwb_vis = np.stack([R_vw @ tr.pose_cw(t)[0].T for t in times])
    p_vis = np.stack([R_vw @ tr.pos(t) / s_true for t in times])
    v_metric = np.stack([R_vw @ tr.vel(t) for t in times])
    pres = []
    for k in range(K - 1):
        ts, ws, accs = seq.imu_between(times[k], times[k + 1])
        dts = np.diff(np.concatenate([[times[k]], ts]))
        pres.append(
            PI.preintegrate(
                jnp.asarray(ws + bg_true), jnp.asarray(accs + ba_true),
                jnp.asarray(dts), jnp.zeros(3), jnp.zeros(3),
                1e-6, 1e-5, 1e-9, 1e-8,
            )
        )
    pre_stack = jax.tree.map(lambda *xs: jnp.stack(xs), *pres)
    info9 = jnp.stack([PI.information_from_cov(pre["C"][:9, :9]) for pre in pres])
    edges_a = jnp.arange(K - 1, dtype=jnp.int32)
    edges_b = edges_a + 1
    # gravity direction in the visual frame
    g_vis = R_vw @ np.array([0.0, 0.0, -1.0])
    return dict(Rwb=Rwb_vis, p=p_vis, v=v_metric, pre_stack=pre_stack,
                info9=info9, edges_a=edges_a, edges_b=edges_b,
                pres=pres, g_vis=g_vis, s_true=s_true, bg_true=bg_true)


def test_gyro_bias_bootstrap(rng):
    d = _vi_init_problem(rng)
    K = len(d["Rwb"])
    R1 = jnp.asarray(d["Rwb"][:-1])
    R2 = jnp.asarray(d["Rwb"][1:])
    bg = gyro_bias_from_rotations(
        (R1, R2), d["pre_stack"]["dR"], d["pre_stack"]["JRg"])
    np.testing.assert_allclose(np.asarray(bg), d["bg_true"], atol=2e-4)


def test_inertial_init_recovers_scale_gravity(rng):
    d = _vi_init_problem(rng)
    K = len(d["Rwb"])
    out = inertial_init_solve(
        jnp.asarray(d["Rwb"]), jnp.asarray(d["p"]), jnp.zeros((K, 3)),
        d["edges_a"], d["edges_b"], d["pre_stack"], d["info9"],
        # 120 iterations: the corrected preintegration information
        # (round 5) makes the position terms ~1e3 stiffer, and the
        # init landscape needs ~100 LM steps to walk the scale/gravity
        # valley (measured: 30 -> s=1.54, 100 -> s=2.4993)
        prior_g=1.0, prior_a=1e8, n_iters=120,
    )
    s = float(out["scale"])
    assert abs(s - d["s_true"]) / d["s_true"] < 0.02, s
    g_est = np.asarray(out["Rwg"] @ jnp.asarray([0.0, 0.0, -1.0]))
    cos = float(np.dot(g_est, d["g_vis"]))
    assert cos > 0.9998, (g_est, d["g_vis"])  # < ~1 deg
    np.testing.assert_allclose(np.asarray(out["bg"]), d["bg_true"], atol=5e-4)
    np.testing.assert_allclose(np.asarray(out["v"]), d["v"], atol=0.05)


def test_inertial_init_stereo_no_scale(rng):
    """With mono_scale=False (stereo/RGB-D path) scale stays 1."""
    d = _vi_init_problem(rng, s_true=1.0)
    K = len(d["Rwb"])
    out = inertial_init_solve(
        jnp.asarray(d["Rwb"]), jnp.asarray(d["p"]), jnp.zeros((K, 3)),
        d["edges_a"], d["edges_b"], d["pre_stack"], d["info9"],
        prior_g=1.0, prior_a=1e8, n_iters=30, mono_scale=False,
    )
    assert float(out["scale"]) == 1.0
    g_est = np.asarray(out["Rwg"] @ jnp.asarray([0.0, 0.0, -1.0]))
    assert float(np.dot(g_est, d["g_vis"])) > 0.9998
