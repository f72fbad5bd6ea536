"""End-to-end loop closing on a synthetic circular trajectory (SURVEY.md §7
step 11 gate): the camera completes a circle; place recognition must fire,
Sim3 verification must pass, and the essential-graph correction must keep
the map consistent."""

import numpy as np
import pytest

from tpuslam.cameras import Pinhole
from tpuslam.engine import System
from tpuslam.engine.config import LoopConfig, SlamConfig, TrackingConfig
from tpuslam.engine.tracking import State
from tpuslam.eval.ate import ate_rmse
from tpuslam.io.synthetic import SyntheticSequence
from tpuslam.ops.orb import OrbConfig
from tpuslam.place import train_vocabulary

pytestmark = pytest.mark.slow  # multi-minute renderer+engine e2e


@pytest.fixture(scope="module")
def loop_run():
    seq = SyntheticSequence(n_frames=92, fps=8, speed=1.0, kind="loop")
    cam = Pinhole([seq.fx, seq.fy, seq.cx, seq.cy], seq.width, seq.height)
    cfg = SlamConfig(
        orb=OrbConfig(n_features=800),
        tracking=TrackingConfig(max_frames_between_kf=4,
                                min_matches_init=60,
                                motion_model_radius=25.0,
                                time_recently_lost=2.0),
        loop=LoopConfig(min_proj_matches=35, min_bow_matches=15),
    )
    # vocabulary trained on frames of the same room (offline step, like the
    # reference's ORBvoc)
    from tpuslam.engine.frontend import Frontend
    fe = Frontend(cam, cfg.orb)
    descs = []
    for i in (0, 10, 20, 30):
        f = fe.process(seq.frame(i))
        descs.append(f.bits[f.valid])
    vocab = train_vocabulary(np.concatenate(descs), k=8, L=3, iters=5)
    slam = System(cam, cfg, vocab=vocab)
    times = seq.timestamps()
    for i in range(seq.n_frames):
        slam.track_monocular(seq.frame(i), times[i])
    slam.shutdown()  # join background GBA before assertions
    return seq, slam


def test_loop_closed(loop_run):
    """A place-recognition event must fire on the revisit: either a
    same-map loop closure or an Atlas merge after a mid-circle loss
    spawned a second map (the reference's recovery story,
    LoopClosing::MergeLocal)."""
    seq, slam = loop_run
    assert slam.get_tracking_state() == State.OK
    assert slam.loop_closer.n_loops_closed >= 1
    # after a merge the atlas collapses back to one active map
    assert len(slam.map.map_ids()) == 1


def test_trajectory_after_loop(loop_run):
    """Hard gate (promoted round 4; xpassed consistently in round 3): the
    loop-closed trajectory must beat 5% of the circle circumference."""
    seq, slam = loop_run
    traj = slam.trajectory_tum()
    est = np.array([[r[1], r[2], r[3]] for r in traj])
    gt = []
    for r in traj:
        Rcw, tcw = seq.gt_pose_cw(r[0])
        gt.append(-Rcw.T @ tcw)
    gt = np.array(gt)
    rmse, _ = ate_rmse(est, gt, with_scale=True)
    circumference = 2 * np.pi * 1.6
    assert rmse < 0.05 * circumference, rmse


def test_map_consistent_after_loop(loop_run):
    seq, slam = loop_run
    m = slam.map
    for j in m.valid_mp_ids():
        for kf, slot in m.mp_obs[int(j)].items():
            assert m.kf_mp[kf, slot] == j
            assert m.kf_valid[kf]
    for k in m.valid_kf_ids():
        for s in np.nonzero(m.kf_mp[k] >= 0)[0]:
            j = int(m.kf_mp[k, s])
            assert m.mp_valid[j]
            assert m.mp_obs[j].get(int(k)) == s
