"""Spanning-tree invariant checker (ref: Map::CheckEssentialGraph,
asserted after loop correction at LoopClosing.cc:1048-1050)."""

import numpy as np

from tpuslam.map.store import FrameFeatures, SlamMap


def _feats(rng, n=8):
    return FrameFeatures(
        xy=rng.rand(n, 2), und_xy=rng.rand(n, 2), norm_xy=rng.rand(n, 2),
        octave=np.zeros(n, np.int32), angle=np.zeros(n),
        response=np.ones(n), bits=np.zeros((n, 256), np.uint8),
        packed=np.zeros((n, 8), np.uint32), valid=np.ones(n, bool),
    )


def _chain_map(rng, n_kf=4):
    m = SlamMap(n_feat=8)
    ks = [m.add_keyframe(np.eye(3), np.zeros(3), _feats(rng), 0.1 * i, i)
          for i in range(n_kf)]
    mp = m.add_point(np.array([0.0, 0.0, 3.0]), ks[0], 0)
    for k in ks[1:]:
        m.add_observation(mp, k, 0)
    for k in ks[1:]:
        m.kf_parent[k] = k - 1
    return m, ks


def test_healthy_graph_passes():
    rng = np.random.RandomState(0)
    m, _ = _chain_map(rng)
    assert m.check_essential_graph() == []


def test_detects_bad_parent():
    rng = np.random.RandomState(0)
    m, ks = _chain_map(rng)
    m.kf_valid[ks[1]] = False  # kf 2's parent goes bad without reparenting
    errs = m.check_essential_graph()
    assert any("bad" in e for e in errs), errs


def test_detects_cycle():
    rng = np.random.RandomState(0)
    m, ks = _chain_map(rng)
    m.kf_parent[ks[0]] = ks[3]  # 0 -> 3 -> 2 -> 1 -> 0
    errs = m.check_essential_graph()
    assert any("cycle" in e or "root" in e for e in errs), errs


def test_detects_cross_map_parent():
    rng = np.random.RandomState(0)
    m, ks = _chain_map(rng)
    m.kf_map_id[ks[3]] = 1  # child in another map, parent left behind
    errs = m.check_essential_graph(map_id=1)
    assert any("another map" in e for e in errs), errs


def test_culling_preserves_invariant():
    """_erase_keyframe must reparent children (ref KeyFrame::SetBadFlag)."""
    rng = np.random.RandomState(0)
    m, ks = _chain_map(rng, n_kf=5)
    # emulate the local mapper's reparenting cull of kf 2
    cand = ks[2]
    for slot in np.nonzero(m.kf_mp[cand] >= 0)[0]:
        m.erase_observation(int(m.kf_mp[cand, slot]), cand)
    m.kf_valid[cand] = False
    for c in np.nonzero(m.kf_parent[: m.n_kf] == cand)[0]:
        m.kf_parent[c] = m.kf_parent[cand]
    assert m.check_essential_graph() == []
