"""Native map-runtime core: parity with the pure-Python paths."""

import numpy as np
import pytest

from tpuslam.map.store import FrameFeatures, SlamMap

try:
    from tpuslam.native import NativeObsIndex, available
    HAVE_NATIVE = available()
except Exception:
    HAVE_NATIVE = False

pytestmark = pytest.mark.skipif(not HAVE_NATIVE,
                                reason="native toolchain unavailable")


def _feats(rng, n):
    return FrameFeatures(
        xy=rng.rand(n, 2), und_xy=rng.rand(n, 2), norm_xy=rng.rand(n, 2),
        octave=rng.randint(0, 8, n).astype(np.int32), angle=np.zeros(n),
        response=np.ones(n), bits=np.zeros((n, 256), np.uint8),
        packed=np.zeros((n, 8), np.uint32), valid=np.ones(n, bool),
    )


def _random_map(rng, use_native, K=12, P=150, n_feat=40):
    m = SlamMap(n_feat=n_feat)
    if not use_native:
        m._native = None
    kfs = [m.add_keyframe(np.eye(3), rng.randn(3), _feats(rng, n_feat),
                          float(k), k) for k in range(K)]
    mps = []
    for j in range(P):
        k0 = int(rng.randint(K))
        slot = int(rng.randint(n_feat))
        if m.kf_mp[k0, slot] >= 0:
            continue
        mp = m.add_point(rng.randn(3) + [0, 0, 5], k0, slot)
        mps.append(mp)
        for k in rng.choice(K, rng.randint(1, 6), replace=False):
            slot = int(rng.randint(n_feat))
            if m.kf_mp[k, slot] < 0:
                m.add_observation(mp, int(k), slot)
    # some churn: erase / replace / kill
    for mp in mps[:20]:
        if m.mp_valid[mp] and len(m.mp_obs[mp]) > 2:
            m.erase_observation(mp, next(iter(m.mp_obs[mp])))
    for a, b in zip(mps[20:26], mps[26:32]):
        if m.mp_valid[a] and m.mp_valid[b] and a != b:
            m.replace_point(a, b)
    for mp in mps[32:36]:
        if m.mp_valid[mp]:
            m.set_bad_point(mp)
    return m, kfs


def test_covis_parity(rng):
    seed = rng.randint(1 << 30)
    m_n, kfs = _random_map(np.random.RandomState(seed), use_native=True)
    m_p, _ = _random_map(np.random.RandomState(seed), use_native=False)
    assert m_n._native is not None and m_p._native is None
    for kf in kfs:
        m_n.update_connections(kf)
        m_p.update_connections(kf)
        assert m_n.covis[kf] == m_p.covis[kf], kf


def test_redundancy_parity(rng):
    seed = rng.randint(1 << 30)
    m_n, kfs = _random_map(np.random.RandomState(seed), use_native=True)
    m_p, _ = _random_map(np.random.RandomState(seed), use_native=False)
    for kf in kfs:
        assert m_n.redundancy(kf) == m_p.redundancy(kf), kf


def test_native_mirror_consistency(rng):
    m, kfs = _random_map(rng, use_native=True)
    for mp in range(m.n_mp):
        ks, slots = m._native.items(mp)
        native = dict(zip(ks.tolist(), slots.tolist()))
        assert native == {int(k): int(s) for k, s in m.mp_obs[mp].items()}, mp


def test_rebuild_after_checkpoint(tmp_path, rng):
    from tpuslam.map.checkpoint import load_map, save_map

    m, kfs = _random_map(rng, use_native=True)
    p = str(tmp_path / "m.npz")
    save_map(m, p)
    m2 = SlamMap(n_feat=40)
    load_map(m2, p)
    for kf in kfs:
        m.update_connections(kf)
        m2.update_connections(kf)
        assert m.covis[kf] == m2.covis[kf]


def test_inverted_index_parity(rng):
    """Native inverted BoW index vs the pure-Python KeyFrameDatabase:
    identical shared-word histograms, L1 scores and candidate rankings."""
    from tpuslam.place.kfdb import KeyFrameDatabase
    from tpuslam.place.vocab import BinaryVocabulary
    from tpuslam.place import train_vocabulary

    descs = (rng.rand(400, 256) > 0.5).astype(np.uint8)
    vocab = train_vocabulary(descs, k=4, L=3, iters=3)
    db_n = KeyFrameDatabase(vocab)
    db_p = KeyFrameDatabase(vocab)
    db_p._native = None
    db_p.inverted = [[] for _ in range(vocab.n_words)]
    assert db_n._native is not None, "native core must build in this env"

    bows = []
    for kf in range(12):
        bits = (rng.rand(60, 256) > 0.5).astype(np.uint8)
        word, node, bow = vocab.transform(bits, np.ones(60, bool))
        db_n.add(kf, word, bow)
        db_p.add(kf, word, bow)
        bows.append(bow)

    covis = lambda k: [max(0, k - 1), min(11, k + 1)]
    for q in range(12):
        sh_n = db_n._shared_words(bows[q], {q})
        sh_p = db_p._shared_words(bows[q], {q})
        assert sh_n == sh_p, q
        for kf in sh_n:
            assert abs(db_n._score(bows[q], kf) - db_p._score(bows[q], kf)) < 1e-5
        c_n = db_n.detect_candidates(bows[q], covis, {q})
        c_p = db_p.detect_candidates(bows[q], covis, {q})
        assert [k for k, _ in c_n] == [k for k, _ in c_p], q

    # erasure parity
    db_n.erase(3)
    db_p.erase(3)
    for q in (2, 4):
        assert db_n._shared_words(bows[q], set()) == db_p._shared_words(bows[q], set())
