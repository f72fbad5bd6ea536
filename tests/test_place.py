"""Binary vocabulary + keyframe database (place recognition)."""

import numpy as np
import pytest

from tpuslam.place import BinaryVocabulary, KeyFrameDatabase, train_vocabulary


_PROTOS = np.random.RandomState(99).rand(1024, 256) > 0.5


def _random_descs(rng, n):
    """Descriptors clustered around shared prototypes (real ORB patch
    statistics cluster; uniform-random bits are the degenerate case)."""
    proto = _PROTOS[rng.randint(0, len(_PROTOS), n)]
    flip = rng.rand(n, 256) < 0.12
    return (proto ^ flip).astype(np.uint8)


def _perturb(rng, descs, n_flip):
    out = descs.copy()
    for i in range(len(out)):
        flip = rng.choice(256, n_flip, replace=False)
        out[i, flip] ^= 1
    return out


@pytest.fixture(scope="module")
def vocab():
    rng = np.random.RandomState(0)
    train = _random_descs(rng, 4000)
    return train_vocabulary(train, k=8, L=3, iters=5)


def test_transform_basic(vocab):
    rng = np.random.RandomState(1)
    d = _random_descs(rng, 100)
    valid = np.ones(100, bool)
    valid[-10:] = False
    word, node, bow = vocab.transform(d, valid)
    assert (word[:90] >= 0).all() and (word[:90] < vocab.n_words).all()
    assert (word[-10:] == -1).all()
    # node ids are ancestors of words: word // k^(L-1-node_level)
    depth = vocab.L - 1 - vocab.node_level
    np.testing.assert_array_equal(word[:90] // vocab.k ** depth, node[:90])
    assert abs(sum(bow.values()) - 1.0) < 1e-9


def test_similar_images_score_higher(vocab):
    """A perturbed copy of an image's descriptors must score higher than an
    unrelated image."""
    rng = np.random.RandomState(2)
    a = _random_descs(rng, 300)
    a_noisy = _perturb(rng, a, 12)   # ~5% bits flipped
    b = _random_descs(rng, 300)
    valid = np.ones(300, bool)
    _, _, bow_a = vocab.transform(a, valid)
    _, _, bow_an = vocab.transform(a_noisy, valid)
    _, _, bow_b = vocab.transform(b, valid)
    s_same = BinaryVocabulary.score(bow_a, bow_an)
    s_diff = BinaryVocabulary.score(bow_a, bow_b)
    assert s_same > 1.5 * s_diff, (s_same, s_diff)


def test_kfdb_retrieval(vocab):
    """The database must retrieve the matching keyframe for a noisy query."""
    rng = np.random.RandomState(3)
    db = KeyFrameDatabase(vocab)
    kf_descs = []
    valid = np.ones(200, bool)
    for kf in range(12):
        d = _random_descs(rng, 200)
        kf_descs.append(d)
        word, node, bow = vocab.transform(d, valid)
        db.add(kf, word, bow)
    covis_of = lambda kf: []  # no covisibility in this synthetic setup
    # query = noisy copy of kf 7
    q = _perturb(rng, kf_descs[7], 10)
    _, _, bow_q = vocab.transform(q, valid)
    cands = db.detect_candidates(bow_q, covis_of, exclude=set(), n_best=3)
    assert cands and cands[0][0] == 7
    # excluding 7 must not return it
    cands2 = db.detect_candidates(bow_q, covis_of, exclude={7}, n_best=3)
    assert all(kf != 7 for kf, _ in cands2)
    # erase and re-query
    db.erase(7)
    cands3 = db.detect_candidates(bow_q, covis_of, exclude=set(), n_best=3)
    assert all(kf != 7 for kf, _ in cands3)


def test_reloc_candidates(vocab):
    rng = np.random.RandomState(4)
    db = KeyFrameDatabase(vocab)
    valid = np.ones(150, bool)
    descs = []
    for kf in range(8):
        d = _random_descs(rng, 150)
        descs.append(d)
        word, _, bow = vocab.transform(d, valid)
        db.add(kf, word, bow)
    q = _perturb(rng, descs[2], 8)
    _, _, bow_q = vocab.transform(q, valid)
    cands = db.detect_relocalization_candidates(bow_q, lambda kf: [])
    assert cands and cands[0][0] == 2
