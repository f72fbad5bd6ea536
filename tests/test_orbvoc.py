"""Reference ORBvoc.{txt,bin} format IO (place/orbvoc.py).

Covers: parsing both on-disk formats (TemplatedVocabulary.h:1350/:1466),
densification of irregular DBoW2 trees (pruned children, early leaves)
onto the batched-descent layout, reference word-id preservation, and
round-trip of vocabularies trained here.
"""

import numpy as np
import pytest

from tpuslam.place import (
    BinaryVocabulary, load_orbvoc, save_orbvoc_binary, save_orbvoc_text,
    train_vocabulary,
)
from tpuslam.place.orbvoc import _bits_to_bytes


def _rand_bits(rng, n):
    return (rng.rand(n, 256) > 0.5).astype(np.uint8)


def _write_text_voc(path, k, L, lines):
    with open(path, "w") as f:
        f.write(f"{k} {L}  0 3\n")
        for parent, is_leaf, desc_bytes, weight in lines:
            f.write(f"{parent} {int(is_leaf)} "
                    + " ".join(str(int(b)) for b in desc_bytes)
                    + f" {weight}\n")


def _irregular_tree(rng):
    """k=2, L=2 DBoW2-style tree exercising the two irregular shapes:

        root ── n1 (interior) ── n3 (leaf, word0)
             │                └─ n4 (leaf, word1)
             └─ n2 (EARLY leaf at level 0, word2); root has no 3rd child
               (k=2 so root is full, but n2 is a leaf one level early)
    """
    # structured descriptors so quantization (per-level nearest node, the
    # reference's transform semantics) is deterministic: n1's subtree is
    # the all-zeros half of the space, n2 the all-ones half
    d = np.zeros((5, 256), np.uint8)
    d[1, :] = 0                  # n1 interior centroid
    d[2, :] = 1                  # n2 early leaf
    d[3, :10] = 1                # n3: near-zeros, distinct
    d[4, 128:138] = 1            # n4: near-zeros, distinct
    # (parent, is_leaf, desc_bytes, weight); ids implicit 1..4
    lines = [
        (0, 0, _bits_to_bytes(d[1]), 0.0),   # n1 interior
        (0, 1, _bits_to_bytes(d[2]), 0.7),   # n2 early leaf -> word 0
        (1, 1, _bits_to_bytes(d[3]), 0.3),   # n3 leaf -> word 1
        (1, 1, _bits_to_bytes(d[4]), 0.5),   # n4 leaf -> word 2
    ]
    return d, lines


def test_text_loader_irregular(tmp_path, rng):
    d, lines = _irregular_tree(rng)
    p = str(tmp_path / "voc.txt")
    _write_text_voc(p, 2, 2, lines)
    voc = load_orbvoc(p)
    assert voc.k == 2 and voc.L == 2 and voc.n_words == 3
    # exact-descriptor queries land on their own word, with the FILE's
    # word numbering (leaf file order: n2=0, n3=1, n4=2)
    q = np.stack([d[2], d[3], d[4]])
    word, node, bow = voc.transform(q, np.ones(3, bool))
    assert word.tolist() == [0, 1, 2]
    np.testing.assert_allclose(voc.word_weight, [0.7, 0.3, 0.5])


def test_binary_loader_matches_text(tmp_path, rng):
    d, lines = _irregular_tree(rng)
    pt = str(tmp_path / "voc.txt")
    _write_text_voc(pt, 2, 2, lines)
    # write the same tree in the Mac fork's binary layout by hand
    import struct
    pb = str(tmp_path / "voc.bin")
    with open(pb, "wb") as f:
        f.write(struct.pack("<IIiiii", len(lines) + 1, 41, 2, 2, 0, 3))
        for parent, is_leaf, desc_bytes, weight in lines:
            f.write(struct.pack("<i", parent))
            f.write(bytes(desc_bytes))
            f.write(struct.pack("<f?", weight, bool(is_leaf)))
    vt, vb = load_orbvoc(pt), load_orbvoc(pb)
    q = _rand_bits(np.random.RandomState(1), 64)
    wt, nt, _ = vt.transform(q, np.ones(64, bool))
    wb, nb, _ = vb.transform(q, np.ones(64, bool))
    np.testing.assert_array_equal(wt, wb)
    np.testing.assert_array_equal(nt, nb)
    for a, b in zip(vt.level_descs, vb.level_descs):
        np.testing.assert_array_equal(a, b)


@pytest.mark.parametrize("fmt", ["text", "binary"])
def test_trained_vocab_roundtrip(tmp_path, rng, fmt):
    """Vocabulary trained here -> reference file format -> reload:
    identical word assignment and weights (reference users can consume
    our vocabularies and vice versa)."""
    train = _rand_bits(rng, 300)
    voc = train_vocabulary(train, k=3, L=2, seed=0)
    p = str(tmp_path / ("voc.txt" if fmt == "text" else "voc.bin"))
    (save_orbvoc_text if fmt == "text" else save_orbvoc_binary)(voc, p)
    voc2 = load_orbvoc(p, node_levels_up=2)
    assert voc2.n_words == voc.n_words == 9
    q = _rand_bits(np.random.RandomState(2), 128)
    w1, n1, bow1 = voc.transform(q, np.ones(128, bool))
    w2, n2, bow2 = voc2.transform(q, np.ones(128, bool))
    np.testing.assert_array_equal(w1, w2)
    np.testing.assert_array_equal(n1, n2)
    assert bow1.keys() == bow2.keys()
    for w in bow1:
        assert abs(bow1[w] - bow2[w]) < 1e-6
    # weights survive the float32 binary format to ~1e-7
    np.testing.assert_allclose(voc2.word_weight, voc.word_weight,
                               atol=1e-6, rtol=1e-6)


def test_pruned_children_never_selected(tmp_path, rng):
    """A parent with fewer than k children: duplicate slots tie with the
    first real sibling and argmin must resolve to the real one."""
    d = _rand_bits(rng, 4)
    lines = [
        (0, 0, _bits_to_bytes(d[1]), 0.0),   # n1 interior, ONE child only
        (0, 1, _bits_to_bytes(d[2]), 1.0),   # n2 leaf -> word 0
        (1, 1, _bits_to_bytes(d[3]), 1.0),   # n3 leaf -> word 1 (only kid)
    ]
    p = str(tmp_path / "voc.txt")
    _write_text_voc(p, 2, 2, lines)
    voc = load_orbvoc(p)
    q = _rand_bits(np.random.RandomState(3), 256)
    word, _, _ = voc.transform(q, np.ones(256, bool))
    assert set(word.tolist()) <= {0, 1}  # never -1, never a dead slot


def test_npz_persists_leaf_word(tmp_path, rng):
    from tpuslam.place.store import load_vocabulary, save_vocabulary
    d, lines = _irregular_tree(rng)
    pt = str(tmp_path / "voc.txt")
    _write_text_voc(pt, 2, 2, lines)
    voc = load_orbvoc(pt)
    pz = str(tmp_path / "voc.npz")
    save_vocabulary(voc, pz)
    voc2 = load_vocabulary(pz)
    q = _rand_bits(np.random.RandomState(4), 32)
    np.testing.assert_array_equal(
        voc.transform(q, np.ones(32, bool))[0],
        voc2.transform(q, np.ones(32, bool))[0],
    )
