"""Hierarchical binary bag-of-words vocabulary.

Replaces vendored DBoW2 (Thirdparty/DBoW2/DBoW2/TemplatedVocabulary.h:1751
— k-branching depth-L tree of 256-bit ORB descriptors, transform() descends
by argmin Hamming per level recording the word and an upper-level node id;
FORB.cpp:85 Hamming distance; ScoringObject.cpp L1 scoring; vocabulary
trained by recursive k-majority clustering).

TPU-native redesign: the tree is dense per-level arrays (children of node
n at level l are rows n*k..n*k+k-1 of level_descs[l]), and transform() is
a fixed-depth scan of gather + XOR-popcount argmin over ALL query
descriptors at once — L batched dispatches instead of a per-descriptor
pointer walk. Training is k-majority (bitwise-median) Lloyd iterations
with all distance computations batched on device.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp


def _popcount_dist(a_bits, b_bits):
    """Hamming distance between a [N,256] and b [M,256] 0/1 u8 arrays via
    XOR-sum (device). Returns [N,M] int32."""
    a = jnp.asarray(a_bits, jnp.int8)
    b = jnp.asarray(b_bits, jnp.int8)
    # (a - b)^2 sum == hamming for 0/1 entries; use matmul identity:
    # |a - b|^2 = |a| + |b| - 2 a.b  (MXU path)
    an = jnp.sum(a.astype(jnp.int32), -1)
    bn = jnp.sum(b.astype(jnp.int32), -1)
    ab = jax.lax.dot_general(
        a.astype(jnp.bfloat16), b.astype(jnp.bfloat16),
        (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32,
    ).astype(jnp.int32)
    return an[:, None] + bn[None, :] - 2 * ab


@jax.jit
def _assign(descs, centers):
    d = _popcount_dist(descs, centers)
    return jnp.argmin(d, -1), jnp.min(d, -1)


def _kmajority(descs: np.ndarray, k: int, rng, iters: int = 8):
    """k-majority clustering of binary descriptors (DBoW2's meanValue =
    bitwise majority). Returns (centers [k,256], assign [M])."""
    M = len(descs)
    if M <= k:
        centers = np.zeros((k, 256), np.uint8)
        centers[:M] = descs
        return centers, np.arange(M) % k
    centers = descs[rng.choice(M, k, replace=False)].copy()
    assign = None
    for _ in range(iters):
        assign = np.asarray(_assign(jnp.asarray(descs), jnp.asarray(centers))[0])
        for c in range(k):
            sel = descs[assign == c]
            if len(sel) == 0:
                centers[c] = descs[rng.randint(M)]  # re-seed empty cluster
            else:
                centers[c] = (sel.mean(0) > 0.5).astype(np.uint8)
    assign = np.asarray(_assign(jnp.asarray(descs), jnp.asarray(centers))[0])
    return centers, assign


@dataclass
class BinaryVocabulary:
    k: int                      # branching factor
    L: int                      # depth (words = k^L leaves)
    level_descs: list           # per level l: [k^(l+1), 256] u8 node descs
    word_weight: np.ndarray     # [n_words] idf, indexed by word id
    node_level: int             # level whose ids feed node-aligned matching
                                # (ref transform(...,4): L-4 from leaves)
    leaf_word: np.ndarray = None  # [k^L] bottom slot -> word id (or -1);
                                  # None = identity (complete trained tree)

    @property
    def n_words(self):
        return len(self.word_weight)

    def word_of(self, pos: int) -> int:
        """Word id of bottom-level positional slot `pos`."""
        return int(self.leaf_word[pos]) if self.leaf_word is not None else pos

    def transform(self, bits: np.ndarray, valid: np.ndarray):
        """bits [N,256] u8 -> (word_ids [N], node_ids [N], bow dict).

        word_id = leaf index; node_id = ancestor at node_level (for the
        reference's FeatureVector node-aligned matching,
        ORBmatcher.cc:289-297). Invalid rows get word -1.
        """
        ids = _descend(jnp.asarray(bits),
                       [jnp.asarray(d) for d in self.level_descs], self.k)
        ids = np.asarray(ids)
        word = np.where(valid, ids[self.L - 1], -1)
        if self.leaf_word is not None:  # irregular (reference-file) tree
            word = np.where(word >= 0, self.leaf_word[word], -1)
        node = np.where(valid, ids[self.node_level], -1)
        bow: dict[int, float] = {}
        for w in word[word >= 0]:
            bow[int(w)] = bow.get(int(w), 0.0) + float(self.word_weight[w])
        norm = sum(bow.values())
        if norm > 0:
            bow = {w: v / norm for w, v in bow.items()}
        return word, node, bow

    @staticmethod
    def score(bow1: dict, bow2: dict) -> float:
        """L1 score of L1-normalized BoW vectors, in [0,1]
        (ref: DBoW2 ScoringObject.cpp L1Scoring)."""
        s = 0.0
        for w, v in bow1.items():
            u = bow2.get(w)
            if u is not None:
                s += abs(v) + abs(u) - abs(v - u)
        return 0.5 * s


@partial(jax.jit, static_argnames=("k",))
def _descend(bits, level_descs, k: int):
    """Batched tree descent: returns per-level node ids [L, N]."""
    N = bits.shape[0]
    ids = jnp.zeros(N, jnp.int32)
    out = []
    for descs in level_descs:
        base = ids * k
        children = descs[base[:, None] + jnp.arange(k)[None, :]]  # [N,k,256]
        a = bits.astype(jnp.int8)
        c = children.astype(jnp.int8)
        an = jnp.sum(a.astype(jnp.int32), -1)
        cn = jnp.sum(c.astype(jnp.int32), -1)
        ac = jnp.einsum("nd,nkd->nk", a.astype(jnp.float32),
                        c.astype(jnp.float32)).astype(jnp.int32)
        d = an[:, None] + cn - 2 * ac
        ids = base + jnp.argmin(d, -1).astype(jnp.int32)
        out.append(ids)
    return jnp.stack(out)


def train_vocabulary(descs: np.ndarray, k: int = 10, L: int = 3,
                     seed: int = 0, node_levels_up: int = 2,
                     iters: int = 8) -> BinaryVocabulary:
    """Recursive k-majority training (ref TemplatedVocabulary::create).

    descs: [M,256] 0/1 uint8 training descriptors.
    node_levels_up: node level = L - node_levels_up (ref levelsup=4 on a
    depth-6 vocab; scaled down for smaller trees).
    """
    rng = np.random.RandomState(seed)
    level_descs = []
    groups = {(): descs}
    for l in range(L):
        n_nodes = k ** (l + 1)
        descs_l = np.zeros((n_nodes, 256), np.uint8)
        next_groups = {}
        for path, sub in groups.items():
            base = 0
            for d in path:
                base = base * k + d
            centers, assign = _kmajority(sub, k, rng, iters)
            descs_l[base * k:(base + 1) * k] = centers
            for c in range(k):
                next_groups[path + (c,)] = sub[assign == c]
        level_descs.append(descs_l)
        groups = next_groups
    # idf weights from training term frequencies
    counts = np.zeros(k ** L, np.int64)
    for path, sub in groups.items():
        w = 0
        for d in path:
            w = w * k + d
        counts[w] = len(sub)
    M = max(len(descs), 1)
    weight = np.log(M / np.maximum(counts, 1)).astype(np.float64)
    weight[counts == 0] = 0.0
    return BinaryVocabulary(
        k=k, L=L, level_descs=level_descs, word_weight=weight,
        node_level=max(L - 1 - node_levels_up, 0),
    )
