"""Keyframe database: inverted BoW index + candidate detection.

Replaces the reference KeyFrameDatabase (src/KeyFrameDatabase.cc — inverted
file word->KFs :39 add, shared-word counting with 0.8*max cutoff,
covisibility-group score accumulation, top-N selection
DetectNBestCandidates :612, DetectRelocalizationCandidates :783).

The inverted file + shared-word histogram + L1 scoring run in the native
C++ core when available (tpuslam/native/mapcore.cpp, mirroring the
reference's C++ KeyFrameDatabase + DBoW2 ScoringObject); a pure-Python
structure provides the fallback. Candidate policy (cutoffs, covisibility
groups, top-N) stays in Python — it's control flow, not a hot loop.
"""

from __future__ import annotations

import numpy as np

from .vocab import BinaryVocabulary


class KeyFrameDatabase:
    def __init__(self, vocab: BinaryVocabulary):
        self.vocab = vocab
        self.kf_bow: dict[int, dict] = {}
        self.kf_words: dict[int, np.ndarray] = {}
        self._native = None
        try:
            from ..native import NativeInvIndex, available

            if available():
                self._native = NativeInvIndex(vocab.n_words)
        except Exception:
            self._native = None
        if self._native is None:
            self.inverted: list[list[int]] = [[] for _ in range(vocab.n_words)]

    def add(self, kf: int, word_ids: np.ndarray, bow: dict):
        words = np.unique(word_ids[word_ids >= 0])
        self.kf_bow[kf] = bow
        self.kf_words[kf] = words
        if self._native is not None:
            ws = np.sort(np.fromiter(bow.keys(), np.int32, len(bow)))
            vs = np.array([bow[int(w)] for w in ws], np.float32)
            self._native.add(kf, ws, vs)
        else:
            for w in words:
                self.inverted[int(w)].append(kf)

    def erase(self, kf: int):
        words = self.kf_words.pop(kf, None)
        if words is None:
            return
        self.kf_bow.pop(kf, None)
        if self._native is not None:
            self._native.erase(kf)
        else:
            for w in words:
                lst = self.inverted[int(w)]
                if kf in lst:
                    lst.remove(kf)

    # ------------------------------------------------------------- queries
    def _shared_words(self, bow: dict, exclude: set):
        if self._native is not None:
            q = np.fromiter(bow.keys(), np.int32, len(bow))
            x = np.fromiter(exclude, np.int64, len(exclude))
            kfs, cts = self._native.shared(q, x)
            return dict(zip(kfs.tolist(), cts.tolist()))
        counts: dict[int, int] = {}
        for w in bow:
            for kf in self.inverted[w]:
                if kf not in exclude:
                    counts[kf] = counts.get(kf, 0) + 1
        return counts

    def _score(self, bow: dict, kf: int) -> float:
        if self._native is not None:
            ws = np.sort(np.fromiter(bow.keys(), np.int32, len(bow)))
            vs = np.array([bow[int(w)] for w in ws], np.float32)
            return self._native.score(kf, ws, vs)
        return BinaryVocabulary.score(bow, self.kf_bow[kf])

    def detect_candidates(self, bow: dict, covis_of, exclude: set,
                          n_best: int = 3, min_common_ratio: float = 0.8):
        """Top-N candidate KFs by accumulated covisibility-group score
        (ref: DetectNBestCandidates KeyFrameDatabase.cc:612).

        covis_of: callable kf -> list of covisible KFs (for group scores).
        Returns list of (kf, group_score) best-first.
        """
        counts = self._shared_words(bow, exclude)
        if not counts:
            return []
        max_common = max(counts.values())
        th = max(int(max_common * min_common_ratio), 1)
        cands = [kf for kf, c in counts.items() if c >= th]
        if not cands:
            return []
        scores = {kf: self._score(bow, kf) for kf in cands}
        # accumulate over covisibility groups; keep the best member
        acc = []
        for kf in cands:
            group = [kf] + [o for o in covis_of(kf) if o in scores]
            total = sum(scores[g] for g in set(group))
            best_kf = max(set(group), key=lambda g: scores[g])
            acc.append((best_kf, total))
        acc.sort(key=lambda kv: -kv[1])
        out = []
        seen = set()
        for kf, sc in acc:
            if kf in seen:
                continue
            seen.add(kf)
            out.append((kf, sc))
            if len(out) >= n_best:
                break
        return out

    def detect_relocalization_candidates(self, bow: dict, covis_of,
                                         n_best: int = 5):
        """ref: DetectRelocalizationCandidates (:783) — same scheme, no
        exclusion set, 0.75*best-score group cutoff."""
        cands = self.detect_candidates(bow, covis_of, exclude=set(),
                                       n_best=max(n_best * 2, 8),
                                       min_common_ratio=0.8)
        if not cands:
            return []
        best = cands[0][1]
        return [(kf, s) for kf, s in cands if s >= 0.75 * best][:n_best]
