# coding: utf-8
"""Fast coarse hotword retrieval.

Behavioral port of the reference FastRAG (``fun_asr_gguf/hotword/
rag_fast.py``): phoneme strings are int-coded, hotwords are bucketed in an
inverted index on their first two phonemes (with similar-phoneme expansion
of the query), and candidates are scored by a unit-cost fuzzy substring
distance. The reference's numba @njit DP hot loop (``:36-77``) is replaced
by a **batched numpy DP**: all candidates are padded into one [C, L] code
matrix and every DP row is computed for all candidates at once, with the
in-row dependency resolved by a prefix min-scan — no JIT warm-up, same
results.
"""

from collections import defaultdict
from typing import Dict, List, Tuple

import numpy as np

from . import logger
from .algo_calc import SIMILAR_PHONEMES
from .algo_phoneme import Phoneme


class PhonemeEncoder:
    """str phoneme → int code (0 reserved for padding)."""

    def __init__(self):
        self.phoneme_to_code: Dict[str, int] = {}
        self.code_to_phoneme: Dict[int, str] = {}
        self.next_code = 1

    def encode(self, phoneme: str) -> int:
        code = self.phoneme_to_code.get(phoneme)
        if code is None:
            code = self.next_code
            self.phoneme_to_code[phoneme] = code
            self.code_to_phoneme[code] = phoneme
            self.next_code += 1
        return code

    def encode_sequence(self, phonemes: List[str]) -> np.ndarray:
        return np.array([self.encode(p) for p in phonemes], dtype=np.int32)


class PhonemeIndex:
    """Inverted index on the first two phonemes of each hotword."""

    def __init__(self):
        self.encoder = PhonemeEncoder()
        self.index: Dict[int, List[Tuple[str, np.ndarray]]] = defaultdict(list)
        self.all_hotwords: List[Tuple[str, np.ndarray]] = []

    def add(self, hotword: str, phonemes: List[Phoneme]):
        if not phonemes:
            return
        codes = self.encoder.encode_sequence([p.value for p in phonemes])
        for code in {int(codes[i]) for i in range(min(len(codes), 2))}:
            self.index[code].append((hotword, codes))
        self.all_hotwords.append((hotword, codes))

    def get_candidates(self, input_phonemes: List[Phoneme]
                       ) -> List[Tuple[str, np.ndarray]]:
        """Hotwords whose index phonemes occur in the input (with zh
        similar-phoneme expansion of the query, reference ``:166-177``)."""
        input_codes = set()
        for p in input_phonemes:
            code = self.encoder.phoneme_to_code.get(p.value)
            if code is not None:
                input_codes.add(code)
            if p.lang != "zh":
                continue
            for s_set in SIMILAR_PHONEMES:
                if p.value not in s_set:
                    continue
                for sim_val in s_set:
                    sim_code = self.encoder.phoneme_to_code.get(sim_val)
                    if sim_code is not None:
                        input_codes.add(sim_code)

        candidates, seen = [], set()
        for code in input_codes:
            for hw, codes in self.index.get(code, []):
                if hw not in seen:
                    candidates.append((hw, codes))
                    seen.add(hw)
        return candidates

    def encode_input(self, phonemes: List[Phoneme]) -> np.ndarray:
        return self.encoder.encode_sequence([p.value for p in phonemes])


def batched_fuzzy_distance(main_codes: np.ndarray,
                           subs: List[np.ndarray]) -> np.ndarray:
    """Unit-cost fuzzy substring distance of each sub inside main.

    dp[i][j] = min(dp[i-1][j]+1, dp[i][j-1]+1, dp[i-1][j-1]+(sub_i!=main_j));
    dp[0][j] = 0 (free start), answer = min_j dp[n][j].
    Prefers the native C++ kernel (native/dp_kernels.cc) when built;
    otherwise a candidate-batched numpy DP with a prefix min-scan for the
    in-row dependency. Returns [C] float32 distances.
    """
    from ..native import fuzzy_substring_distance_batch_native
    native = fuzzy_substring_distance_batch_native(main_codes, subs)
    if native is not None:
        return native
    c = len(subs)
    if c == 0:
        return np.zeros(0, np.float32)
    m = len(main_codes)
    lens = np.array([len(s) for s in subs], dtype=np.int32)
    if m == 0:
        return lens.astype(np.float32)
    n_max = int(lens.max())
    sub_mat = np.zeros((c, n_max), dtype=np.int32)
    for i, s in enumerate(subs):
        sub_mat[i, :len(s)] = s

    neq = (sub_mat[:, :, None] != main_codes[None, None, :]).astype(np.float32)

    j_idx = np.arange(1, m + 1, dtype=np.float32)
    prev = np.zeros((c, m + 1), dtype=np.float32)
    best = np.full(c, np.inf, dtype=np.float32)
    shifted = np.empty((c, m + 1), dtype=np.float32)
    for i in range(1, n_max + 1):
        cand = np.minimum(prev[:, 1:] + 1.0, prev[:, :-1] + neq[:, i - 1])
        shifted[:, 0] = float(i)
        shifted[:, 1:] = cand - j_idx
        scan = np.minimum.accumulate(shifted, axis=1)
        curr = np.empty_like(prev)
        curr[:, 0] = float(i)
        curr[:, 1:] = scan[:, 1:] + j_idx
        prev = curr
        finished = lens == i
        if finished.any():
            best[finished] = prev[finished].min(axis=1)
    return best


class FastRAG:
    """High-throughput coarse retriever (index + batched DP scoring)."""

    def __init__(self, threshold: float = 0.6):
        self.threshold = threshold
        self.index = PhonemeIndex()
        self.hotword_count = 0

    def add_hotwords(self, hotwords: Dict[str, List[Phoneme]]):
        for hw, phonemes in hotwords.items():
            if phonemes:
                self.index.add(hw, phonemes)
                self.hotword_count += 1

    def search(self, input_phonemes: List[Phoneme], top_k: int = 10
               ) -> List[Tuple[str, float]]:
        if not input_phonemes:
            return []
        input_codes = self.index.encode_input(input_phonemes)
        candidates = self.index.get_candidates(input_phonemes)
        results = self._score_candidates(input_codes, candidates)
        results.sort(key=lambda x: x[1], reverse=True)
        return results[:top_k]

    def _score_candidates(self, input_codes: np.ndarray,
                          candidates: List[Tuple[str, np.ndarray]]
                          ) -> List[Tuple[str, float]]:
        input_len = len(input_codes)
        kept = [(hw, codes) for hw, codes in candidates
                if len(codes) <= input_len + 3]        # length pre-filter
        if not kept:
            return []
        dists = batched_fuzzy_distance(input_codes,
                                       [codes for _, codes in kept])
        results = []
        for (hw, codes), dist in zip(kept, dists.tolist()):
            score = 1.0 - dist / len(codes)
            if score >= self.threshold:
                results.append((hw, round(score, 3)))
        return results

    def compute_score(self, input_phonemes, hotword_phonemes) -> float:
        """Exact score for one pair (re-ranking helper)."""
        input_codes = self.index.encode_input(input_phonemes)
        hw_codes = self.index.encode_input(hotword_phonemes)
        if len(hw_codes) == 0:
            return 0.0
        dist = float(batched_fuzzy_distance(input_codes, [hw_codes])[0])
        return max(0.0, 1.0 - dist / len(hw_codes))
