# coding: utf-8
"""Phoneme-based hotword correction (the production corrector).

Behavioral port of the reference PhonemeCorrector
(``fun_asr_gguf/hotword/hot_phoneme.py``): two-stage retrieval — FastRAG
coarse filter then boundary-constrained fuzzy search — classifying windows
into ``matchs`` (score ≥ threshold, replaced in place) and ``similars``
(score ≥ similar_threshold, deduped/sorted, top-k — these feed the LLM
prompt as hotword hints). Hotword swaps are thread-safe.
"""

import threading
import time
from typing import Dict, List, NamedTuple, Optional, Tuple

from . import logger
from .algo_calc import fuzzy_substring_search_constrained
from .algo_phoneme import Phoneme, get_phoneme_info
from .rag_fast import FastRAG


class MatchResult(NamedTuple):
    start: int
    end: int
    score: float
    hotword: str


class CorrectionResult(NamedTuple):
    text: str
    matchs: List[Tuple[str, str, float]]    # (original, hotword, score)
    similars: List[Tuple[str, str, float]]


class PhonemeCorrector:
    """Two-stage fuzzy hotword corrector."""

    def __init__(self, threshold: float = 0.7,
                 similar_threshold: Optional[float] = None):
        self.threshold = threshold
        self.similar_threshold = (similar_threshold
                                  if similar_threshold is not None
                                  else threshold - 0.2)
        self.max_diff = 2
        self.top_k_candidates = 100
        self.hotwords: Dict[str, List[Phoneme]] = {}
        self.fast_rag = FastRAG(
            threshold=min(self.threshold, self.similar_threshold) - 0.1)
        self._lock = threading.Lock()

    def update_hotwords(self, hotword_text: str) -> int:
        """Replace the hotword set (thread-safe). Lines starting with '#'
        and blanks are ignored."""
        start_time = time.time()
        lines = [line.strip() for line in hotword_text.splitlines()
                 if line.strip() and not line.strip().startswith("#")]
        new_hotwords = {}
        for hw in lines:
            phons = get_phoneme_info(hw)
            if phons:
                new_hotwords[hw] = phons
        with self._lock:
            self.hotwords = new_hotwords
            self.fast_rag = FastRAG(
                threshold=min(self.threshold, self.similar_threshold) - 0.1)
            self.fast_rag.add_hotwords(new_hotwords)
        logger.debug("PhonemeCorrector updated %d hotwords in %.3fs",
                     len(new_hotwords), time.time() - start_time)
        return len(new_hotwords)

    def _find_matches(self, text: str, fast_results, input_processed
                      ) -> Tuple[List[MatchResult],
                                 List[Tuple[str, str, float]]]:
        matches: List[MatchResult] = []
        similars: List[Tuple[str, str, float]] = []
        search_threshold = min(self.threshold, self.similar_threshold) - 0.1

        for hw, _fast_score in fast_results:
            hw_compare = [p.info[:5] for p in self.hotwords[hw]]
            found = fuzzy_substring_search_constrained(
                hw_compare, input_processed, threshold=search_threshold)
            for score, start_idx, end_idx in found:
                char_start = input_processed[start_idx][5]
                char_end = input_processed[end_idx - 1][6]
                if score >= self.threshold:
                    matches.append(MatchResult(char_start, char_end, score, hw))
                if score >= self.similar_threshold:
                    similars.append((text[char_start:char_end], hw, score))

        # keep the best-scoring window per distinct hotword for the hints
        similars.sort(key=lambda x: (x[2], len(x[1])), reverse=True)
        final_similars, seen_hw = [], set()
        for origin, hw, score in similars:
            if hw not in seen_hw:
                final_similars.append((origin, hw, score))
                seen_hw.add(hw)
        return matches, final_similars

    def _resolve_and_replace(self, text: str, matches: List[MatchResult]):
        """Overlap resolution (score, then span length) + in-place edits."""
        matches.sort(key=lambda m: (m.score, m.end - m.start), reverse=True)
        final_matches: List[MatchResult] = []
        all_matched_info, seen_hw_score = [], set()
        occupied: List[Tuple[int, int]] = []
        for m in matches:
            if (m.hotword, m.score) not in seen_hw_score:
                all_matched_info.append((m.hotword, m.score))
                seen_hw_score.add((m.hotword, m.score))
            if m.score < self.threshold:
                continue
            if any(not (m.end <= s or m.start >= e) for s, e in occupied):
                continue
            if text[m.start:m.end] != m.hotword:
                final_matches.append(m)
            occupied.append((m.start, m.end))

        final_matches.sort(key=lambda m: m.start, reverse=True)
        chars = list(text)
        for m in final_matches:
            chars[m.start:m.end] = list(m.hotword)
        replaced = [(text[m.start:m.end], m.hotword, m.score)
                    for m in final_matches]
        return "".join(chars), replaced, all_matched_info

    def correct(self, text: str, k: int = 10) -> CorrectionResult:
        """Correct ``text`` in place and return top-k similar hotwords."""
        if not text or not self.hotwords:
            return CorrectionResult(text=text, matchs=[], similars=[])
        input_phonemes = get_phoneme_info(text)
        if not input_phonemes:
            return CorrectionResult(text=text, matchs=[], similars=[])

        with self._lock:
            fast_results = self.fast_rag.search(input_phonemes, top_k=100)
            input_processed = [p.info for p in input_phonemes]
            matches, similars = self._find_matches(text, fast_results,
                                                   input_processed)

        new_text, final_hw_info, _all_hw_info = self._resolve_and_replace(
            text, matches)
        return CorrectionResult(text=new_text, matchs=final_hw_info,
                                similars=similars[:k])
