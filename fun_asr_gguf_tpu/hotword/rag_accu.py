# coding: utf-8
"""Accurate second-stage hotword retrieval.

Behavioral port of the reference AccuRAG (``fun_asr_gguf/hotword/
rag_accu.py``): precise fuzzy-weight scoring via the word-boundary-
constrained ``find_best_match`` DP, intended as stage 2 after FastRAG's
coarse filter (the production path uses
``fuzzy_substring_search_constrained`` instead; this API ships for parity).
"""

from typing import Dict, List, Optional, Tuple

from . import logger
from .algo_calc import find_best_match
from .algo_phoneme import Phoneme, get_phoneme_info


class AccuRAG:
    """Precise retriever with confusable-phoneme weights."""

    def __init__(self, threshold: float = 0.6):
        self.threshold = threshold
        self.hotwords: Dict[str, List[Phoneme]] = {}

    def update_hotwords(self, hotwords: Dict[str, List[Phoneme]]) -> int:
        self.hotwords = hotwords
        logger.debug("AccuRAG updated with %d hotwords", len(hotwords))
        return len(hotwords)

    def search(self, input_phonemes: List[Phoneme],
               candidate_hws: Optional[List[str]] = None,
               top_k: int = 10,
               apply_threshold: bool = True
               ) -> List[Tuple[str, float, int, int]]:
        """Returns [(hotword, score, start_idx, end_idx)] by score desc."""
        if not input_phonemes or not self.hotwords:
            return []
        targets = candidate_hws if candidate_hws else self.hotwords.keys()
        matches = []
        for hw in targets:
            hw_phonemes = self.hotwords.get(hw)
            if not hw_phonemes:
                continue
            if len(hw_phonemes) > len(input_phonemes) + 3:
                continue
            score, start_idx, end_idx = find_best_match(input_phonemes,
                                                        hw_phonemes)
            if not apply_threshold or score >= self.threshold:
                matches.append((hw, score, start_idx, end_idx))
        matches.sort(key=lambda x: x[1], reverse=True)
        return matches[:top_k]

    def search_from_text(self, text: str,
                         candidate_hws: Optional[List[str]] = None,
                         top_k: int = 10):
        input_phonemes = get_phoneme_info(text)
        if not input_phonemes:
            return []
        return self.search(input_phonemes, candidate_hws, top_k)
