# coding: utf-8
"""Accurate second-stage hotword retrieval.

Behavioral equivalent of the reference AccuRAG (``fun_asr_gguf/hotword/
rag_accu.py``): precise fuzzy-weight scoring via the word-boundary-
constrained ``find_best_match`` DP, intended as stage 2 after FastRAG's
coarse filter (the production path uses
``fuzzy_substring_search_constrained`` instead; this API ships for parity).
"""

from typing import Dict, List, Optional, Tuple

from . import logger
from .algo_calc import find_best_match
from .algo_phoneme import Phoneme, get_phoneme_info

# a hotword this much longer than the whole input cannot match usefully
_LEN_SLACK = 3

Match = Tuple[str, float, int, int]   # (hotword, score, start, end)


class AccuRAG:
    """Precise retriever with confusable-phoneme weights."""

    def __init__(self, threshold: float = 0.6):
        self.threshold = threshold
        self.hotwords: Dict[str, List[Phoneme]] = {}

    def update_hotwords(self, hotwords: Dict[str, List[Phoneme]]) -> int:
        self.hotwords = hotwords
        logger.debug("AccuRAG updated with %d hotwords", len(hotwords))
        return len(hotwords)

    def _score_one(self, hw: str, inp: List[Phoneme]) -> Optional[Match]:
        phonemes = self.hotwords.get(hw)
        if not phonemes or len(phonemes) > len(inp) + _LEN_SLACK:
            return None
        score, lo, hi = find_best_match(inp, phonemes)
        return (hw, score, lo, hi)

    def search(self, input_phonemes: List[Phoneme],
               candidate_hws: Optional[List[str]] = None,
               top_k: int = 10,
               apply_threshold: bool = True) -> List[Match]:
        """Returns [(hotword, score, start_idx, end_idx)] by score desc."""
        if not input_phonemes or not self.hotwords:
            return []
        scored = (self._score_one(hw, input_phonemes)
                  for hw in (candidate_hws or self.hotwords))
        floor = self.threshold if apply_threshold else float("-inf")
        kept = [m for m in scored if m is not None and m[1] >= floor]
        return sorted(kept, key=lambda m: m[1], reverse=True)[:top_k]

    def search_from_text(self, text: str,
                         candidate_hws: Optional[List[str]] = None,
                         top_k: int = 10) -> List[Match]:
        phonemes = get_phoneme_info(text)
        return (self.search(phonemes, candidate_hws, top_k)
                if phonemes else [])
