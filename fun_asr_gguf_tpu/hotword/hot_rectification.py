# coding: utf-8
"""Correction-history RAG ("wrong => right" retrieval for LLM context).

Behavioral port of the reference RectificationRAG
(``fun_asr_gguf/hotword/hot_rectification.py``): diff fragments between
each wrong/right pair are extracted with SequenceMatcher opcodes on word
boundaries, pre-phonemized, and fuzzy-scored against the input; the top
records become a "纠错历史" prompt block. Ships for API parity (unwired in
the default engine path, same as the reference).
"""

import threading
import time
from dataclasses import dataclass
from difflib import SequenceMatcher
from pathlib import Path
from typing import Dict, List, Tuple

from . import logger
from .algo_calc import fuzzy_substring_distance
from .algo_phoneme import Phoneme, get_phoneme_seq


@dataclass
class Fragment:
    text: str
    source_text: str
    start: int
    end: int

    def __repr__(self):
        return f"Fragment('{self.text}', pos={self.start}:{self.end})"


def _is_hanzi(ch: str) -> bool:
    return "一" <= ch <= "鿿"


def _get_word_boundaries(text: str) -> List[Tuple[int, int, str]]:
    """[(start, end, word)] — hanzi are single-char words; alnum runs split
    on camelCase boundaries."""
    boundaries = []
    i, n = 0, len(text)
    while i < n:
        if not (text[i].isalnum() or _is_hanzi(text[i])):
            i += 1
            continue
        start = i
        if _is_hanzi(text[i]):
            i += 1
        else:
            last_was_lower = text[i].islower()
            while i < n and text[i].isalnum():
                if text[i].isupper() and last_was_lower and i > start:
                    break
                last_was_lower = text[i].islower()
                i += 1
        boundaries.append((start, i, text[start:i]))
    return boundaries


def _expand_by_words(text: str, start: int, end: int,
                     expand_count: int = 1) -> Tuple[int, int]:
    bounds = _get_word_boundaries(text)
    start_idx = next((i for i, b in enumerate(bounds) if b[0] == start), None)
    end_idx = next((i + 1 for i, b in enumerate(bounds) if b[1] == end), None)
    if start_idx is None or end_idx is None:
        return start, end
    new_start = bounds[max(0, start_idx - expand_count)][0]
    new_end = bounds[min(len(bounds), end_idx + expand_count) - 1][1]
    return new_start, new_end


def _continuous_fragment(bounds, start_idx, end_idx, original_text) -> str:
    if start_idx >= end_idx or start_idx >= len(bounds):
        return ""
    return original_text[bounds[start_idx][0]:bounds[end_idx - 1][1]]


def extract_diff_fragments(wrong: str, right: str, zh_min_phonemes: int = 4,
                           expand_words: int = 1) -> List[str]:
    """Changed spans of both sentences, expanded when too short to match."""
    wrong_bounds = _get_word_boundaries(wrong)
    right_bounds = _get_word_boundaries(right)
    matcher = SequenceMatcher(None, [b[2] for b in wrong_bounds],
                              [b[2] for b in right_bounds])
    fragments: List[Fragment] = []
    for tag, i1, i2, j1, j2 in matcher.get_opcodes():
        if tag in ("replace", "delete") and i2 > i1:
            text = _continuous_fragment(wrong_bounds, i1, i2, wrong)
            if text:
                fragments.append(Fragment(text, wrong, wrong_bounds[i1][0],
                                          wrong_bounds[i2 - 1][1]))
        if tag in ("replace", "insert") and j2 > j1:
            text = _continuous_fragment(right_bounds, j1, j2, right)
            if text:
                fragments.append(Fragment(text, right, right_bounds[j1][0],
                                          right_bounds[j2 - 1][1]))

    result = []
    for frag in fragments:
        phonemes = get_phoneme_seq(frag.text)
        if not phonemes:
            continue
        if any(p.lang != "zh" for p in phonemes) or \
                len(phonemes) >= zh_min_phonemes:
            result.append(frag.text)
        else:
            s, e = _expand_by_words(frag.source_text, frag.start, frag.end,
                                    expand_words)
            expanded = frag.source_text[s:e]
            result.append(expanded if expanded else frag.text)
    return list(dict.fromkeys(result))


class RectifyRecord:
    def __init__(self, wrong: str, right: str, fragments: List[str]):
        self.wrong = wrong
        self.right = right
        self.fragments = fragments
        self.fragment_phonemes: Dict[str, List[Phoneme]] = {
            f: get_phoneme_seq(f) for f in fragments}

    def __repr__(self):
        return (f"RectifyRecord('{self.wrong}' => '{self.right}', "
                f"fragments={self.fragments})")


class RectificationRAG:
    """Retrieves past corrections relevant to the current transcript.

    File format: blocks separated by ``---``; first non-comment line is the
    wrong text, second the corrected text.
    """

    def __init__(self, rectify_file: str = "hot-rectify.txt",
                 threshold: float = 0.5):
        self.rectify_file = Path(rectify_file)
        self.threshold = threshold
        self.records: List[RectifyRecord] = []
        self._lock = threading.Lock()
        self.load_history()

    def load_history(self):
        from .manager import read_or_create_text
        content = read_or_create_text(
            self.rectify_file,
            "# 纠错历史文件\n# 格式：用 --- 分隔的多行内容\n"
            "# 每一段第一行是原始文本，第二行是修正文本\n")
        if content is None:
            # transient read error (e.g. atomic-save window): retain the
            # current records; a genuinely EMPTY file falls through and
            # clears them — emptying the file is how a user disables
            # corrections
            return

        new_records = []
        start_time = time.time()
        for block in content.split("---"):
            valid = [l.strip() for l in block.strip().split("\n")
                     if l.strip() and not l.strip().startswith("#")]
            if len(valid) >= 2 and valid[0] and valid[1]:
                wrong, right = valid[0], valid[1]
                fragments = extract_diff_fragments(wrong, right) or [wrong]
                new_records.append(RectifyRecord(wrong, right, fragments))
        with self._lock:
            self.records = new_records
        if new_records:
            logger.info("loaded %d rectification records in %.3fs",
                        len(new_records), time.time() - start_time)

    def _score_record(self, input_phonemes: List[Phoneme],
                      record: RectifyRecord):
        details = []
        input_info = [p.info for p in input_phonemes]
        for fragment, frag_phonemes in record.fragment_phonemes.items():
            if not frag_phonemes:
                continue
            frag_info = [p.info for p in frag_phonemes]
            dist = fuzzy_substring_distance(frag_info, input_info)
            details.append({"fragment": fragment,
                            "score": round(1.0 - dist / len(frag_info), 3),
                            "phonemes": len(frag_info)})
        if not details:
            return 0.0, []
        details.sort(key=lambda x: x["score"], reverse=True)
        return details[0]["score"], details

    def search(self, text: str, top_k: int = 5
               ) -> List[Tuple[str, str, float]]:
        if not text or not self.records:
            return []
        input_phonemes = get_phoneme_seq(text)
        if not input_phonemes:
            return []
        with self._lock:
            records = self.records[:]
        matches = []
        for record in records:
            best_score, _ = self._score_record(input_phonemes, record)
            if best_score >= self.threshold:
                matches.append((record.wrong, record.right,
                                round(best_score, 3)))
        matches.sort(key=lambda x: x[2], reverse=True)
        return matches[:top_k]

    def search_detailed(self, text: str, top_k: int = 5) -> List[dict]:
        if not text or not self.records:
            return []
        input_phonemes = get_phoneme_seq(text)
        if not input_phonemes:
            return []
        with self._lock:
            records = self.records[:]
        results = []
        for record in records:
            best_score, details = self._score_record(input_phonemes, record)
            if best_score >= self.threshold:
                results.append({"wrong": record.wrong, "right": record.right,
                                "score": best_score, "fragments": details})
        results.sort(key=lambda x: x["score"], reverse=True)
        return results[:top_k]

    def format_prompt(self, text: str, top_k: int = 5,
                      prefix: str = "纠错历史：") -> str:
        if not self.records:
            return ""
        results = self.search(text, top_k=top_k)
        if not results:
            return ""
        lines = [prefix]
        lines.extend(f"- {wrong} => {right}" for wrong, right, _ in results)
        return "\n".join(lines)
