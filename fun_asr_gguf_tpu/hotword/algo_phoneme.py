# coding: utf-8
"""Text → phoneme sequence with language attributes.

Behavioral port of the reference phoneme extraction
(``fun_asr_gguf/hotword/algo_phoneme.py``), backed by :mod:`.pinyin`
instead of pypinyin. Each hanzi decomposes into [initial, final, tone]
phonemes carrying word-boundary flags and char spans; English/number runs
become single tokens (or per-char in ``ascii_split_char`` mode) with
camelCase and letter/digit boundary splitting.
"""

import re
from dataclasses import dataclass
from typing import List, Literal, Tuple

from .pinyin import char_pinyin


@dataclass(frozen=True)
class Phoneme:
    """A phoneme with language attributes (reference ``algo_phoneme.py:17-56``).

    info 7-tuple: (value, lang, is_word_start, is_word_end, is_tone,
    char_start, char_end).
    """
    value: str
    lang: Literal["zh", "en", "num", "other"]
    is_word_start: bool = False
    is_word_end: bool = False
    char_start: int = 0
    char_end: int = 0

    @property
    def is_tone(self) -> bool:
        return self.value.isdigit()

    @property
    def is_english(self) -> bool:
        return self.lang == "en"

    @property
    def info(self) -> Tuple[str, str, bool, bool, bool, int, int]:
        return (self.value, self.lang, self.is_word_start, self.is_word_end,
                self.is_tone, self.char_start, self.char_end)

    def __str__(self) -> str:
        return self.value

    def __repr__(self) -> str:
        return (f"Phoneme({self.value}, {self.lang}, "
                f"start={self.is_word_start}, end={self.is_word_end})")


def _is_hanzi(ch: str) -> bool:
    return "一" <= ch <= "鿿"


def normalize_text(text: str) -> str:
    """camelCase/digit-boundary splitting + separators → spaces + lowercase."""
    result: List[str] = []
    prev_char = ""
    for char in text:
        if char.isalnum() or _is_hanzi(char):
            if char.isupper() and prev_char.islower():
                result.append(" ")
            elif char.isdigit() and prev_char.isalpha():
                result.append(" ")
            elif char.isalpha() and prev_char.isdigit():
                result.append(" ")
            result.append(char.lower())
            prev_char = char
        else:
            if result and result[-1] != " ":
                result.append(" ")
            prev_char = ""
    return "".join(result).strip()


def split_mixed_label(input_str: str) -> List[str]:
    """Mixed zh/en string → tokens: english words, digit runs, single hanzi."""
    tokens: List[str] = []
    s = input_str.lower()
    pos = 0
    while pos < len(s):
        if s[pos] == " ":
            pos += 1
            continue
        m = re.match(r"[a-z]+", s[pos:])
        if m:
            tokens.append(m.group(0))
            pos += len(m.group(0))
            continue
        m = re.match(r"[0-9]+", s[pos:])
        if m:
            tokens.append(m.group(0))
            pos += len(m.group(0))
            continue
        tokens.append(s[pos])
        pos += 1
    return tokens


def _zh_char_phonemes(ch: str, idx: int = 0, with_span: bool = False
                      ) -> List[Phoneme]:
    """One hanzi → [initial?, final, tone] phonemes."""
    span = dict(char_start=idx, char_end=idx + 1) if with_span else {}
    py = char_pinyin(ch)
    if py is None:
        return [Phoneme(ch, "zh", is_word_start=True, is_word_end=True, **span)]
    ini, fin, tone = py
    out: List[Phoneme] = []
    if ini:
        out.append(Phoneme(ini, "zh", is_word_start=True, **span))
    if fin:
        out.append(Phoneme(fin, "zh", is_word_start=not ini, **span))
    if tone:
        out.append(Phoneme(tone, "zh", is_word_end=True, **span))
    if not out:
        out.append(Phoneme(ch, "zh", is_word_start=True, is_word_end=True,
                           **span))
    return out


def get_phoneme_seq(text: str, ascii_split_char: bool = False) -> List[Phoneme]:
    """Text → phoneme sequence (no char spans; reference ``:170-197``)."""
    normalized = normalize_text(text)
    seq: List[Phoneme] = []
    for token in split_mixed_label(normalized):
        if re.match(r"^[a-z0-9]+$", token):
            lang = "num" if token.isdigit() else "en"
            if ascii_split_char:
                seq.extend(Phoneme(c, lang, is_word_start=True,
                                   is_word_end=True) for c in token)
            else:
                seq.append(Phoneme(token, lang, is_word_start=True,
                                   is_word_end=True))
            continue
        if len(token) == 1:
            seq.extend(_zh_char_phonemes(token))
        else:
            seq.append(Phoneme(token, "zh", is_word_start=True,
                               is_word_end=True))
    return seq


def get_phoneme_info(text: str, ascii_split_char: bool = True) -> List[Phoneme]:
    """Text → phoneme sequence with char spans (reference ``:200-223``).

    Non-alnum/hanzi characters (spaces, punctuation) are skipped so the
    phoneme stream stays contiguous for matching.
    """
    seq: List[Phoneme] = []
    pos = 0
    while pos < len(text):
        char = text[pos]
        if _is_hanzi(char):
            pos = _process_zh(text, pos, seq)
        elif "a" <= char.lower() <= "z" or "0" <= char <= "9":
            pos = _process_en_num(text, pos, seq, ascii_split_char)
        else:
            pos += 1
    return seq


def _process_zh(text: str, pos: int, seq: List[Phoneme]) -> int:
    scan = pos
    while scan < len(text) and _is_hanzi(text[scan]):
        seq.extend(_zh_char_phonemes(text[scan], scan, with_span=True))
        scan += 1
    return scan


def _process_en_num(text: str, pos: int, seq: List[Phoneme],
                    split_char: bool) -> int:
    start_pos = pos
    while pos < len(text):
        char = text[pos]
        low = char.lower()
        if not ("a" <= low <= "z" or "0" <= char <= "9"):
            break
        if pos > start_pos:
            prev = text[pos - 1]
            if ((prev.islower() and char.isupper())
                    or (prev.isalpha() and char.isdigit())
                    or (prev.isdigit() and char.isalpha())):
                break
        pos += 1
    token = text[start_pos:pos].lower()
    lang = "num" if token.isdigit() else "en"
    if split_char:
        for i, c in enumerate(token):
            seq.append(Phoneme(c, lang, is_word_start=(i == 0),
                               is_word_end=(i == len(token) - 1),
                               char_start=start_pos + i,
                               char_end=start_pos + i + 1))
    else:
        seq.append(Phoneme(token, lang, is_word_start=True, is_word_end=True,
                           char_start=start_pos, char_end=pos))
    return pos
