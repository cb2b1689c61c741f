"""LLM tokenizer layer.

Replaces the reference's native ``llama_tokenize`` / ``llama_token_to_piece``
ctypes bindings (reference ``fun_asr_gguf/llama.py:738-748``) with a pure
host-side tokenizer:

* :class:`QwenTokenizer` — loads the HF ``tokenizer.json`` (Qwen3 byte-level
  BPE) via the ``tokenizers`` library, matching the reference's semantics of
  ``add_special=False, parse_special=True``, and exposes *byte-level* pieces
  so streaming UTF-8 assembly works exactly like ``ASRStreamDecoder``
  (``llama.py:661-690``).
* :class:`ByteTokenizer` — tiny deterministic fallback used by unit tests
  and random-weight benchmarks (maps UTF-8 bytes to ids directly).
"""

import codecs
import json
import os
from functools import lru_cache
from typing import List, Optional, Sequence


@lru_cache(maxsize=1)
def _bytes_to_unicode():
    """GPT-2 byte<->unicode table used by byte-level BPE vocabularies."""
    bs = (list(range(ord("!"), ord("~") + 1)) +
          list(range(ord("\xa1"), ord("\xac") + 1)) +
          list(range(ord("\xae"), ord("\xff") + 1)))
    cs = bs[:]
    n = 0
    for b in range(256):
        if b not in bs:
            bs.append(b)
            cs.append(256 + n)
            n += 1
    return dict(zip(bs, (chr(c) for c in cs)))


@lru_cache(maxsize=1)
def _unicode_to_bytes():
    return {v: k for k, v in _bytes_to_unicode().items()}


class BaseTokenizer:
    """Interface shared by all tokenizers in this package."""

    vocab_size: int
    eos_token: int
    stop_tokens: Sequence[int]

    def encode(self, text: str) -> List[int]:
        raise NotImplementedError

    def token_bytes(self, token_id: int) -> bytes:
        raise NotImplementedError

    def decode(self, ids: Sequence[int]) -> str:
        return b"".join(self.token_bytes(i) for i in ids).decode(
            "utf-8", errors="replace")


class QwenTokenizer(BaseTokenizer):
    """Qwen3 byte-level BPE from a HF tokenizer.json.

    Stop ids follow the reference's hardcoded set (``core/decoder.py:53``):
    151643 (<|endoftext|>) and 151645 (<|im_end|>).
    """

    def __init__(self, tokenizer_json_path: str):
        from tokenizers import Tokenizer
        self._tok = Tokenizer.from_file(tokenizer_json_path)
        self.vocab_size = self._tok.get_vocab_size(with_added_tokens=True)
        # special ids from the RUNTIME, not the file's declared ids: the
        # tokenizers library assigns added-token ids as base-vocab-size +
        # insertion order, silently ignoring the JSON "id" field (they
        # coincide for the real Qwen file, whose base vocab is exactly
        # 151643 entries — but keying off the file would break decode on
        # any file where they diverge)
        self._special = {
            tid: tok.content
            for tid, tok in self._tok.get_added_tokens_decoder().items()}
        by_content = {c: t for t, c in self._special.items()}
        self.eos_token = by_content.get("<|im_end|>", 151645)
        # reference stop set {<|endoftext|>, <|im_end|>}, core/decoder.py:53
        self.stop_tokens = tuple(sorted(
            {by_content.get("<|endoftext|>", 151643), self.eos_token}))
        self._u2b = _unicode_to_bytes()

    def encode(self, text: str) -> List[int]:
        # add_special_tokens=False == reference add_special=False; the
        # tokenizers library always parses added special tokens in the text,
        # matching parse_special=True.
        return self._tok.encode(text, add_special_tokens=False).ids

    def token_bytes(self, token_id: int) -> bytes:
        if token_id in self._special:
            return self._special[token_id].encode("utf-8")
        piece = self._tok.id_to_token(token_id)
        if piece is None:
            return b""
        try:
            return bytes(self._u2b[c] for c in piece)
        except KeyError:
            return piece.encode("utf-8")


class ByteTokenizer(BaseTokenizer):
    """Deterministic byte-level tokenizer for tests/benchmarks.

    ids 0..255 are raw bytes; special tokens get ids >= 256. Mirrors the shape
    of the real tokenizer API so the engine stack can run without model
    artifacts.
    """

    def __init__(self, specials: Optional[Sequence[str]] = None,
                 vocab_size: Optional[int] = None):
        specials = list(specials or
                        ["<|endoftext|>", "<|im_start|>", "<|im_end|>"])
        self._special_by_text = {s: 256 + i for i, s in enumerate(specials)}
        self._special_by_id = {v: k for k, v in self._special_by_text.items()}
        self.vocab_size = vocab_size or (256 + len(specials))
        self.eos_token = self._special_by_text.get("<|im_end|>", 256)
        self.stop_tokens = tuple(sorted(self._special_by_id))

    def encode(self, text: str) -> List[int]:
        ids: List[int] = []
        i = 0
        while i < len(text):
            matched = None
            for s, tid in self._special_by_text.items():
                if text.startswith(s, i):
                    matched = (s, tid)
                    break
            if matched:
                ids.append(matched[1])
                i += len(matched[0])
            else:
                ids.extend(text[i].encode("utf-8"))
                i += 1
        return ids

    def token_bytes(self, token_id: int) -> bytes:
        if token_id in self._special_by_id:
            return self._special_by_id[token_id].encode("utf-8")
        if 0 <= token_id < 256:
            return bytes([token_id])
        return b""


class StreamTextDecoder:
    """Incremental UTF-8 assembly of generated token pieces.

    Behavioral port of ``ASRStreamDecoder`` (reference ``llama.py:661-690``):
    multi-byte characters split across tokens are buffered by an incremental
    codec, each completed piece is appended and optionally streamed to a
    reporter.
    """

    def __init__(self, tokenizer: BaseTokenizer, reporter=None):
        self.tokenizer = tokenizer
        self.reporter = reporter
        self.byte_decoder = codecs.getincrementaldecoder("utf-8")(errors="replace")
        self.generated_text = ""
        self.tokens_generated = 0
        self.tokens: List[str] = []

    def push(self, token_id: int) -> str:
        raw = self.tokenizer.token_bytes(int(token_id))
        piece = self.byte_decoder.decode(raw, final=False)
        self.tokens.append(piece)
        self.tokens_generated += 1
        self.generated_text += piece
        if self.reporter:
            self.reporter.stream(piece)
        return piece

    def flush(self) -> str:
        remaining = self.byte_decoder.decode(b"", final=True)
        self.tokens.append(remaining)
        self.generated_text += remaining
        return remaining


def load_tokenizer(path: Optional[str]) -> BaseTokenizer:
    """Load the best available tokenizer for a checkpoint.

    ``path`` may be a tokenizer.json file or a directory containing one.
    Falls back to :class:`ByteTokenizer` when nothing is found (keeps the
    pipeline runnable for tests/benchmarks without artifacts).
    """
    if path:
        cand = path
        if os.path.isdir(cand):
            cand = os.path.join(cand, "tokenizer.json")
        if os.path.exists(cand):
            return QwenTokenizer(cand)
    return ByteTokenizer()
