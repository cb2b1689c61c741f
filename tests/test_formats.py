"""Tests for the GGUF/quant/vocab/tokenizer format layer.

Kernel-level parity tests in the spirit of llama.cpp's test-quantize-fns
(see SURVEY.md §4): q8_0 must be bit-exact against the ggml block layout.
"""

import base64

import numpy as np
import pytest

from fun_asr_gguf_tpu.formats import (GGMLType, GGUFReader, GGUFWriter,
                                      q8_0_dequantize, q8_0_from_blocks,
                                      q8_0_quantize, q8_0_to_blocks)
from fun_asr_gguf_tpu.formats.ctc_vocab import (generate_sensevoice_vocab,
                                                load_ctc_tokens,
                                                write_tokens_file)
from fun_asr_gguf_tpu.formats.tokenizer import (ByteTokenizer,
                                                StreamTextDecoder)


class TestQ8_0:
    def test_roundtrip_error_bound(self):
        rng = np.random.default_rng(0)
        x = rng.normal(size=(16, 128)).astype(np.float32) * 3.0
        q, d = q8_0_quantize(x)
        y = q8_0_dequantize(q, d)
        # ggml semantics: quantize against the unrounded f32 scale, store
        # the f16-rounded scale — so the bound is half a step plus the f16
        # rounding of d amplified by |q| <= 127 (127 * 2^-11 per step)
        step = np.abs(x).reshape(16, 4, 32).max(-1) / 127.0
        err = np.abs(x - y).reshape(16, 4, 32).max(-1)
        assert np.all(err <= step * (0.5 + 127 * 2.0 ** -11) + 1e-6)

    def test_reference_block_layout(self):
        """34-byte blocks: fp16 scale then 32 int8 quants (llama.py:779-784)."""
        rng = np.random.default_rng(1)
        x = rng.normal(size=(2, 64)).astype(np.float32)
        q, d = q8_0_quantize(x)
        raw = q8_0_to_blocks(q, d)
        assert raw.size == 4 * 34
        blocks = raw.reshape(4, 34)
        deltas = blocks[:, :2].copy().view(np.float16).ravel()
        quants = blocks[:, 2:].copy().view(np.int8)
        np.testing.assert_array_equal(deltas, d.reshape(-1))
        np.testing.assert_array_equal(quants, q.reshape(4, 32))
        # reference-style dequant formula
        ref = (deltas[:, None].astype(np.float32) * quants).reshape(2, 64)
        np.testing.assert_allclose(ref, q8_0_dequantize(q, d), rtol=0, atol=0)

    def test_round_half_away_from_zero(self):
        # scale = 1.0 exactly; values ±0.5, ±1.5 must round away from zero
        x = np.array([[0.5, -0.5, 1.5, -1.5] + [127.0] + [0.0] * 27],
                     dtype=np.float32)
        q, d = q8_0_quantize(x)
        assert d[0, 0] == np.float16(1.0)
        np.testing.assert_array_equal(q[0, :4], [1, -1, 2, -2])

    def test_blocks_roundtrip(self):
        rng = np.random.default_rng(2)
        x = rng.normal(size=(8, 96)).astype(np.float32)
        q, d = q8_0_quantize(x)
        q2, d2 = q8_0_from_blocks(q8_0_to_blocks(q, d), (8, 96))
        np.testing.assert_array_equal(q, q2)
        np.testing.assert_array_equal(d, d2)


class TestGGUF:
    def test_write_read_roundtrip(self, tmp_path):
        path = str(tmp_path / "test.gguf")
        rng = np.random.default_rng(3)
        w = GGUFWriter(path, arch="qwen3")
        w.add_kv("qwen3.embedding_length", 64)
        w.add_kv("qwen3.block_count", 2)
        w.add_kv("general.name", "tiny")
        w.add_kv("tokenizer.ggml.tokens", ["a", "b", "c"])
        w.add_kv("qwen3.rope.freq_base", 1000000.0)
        a = rng.normal(size=(10, 64)).astype(np.float32)
        b = rng.normal(size=(64,)).astype(np.float16)
        c = rng.normal(size=(4, 64)).astype(np.float32)
        w.add_tensor("a.weight", a)
        w.add_tensor("b.bias", b)
        w.add_tensor("c.weight", c, ggml_type=GGMLType.Q8_0)
        w.write()

        r = GGUFReader(path)
        assert r.fields["general.architecture"] == "qwen3"
        assert r.fields["qwen3.embedding_length"] == 64
        assert r.fields["tokenizer.ggml.tokens"] == ["a", "b", "c"]
        assert abs(r.fields["qwen3.rope.freq_base"] - 1e6) < 1
        np.testing.assert_array_equal(r.tensor("a.weight"), a)
        np.testing.assert_array_equal(r.tensor("b.bias"), b)
        info = r.tensor_info("c.weight")
        assert info.ggml_type == GGMLType.Q8_0
        assert info.shape == (4, 64)
        qref, dref = q8_0_quantize(c)
        q, d = r.tensor_q8_0("c.weight")
        np.testing.assert_array_equal(q, qref)
        np.testing.assert_array_equal(d, dref)
        np.testing.assert_allclose(r.tensor("c.weight"),
                                   q8_0_dequantize(qref, dref))

    def test_bf16_tensor(self, tmp_path):
        path = str(tmp_path / "bf.gguf")
        w = GGUFWriter(path)
        x = np.array([[1.5, -2.25, 3e4, 1e-3] * 32], dtype=np.float32)
        w.add_tensor("x", x, ggml_type=GGMLType.BF16)
        w.write()
        r = GGUFReader(path)
        y = r.tensor("x")
        np.testing.assert_allclose(y, x, rtol=8e-3)


class TestCTCVocab:
    def test_load_tokens_base64(self, tmp_path):
        p = tmp_path / "tokens.txt"
        hello = base64.b64encode("你好".encode()).decode()
        p.write_text(f"{hello} 0\nplain 1\n2\n", encoding="utf-8")
        id2tok = load_ctc_tokens(str(p))
        assert id2tok[0] == "你好"
        assert id2tok[1] == "plain"
        # single-field line: text " " is then b64-decoded to "" — matches the
        # reference quirk (nano_ctc.py:22,30: b64decode(" ") == b"")
        assert id2tok[2] == ""

    def test_generate_vocab_layout(self, tmp_path):
        tik = tmp_path / "m.tiktoken"
        lines = [f"{base64.b64encode(str(i).encode()).decode()} {i}"
                 for i in range(10)]
        tik.write_text("\n".join(lines), encoding="utf-8")
        tokens = generate_sensevoice_vocab(str(tik))
        # 10 base + 128 labels + 50 specials + 1500 timestamps + blank
        assert len(tokens) == 10 + 128 + 50 + 1500 + 1
        assert base64.b64decode(tokens[-1]).decode() == "<blk>"
        out = tmp_path / "tokens.txt"
        write_tokens_file(tokens, str(out))
        id2tok = load_ctc_tokens(str(out))
        assert id2tok[max(id2tok)] == "<blk>"
        assert id2tok[0] == "0"


class TestByteTokenizer:
    def test_specials_and_bytes(self):
        tok = ByteTokenizer()
        ids = tok.encode("<|im_start|>hi<|im_end|>")
        assert ids[0] == tok.encode("<|im_start|>")[0]
        assert ids[-1] == tok.eos_token
        assert tok.decode(ids) == "<|im_start|>hi<|im_end|>"

    def test_stream_decoder_multibyte(self):
        tok = ByteTokenizer()
        ids = tok.encode("你好a")
        dec = StreamTextDecoder(tok)
        for i in ids:
            dec.push(i)
        dec.flush()
        assert dec.generated_text == "你好a"
        assert dec.tokens_generated == len(ids)


class TestQwenTokenizer:
    """Exercises the real tokenizers-backed path with a constructed
    byte-level-BPE tokenizer.json (same structure as Qwen's)."""

    @pytest.fixture()
    def tok_path(self, tmp_path):
        from tokenizers import Tokenizer, decoders, models, pre_tokenizers
        from fun_asr_gguf_tpu.formats.tokenizer import _bytes_to_unicode
        b2u = _bytes_to_unicode()
        vocab = {ch: i for i, (b, ch) in enumerate(sorted(b2u.items()))}
        tok = Tokenizer(models.BPE(vocab=vocab, merges=[]))
        tok.pre_tokenizer = pre_tokenizers.ByteLevel(add_prefix_space=False)
        tok.decoder = decoders.ByteLevel()
        tok.add_special_tokens(["<|endoftext|>", "<|im_start|>",
                                "<|im_end|>"])
        path = str(tmp_path / "tokenizer.json")
        tok.save(path)
        return path

    def test_parse_special_and_byte_pieces(self, tok_path):
        from fun_asr_gguf_tpu.formats.tokenizer import QwenTokenizer
        qt = QwenTokenizer(tok_path)
        ids = qt.encode("<|im_start|>你好ab<|im_end|>")
        # specials parsed as single ids (parse_special=True semantics)
        assert ids[0] == 257 and ids[-1] == 258
        assert qt.decode(ids) == "<|im_start|>你好ab<|im_end|>"
        # byte pieces reassemble multibyte chars through the stream decoder
        from fun_asr_gguf_tpu.formats.tokenizer import StreamTextDecoder
        dec = StreamTextDecoder(qt)
        for i in ids[1:-1]:
            dec.push(i)
        dec.flush()
        assert dec.generated_text == "你好ab"

    def test_eos_detection(self, tok_path):
        from fun_asr_gguf_tpu.formats.tokenizer import (QwenTokenizer,
                                                        load_tokenizer)
        qt = QwenTokenizer(tok_path)
        assert qt.token_bytes(qt.eos_token) == b"<|im_end|>"
        # load_tokenizer resolves directories too
        import os
        qt2 = load_tokenizer(os.path.dirname(tok_path))
        assert qt2.eos_token == qt.eos_token


class TestLegacyQuantFormats:
    """Q4_0/Q4_1/Q5_0/Q5_1 dequantization (read-side llama.cpp compat)."""

    def test_q4_0_roundtrip_bound(self):
        from fun_asr_gguf_tpu.formats.quant_np import (q4_0_dequantize_blocks,
                                                       q4_0_quantize)
        rng = np.random.default_rng(10)
        x = rng.normal(size=(4, 64)).astype(np.float32)
        raw = q4_0_quantize(x)
        assert raw.size == 8 * 18
        y = q4_0_dequantize_blocks(raw, (4, 64))
        # 4-bit: error bounded by one step (absmax/8) per block
        step = np.abs(x).reshape(8, 32).max(1) / 8.0
        err = np.abs(x - y).reshape(8, 32).max(1)
        assert np.all(err <= step + 1e-6)

    def test_q4_1_handbuilt_block(self):
        from fun_asr_gguf_tpu.formats.quant_np import q4_1_dequantize_blocks
        d, m = np.float16(0.5), np.float16(-1.0)
        q = np.arange(32, dtype=np.uint8) % 16
        packed = (q[:16] | (q[16:] << 4)).astype(np.uint8)
        raw = np.concatenate([np.array([d], np.float16).view(np.uint8),
                              np.array([m], np.float16).view(np.uint8),
                              packed])
        y = q4_1_dequantize_blocks(raw, (32,))
        expect = q.astype(np.float32) * 0.5 - 1.0
        np.testing.assert_allclose(y, expect, atol=1e-3)

    def test_q5_0_handbuilt_block(self):
        from fun_asr_gguf_tpu.formats.quant_np import q5_0_dequantize_blocks
        d = np.float16(1.0)
        ql = np.zeros(32, dtype=np.uint8)
        ql[0] = 15
        qh = np.uint32(1)          # element 0 gets the high bit -> q=31
        packed = (ql[:16] | (ql[16:] << 4)).astype(np.uint8)
        raw = np.concatenate([np.array([d], np.float16).view(np.uint8),
                              np.array([qh], np.uint32).view(np.uint8),
                              packed])
        y = q5_0_dequantize_blocks(raw, (32,))
        assert y[0] == (31 - 16) * 1.0
        assert y[1] == -16.0

    def test_q5_1_handbuilt_block(self):
        from fun_asr_gguf_tpu.formats.quant_np import q5_1_dequantize_blocks
        d, m = np.float16(2.0), np.float16(3.0)
        ql = np.zeros(32, dtype=np.uint8)
        qh = np.uint32(1 << 5)     # element 5 high bit -> q=16
        packed = (ql[:16] | (ql[16:] << 4)).astype(np.uint8)
        raw = np.concatenate([np.array([d], np.float16).view(np.uint8),
                              np.array([m], np.float16).view(np.uint8),
                              np.array([qh], np.uint32).view(np.uint8),
                              packed])
        y = q5_1_dequantize_blocks(raw, (32,))
        assert y[5] == 16 * 2.0 + 3.0
        assert y[0] == 3.0

    def test_reader_q4_0_tensor(self, tmp_path):
        """A GGUF with a Q4_0 tensor reads back dequantized."""
        from fun_asr_gguf_tpu.formats.gguf import (GGMLType, GGUFReader,
                                                   GGUFWriter)
        from fun_asr_gguf_tpu.formats.quant_np import (q4_0_dequantize_blocks,
                                                       q4_0_quantize)
        import struct
        rng = np.random.default_rng(11)
        x = rng.normal(size=(2, 64)).astype(np.float32)
        raw = q4_0_quantize(x).tobytes()
        # hand-write a minimal gguf with a Q4_0 payload
        path = tmp_path / "q4.gguf"
        with open(path, "wb") as f:
            f.write(struct.pack("<IIQQ", 0x46554747, 3, 1, 1))
            key = b"general.alignment"
            f.write(struct.pack("<Q", len(key)) + key)
            f.write(struct.pack("<II", 4, 32))          # u32 32
            name = b"w"
            f.write(struct.pack("<Q", len(name)) + name)
            f.write(struct.pack("<I", 2))
            f.write(struct.pack("<QQ", 64, 2))          # ne: in, out
            f.write(struct.pack("<IQ", int(GGMLType.Q4_0), 0))
            f.write(b"\x00" * (-f.tell() % 32))
            f.write(raw)
        r = GGUFReader(str(path))
        got = r.tensor("w")
        np.testing.assert_allclose(got,
                                   q4_0_dequantize_blocks(
                                       np.frombuffer(raw, np.uint8), (2, 64)))


class TestGGUFCorruption:
    """Corrupt files must fail with typed ValueError, never short views."""

    def _base(self, tmp_path):
        import numpy as np
        from fun_asr_gguf_tpu.formats.gguf import GGUFWriter
        p = str(tmp_path / "ok.gguf")
        w = GGUFWriter(p, arch="qwen3")
        w.add_tensor("t", np.zeros((4, 32), np.float32))
        w.write()
        return open(p, "rb").read()

    def _expect(self, tmp_path, name, data):
        from fun_asr_gguf_tpu.formats.gguf import GGUFReader
        p = str(tmp_path / name)
        open(p, "wb").write(data)
        with pytest.raises(ValueError):
            GGUFReader(p)

    def test_truncated_header(self, tmp_path):
        self._expect(tmp_path, "t1", self._base(tmp_path)[:10])

    def test_truncated_kv(self, tmp_path):
        self._expect(tmp_path, "t2", self._base(tmp_path)[:40])

    def test_implausible_counts(self, tmp_path):
        import struct
        base = self._base(tmp_path)
        self._expect(tmp_path, "t3",
                     base[:8] + struct.pack("<Q", 2 ** 40) + base[16:])

    def test_huge_string_length(self, tmp_path):
        import struct
        base = self._base(tmp_path)
        self._expect(tmp_path, "t4",
                     base[:24] + struct.pack("<Q", 2 ** 50) + base[32:])

    def test_truncated_tensor_payload(self, tmp_path):
        self._expect(tmp_path, "t5", self._base(tmp_path)[:-60])

    def test_bad_magic(self, tmp_path):
        base = self._base(tmp_path)
        self._expect(tmp_path, "t6", b"XXXX" + base[4:])


def _build_qwen_schema_tok(tmp_path_factory):
    """Write a tokenizer.json with the PRODUCTION Qwen schema
    (formats.tokenizer.qwen_tokenizer_spec — the same builder
    QwenTokenizer.from_gguf uses) over a tiny but realistically-sized
    vocab: base = exactly 151643 entries so the runtime assigns the
    added specials their production ids."""
    import json as _json
    from fun_asr_gguf_tpu.formats.tokenizer import (_bytes_to_unicode,
                                                    qwen_tokenizer_spec)
    b2u = _bytes_to_unicode()
    vocab = {ch: b for b, ch in b2u.items()}          # ids 0..255
    merges = [["Y", "ou"], ["o", "u"], ["a", "s"], ["as", "s"],
              ["t", "an"], ["a", "n"], ["Ġ", "a"], ["h", "e"],
              ["l", "p"], ["he", "lp"]]
    nid = 256
    for a, b in merges:
        m = a + b
        if m not in vocab:
            vocab[m] = nid
            nid += 1
    for i in range(nid, 151643):                      # real base size
        vocab[f"<|unused:{i}|>"] = i
    added = [
        {"id": 151643 + j, "content": c, "single_word": False,
         "lstrip": False, "rstrip": False, "normalized": False,
         "special": True}
        for j, c in enumerate(["<|endoftext|>", "<|im_start|>",
                               "<|im_end|>"])]
    spec = qwen_tokenizer_spec(vocab, [f"{a} {b}" for a, b in merges],
                               added)
    path = str(tmp_path_factory.mktemp("qwen_schema") / "tokenizer.json")
    with open(path, "w", encoding="utf-8") as f:
        _json.dump(spec, f, ensure_ascii=False)
    return path


@pytest.fixture(scope="module")
def qwen_schema_tok_path(tmp_path_factory):
    return _build_qwen_schema_tok(tmp_path_factory)


class TestQwenSchemaGoldens:
    """Golden token-id pins under a tokenizer.json with the REAL Qwen3
    schema: base vocab of exactly 151643 entries (so the runtime assigns
    the added specials their production ids 151643/151644/151645 — the
    tokenizers library ignores the file's declared ids and numbers added
    tokens from base-vocab-size), the real Qwen split regex, byte-level
    BPE with merges. Pins the exact id sequences for the ChatML prompt
    strings (``prompt_utils.py``), so a tokenizers-lib behavior change or
    a special-token parse difference fails here without needing the real
    vocab blob (absent in this environment). parse_special semantics per
    reference ``llama.py:738-748``."""

    PREFIX = ("<|im_start|>system\nYou are a helpful assistant."
              "<|im_end|>\n<|im_start|>user\n语音转写：")
    SUFFIX = "<|im_end|>\n<|im_start|>assistant\n"

    GOLD_PREFIX = [151644, 115, 121, 115, 116, 101, 109, 10, 256, 262, 114,
                   101, 262, 32, 265, 102, 117, 108, 32, 259, 105, 115, 260,
                   116, 46, 151645, 10, 151644, 117, 115, 101, 114, 10, 232,
                   175, 173, 233, 159, 179, 232, 189, 172, 229, 134, 153,
                   239, 188, 154]
    GOLD_SUFFIX = [151645, 10, 151644, 259, 105, 115, 260, 116, 10]
    GOLD_LANG = [232, 175, 173, 233, 159, 179, 232, 189, 172, 229, 134, 153,
                 230, 136, 144, 228, 184, 173, 230, 150, 135, 239, 188, 154]

    @pytest.fixture(scope="class")
    def tok_path(self, qwen_schema_tok_path):
        return qwen_schema_tok_path


    def test_special_ids_are_production_ids(self, tok_path):
        from fun_asr_gguf_tpu.formats.tokenizer import QwenTokenizer
        qt = QwenTokenizer(tok_path)
        assert qt.vocab_size == 151646                  # 151643 + 3 specials
        assert qt.eos_token == 151645
        assert qt.stop_tokens == (151643, 151645)
        assert qt.encode("<|im_end|>") == [151645]
        assert qt.encode("<|im_start|>") == [151644]
        assert qt.encode("<|endoftext|>") == [151643]

    def test_chatml_prompt_goldens(self, tok_path):
        from fun_asr_gguf_tpu.formats.tokenizer import QwenTokenizer
        qt = QwenTokenizer(tok_path)
        assert qt.encode(self.PREFIX) == self.GOLD_PREFIX
        assert qt.encode(self.SUFFIX) == self.GOLD_SUFFIX
        assert qt.encode("语音转写成中文：") == self.GOLD_LANG
        assert qt.decode(self.GOLD_PREFIX) == self.PREFIX
        assert qt.decode(self.GOLD_SUFFIX) == self.SUFFIX

    def test_parse_special_semantics(self, tok_path):
        """parse_special=True (reference llama.py:738-748): special strings
        anywhere in the text become single ids; near-misses never do."""
        from fun_asr_gguf_tpu.formats.tokenizer import QwenTokenizer
        qt = QwenTokenizer(tok_path)
        assert qt.encode("a<|endoftext|>b") == [97, 151643, 98]
        assert 151645 not in qt.encode("<|im_end|")      # truncated
        assert 151645 not in qt.encode("<|im_end |>")    # inner space
        # decode of specials yields their literal text
        assert qt.decode([151644, 151645]) == "<|im_start|><|im_end|>"

    def test_prompt_builder_uses_golden_ids(self, tok_path):
        """End-to-end: PromptBuilder gathers exactly the golden rows."""
        import numpy as np
        from fun_asr_gguf_tpu.formats.tokenizer import QwenTokenizer
        from fun_asr_gguf_tpu.prompt_utils import PromptBuilder
        qt = QwenTokenizer(tok_path)
        table = np.arange(151646, dtype=np.float32)[:, None] * np.ones(
            (1, 4), np.float32)
        pb = PromptBuilder(qt, table)
        p_embd, s_embd, n_p, n_s, p_text = pb.build_prompt([], None, None)
        assert n_p == len(self.GOLD_PREFIX)
        assert n_s == len(self.GOLD_SUFFIX)
        np.testing.assert_array_equal(p_embd[:, 0],
                                      np.asarray(self.GOLD_PREFIX,
                                                 np.float32))
        np.testing.assert_array_equal(s_embd[:, 0],
                                      np.asarray(self.GOLD_SUFFIX,
                                                 np.float32))


class TestGGUFEmbeddedVocab:
    """llama.cpp-style self-contained GGUFs: the vocab rides in
    tokenizer.ggml.* KVs (written by save_qwen3_to_gguf / read by
    QwenTokenizer.from_gguf), so a checkpoint needs no tokenizer.json —
    parity target: the reference's llama.dll loading its vocab from the
    GGUF (SURVEY §2.1 llama.py)."""

    @pytest.fixture(scope="class")
    def vocab_gguf(self, qwen_schema_tok_path, tmp_path_factory):
        import numpy as np
        from fun_asr_gguf_tpu.formats.gguf import GGUFWriter
        from fun_asr_gguf_tpu.formats.tokenizer import (
            gguf_vocab_from_tokenizer_json)
        tokens, types, merges = gguf_vocab_from_tokenizer_json(
            qwen_schema_tok_path)
        path = str(tmp_path_factory.mktemp("vggml") / "decoder.gguf")
        w = GGUFWriter(path, arch="qwen3")
        w.add_kv("tokenizer.ggml.model", "gpt2")
        w.add_kv("tokenizer.ggml.pre", "qwen2")
        w.add_kv("tokenizer.ggml.tokens", tokens)
        w.add_kv("tokenizer.ggml.token_type", types)
        w.add_kv("tokenizer.ggml.merges", merges)
        w.add_tensor("dummy", np.zeros((4, 4), np.float32))
        w.write()
        return path

    def test_vocab_layout_extraction(self, qwen_schema_tok_path):
        from fun_asr_gguf_tpu.formats.tokenizer import (
            TOKEN_TYPE_CONTROL, gguf_vocab_from_tokenizer_json)
        tokens, types, merges = gguf_vocab_from_tokenizer_json(
            qwen_schema_tok_path)
        assert len(tokens) == len(types) == 151646
        assert tokens[151643:] == ["<|endoftext|>", "<|im_start|>",
                                   "<|im_end|>"]
        assert all(t == TOKEN_TYPE_CONTROL for t in types[151643:])
        assert all(isinstance(m, str) and " " in m for m in merges)

    def test_from_gguf_matches_tokenizer_json(self, qwen_schema_tok_path,
                                              vocab_gguf):
        from fun_asr_gguf_tpu.formats.tokenizer import QwenTokenizer
        ref = QwenTokenizer(qwen_schema_tok_path)
        got = QwenTokenizer.from_gguf(vocab_gguf)
        assert got.vocab_size == ref.vocab_size == 151646
        assert got.eos_token == 151645
        assert got.stop_tokens == (151643, 151645)
        g = TestQwenSchemaGoldens
        for text in (g.PREFIX, g.SUFFIX, "语音转写成中文：",
                     "<|im_start|>assistant\nYou are helpful"):
            assert got.encode(text) == ref.encode(text)
        assert got.encode(g.PREFIX) == g.GOLD_PREFIX
        assert got.decode(g.GOLD_PREFIX) == g.PREFIX

    def test_load_tokenizer_falls_back_to_gguf(self, vocab_gguf, tmp_path):
        import shutil
        from fun_asr_gguf_tpu.formats.tokenizer import (QwenTokenizer,
                                                        load_tokenizer)
        ckpt = tmp_path / "ckpt"
        ckpt.mkdir()
        shutil.copy(vocab_gguf, ckpt / "decoder.gguf")
        tok = load_tokenizer(str(ckpt))
        assert isinstance(tok, QwenTokenizer)
        assert tok.vocab_size == 151646

    @pytest.mark.slow
    def test_vocab_kvs_survive_requantization(self, vocab_gguf, tmp_path):
        """tools/convert.py's non-q8_0 outtypes requantize through
        quantize_gguf — the embedded tokenizer KVs must ride along.
        Slow: serializing the 151k-token vocab twice costs ~25 s; the
        same KV read/write path is covered in the default run by
        test_from_gguf_matches_tokenizer_json."""
        from fun_asr_gguf_tpu.formats.gguf import GGUFReader
        from fun_asr_gguf_tpu.tools.quantize import quantize_gguf
        out = str(tmp_path / "req.gguf")
        quantize_gguf(vocab_gguf, out, "q4_0")
        r = GGUFReader(out)
        assert len(r.fields["tokenizer.ggml.tokens"]) == 151646
        assert r.fields["tokenizer.ggml.pre"] == "qwen2"
        from fun_asr_gguf_tpu.formats.tokenizer import QwenTokenizer
        assert QwenTokenizer.from_gguf(out).encode("<|im_end|>") == [151645]

    @pytest.mark.slow
    def test_save_qwen3_embeds_vocab(self, qwen_schema_tok_path, tmp_path):
        # slow: writes the full 151k-token vocab (~25 s); the embedded-KV
        # format itself is covered by the default-run golden test
        import jax
        from fun_asr_gguf_tpu.formats.gguf import GGUFReader
        from fun_asr_gguf_tpu.formats.tokenizer import QwenTokenizer
        from fun_asr_gguf_tpu.models.config import Qwen3Config
        from fun_asr_gguf_tpu.models.loaders import save_qwen3_to_gguf
        from fun_asr_gguf_tpu.models.qwen3 import init_qwen3_params
        cfg = Qwen3Config.tiny(vocab_size=64)
        params = init_qwen3_params(jax.random.PRNGKey(0), cfg)
        path = str(tmp_path / "d.gguf")
        save_qwen3_to_gguf(path, params, cfg,
                           tokenizer_json=qwen_schema_tok_path)
        r = GGUFReader(path)
        assert r.fields["tokenizer.ggml.pre"] == "qwen2"
        assert r.fields["tokenizer.ggml.eos_token_id"] == 151645
        tok = QwenTokenizer.from_gguf(path)
        assert tok.encode("<|im_end|>") == [151645]


class TestLazyPackageImport:
    """Importing the package (or its format layer) must not pull in jax:
    on the TPU platform backend init dials the remote chip, which a
    format-only CLI (gguf_split / gguf_edit / tokenize) must never do."""

    def test_format_layer_imports_without_jax(self):
        import subprocess
        import sys
        code = (
            "import sys\n"
            "import fun_asr_gguf_tpu\n"
            "from fun_asr_gguf_tpu.formats.gguf import GGUFReader\n"
            "from fun_asr_gguf_tpu.tools import gguf_split, tokenize\n"
            "assert 'jax' not in sys.modules, 'jax imported eagerly'\n"
            "assert fun_asr_gguf_tpu.create_asr_engine is not None\n"
            "assert 'jax' in sys.modules  # lazy attr loads the stack\n"
        )
        import os
        env = dict(os.environ, JAX_PLATFORMS="cpu",
                   PYTHONPATH=os.path.dirname(os.path.dirname(
                       os.path.abspath(__file__))))
        proc = subprocess.run([sys.executable, "-c", code], env=env,
                              capture_output=True, text=True, timeout=300)
        assert proc.returncode == 0, proc.stderr


class TestReaderCorruptionRobustness:
    """Untrusted-file handling: every corruption must surface as a clean
    Python exception (or benign data) — never a crash, hang, or giant
    allocation. 120 seeded corruption variants over a real file."""

    def test_fuzzed_corruptions_fail_cleanly(self, tmp_path):
        import random
        import struct
        from fun_asr_gguf_tpu.formats.gguf import GGUFReader, GGUFWriter
        good = str(tmp_path / "good.gguf")
        w = GGUFWriter(good, arch="qwen3")
        w.add_kv("qwen3.block_count", 2)
        w.add_kv("tokenizer.ggml.tokens", ["a", "b", "c"])
        w.add_tensor("token_embd.weight", np.ones((8, 32), np.float32))
        w.add_tensor("blk.0.attn_q.weight", np.ones((16, 8), np.float16))
        w.write()
        raw = open(good, "rb").read()
        rng = random.Random(0)
        bad = str(tmp_path / "bad.gguf")
        for trial in range(120):
            b = bytearray(raw)
            mode = trial % 4
            if mode == 0:
                b = b[:rng.randrange(1, len(b))]
            elif mode == 1:
                for _ in range(rng.randrange(1, 8)):
                    b[rng.randrange(len(b))] = rng.randrange(256)
            elif mode == 2:
                off = rng.choice([8, 16])
                b[off:off + 8] = struct.pack(
                    "<Q", rng.choice([2 ** 63, 2 ** 40, 0xFFFFFFFF]))
            else:
                off = rng.randrange(24, min(len(b), 200))
                b[off:off + 4] = struct.pack("<I", 0x7FFFFFFF)
            open(bad, "wb").write(bytes(b))
            try:
                r = GGUFReader(bad)
                for name in r.tensor_names():
                    np.asarray(r.tensor(name))
                dict(r.fields)
            except MemoryError:
                raise AssertionError(
                    f"trial {trial} (mode {mode}): corrupted counts "
                    "drove a giant allocation")
            except Exception:
                pass    # clean failure is the contract
