"""SentencePiece vocab support: protobuf parse, GGUF round-trip, and
the llama.cpp-style SPM bigram-merge encoder.

The tokenizer.model fixtures are hand-encoded protobufs (varint wire
format) so the tests need no sentencepiece dependency — exactly the
constraint the implementation works under.
"""

import struct

import pytest

from fun_asr_gguf_tpu.formats.spm import (SPM_SPACE, SpmTokenizer,
                                          gguf_vocab_from_spm,
                                          parse_spm_model)
from fun_asr_gguf_tpu.formats.tokenizer import (TOKEN_TYPE_BYTE,
                                                TOKEN_TYPE_CONTROL,
                                                TOKEN_TYPE_NORMAL,
                                                TOKEN_TYPE_UNKNOWN,
                                                tokenizer_from_gguf)

# ---------------------------------------------------------------------------
# minimal protobuf writer (test-side twin of the parser)
# ---------------------------------------------------------------------------


def _varint(v: int) -> bytes:
    if v < 0:
        v += 1 << 64
    out = bytearray()
    while True:
        b = v & 0x7F
        v >>= 7
        out.append(b | (0x80 if v else 0))
        if not v:
            return bytes(out)


def _len_field(field: int, payload: bytes) -> bytes:
    return _varint((field << 3) | 2) + _varint(len(payload)) + payload


def _piece(text: str, score: float, ptype: int = None) -> bytes:
    body = _len_field(1, text.encode("utf-8"))
    body += _varint((2 << 3) | 5) + struct.pack("<f", score)
    if ptype is not None:
        body += _varint((3 << 3) | 0) + _varint(ptype)
    return _len_field(1, body)


def _trainer(unk=0, bos=1, eos=2, pad=-1) -> bytes:
    body = b""
    for field, v in ((40, unk), (41, bos), (42, eos), (43, pad)):
        body += _varint((field << 3) | 0) + _varint(v)
    return _len_field(2, body)


# vocab: specials, an escape-space piece, chars, merge pieces, one byte
PIECES = [
    ("<unk>", 0.0, 2), ("<s>", 0.0, 3), ("</s>", 0.0, 3),
    (SPM_SPACE, -3.0, 1),
    ("h", -10.0, 1), ("e", -10.0, 1), ("l", -10.0, 1), ("o", -10.0, 1),
    ("he", -5.0, 1), ("ll", -4.0, 1), ("llo", -2.0, 1),
    (SPM_SPACE + "he", -1.5, 1),
    ("<0x7A>", -100.0, 6),       # 'z'
]
IDS = {t: i for i, (t, _s, _ty) in enumerate(PIECES)}


@pytest.fixture()
def spm_bytes():
    return b"".join(_piece(t, s, ty) for t, s, ty in PIECES) + _trainer()


def test_parse_spm_model(spm_bytes):
    m = parse_spm_model(spm_bytes)
    assert [p[0] for p in m.pieces] == [t for t, _s, _ty in PIECES]
    assert m.pieces[10][1] == pytest.approx(-2.0)
    assert [p[2] for p in m.pieces[:3]] == [2, 3, 3]
    assert m.pieces[-1][2] == TOKEN_TYPE_BYTE
    assert (m.unk_id, m.bos_id, m.eos_id, m.pad_id) == (0, 1, 2, -1)


def _tok(**kw):
    return SpmTokenizer([t for t, _s, _ty in PIECES],
                        [s for _t, s, _ty in PIECES],
                        [ty for _t, _s, ty in PIECES], **kw)


def test_encode_bigram_merge_order():
    tok = _tok()
    # " hello" -> ▁,h,e,l,l,o; best merges by score: ▁he(-1.5) needs
    # "he" first (he=-5 beats ll=-4? no: ll has the higher score) —
    # trace: ll(-4) -> ▁,h,e,ll,o ; llo(-2) -> ▁,h,e,llo ;
    # he(-5) -> ▁,he,llo ; ▁he(-1.5) -> ▁he,llo
    assert tok.encode("hello") == [IDS[SPM_SPACE + "he"], IDS["llo"]]


def test_encode_no_prefix_space():
    tok = _tok(add_space_prefix=False)
    assert tok.encode("hello") == [IDS["he"], IDS["llo"]]


def test_byte_fallback_and_unk():
    tok = _tok()
    # 'z' resolves through the <0x7A> byte piece
    assert tok.encode("z")[-1] == IDS["<0x7A>"]
    # 'q' has no piece and no byte token -> unk
    assert tok.encode("q")[-1] == tok.unk_id


def test_specials_split():
    tok = _tok()
    ids = tok.encode("<s>hello</s>")
    assert ids[0] == IDS["<s>"] and ids[-1] == IDS["</s>"]
    assert ids[1:-1] == [IDS[SPM_SPACE + "he"], IDS["llo"]]


def test_space_prefix_after_every_special():
    """llama.cpp's llm_tokenizer_spm prefixes a space after EVERY
    special token (is_prev_special), not only at the start — multi-turn
    '</s><s>text' prompts must re-prefix."""
    tok = _tok()
    ids = tok.encode("<s>hello</s><s>hello")
    mid = ids.index(IDS["</s>"])
    assert ids[mid + 2:] == [IDS[SPM_SPACE + "he"], IDS["llo"]]


def test_added_tokens_restating_base_ids_are_filtered(tmp_path):
    """HF repos routinely restate <unk>/<s>/</s> in added_tokens.json
    with their BASE ids; those are restatements, not extensions."""
    import json as _json

    mp = tmp_path / "tokenizer.model"
    mp.write_bytes(b"".join(_piece(t, s, ty) for t, s, ty in PIECES)
                   + _trainer())
    (tmp_path / "added_tokens.json").write_text(_json.dumps(
        {"<unk>": 0, "<s>": 1, "</s>": 2, "<extra>": len(PIECES)}))
    tokens, scores, types, _ = gguf_vocab_from_spm(str(mp))
    assert len(tokens) == len(PIECES) + 1
    assert tokens[-1] == "<extra>"


def test_decode_round_trip():
    tok = _tok()
    ids = tok.encode("hello")
    assert tok.decode(ids) == " hello"
    assert tok.token_bytes(IDS["<0x7A>"]) == b"z"
    assert tok.token_bytes(IDS["<s>"]) == b"<s>"


def test_gguf_vocab_from_spm_with_added_tokens(tmp_path, spm_bytes):
    mp = tmp_path / "tokenizer.model"
    mp.write_bytes(spm_bytes)
    (tmp_path / "added_tokens.json").write_text(
        '{"<extra_0>": %d, "<extra_1>": %d}' % (len(PIECES), len(PIECES) + 1))
    tokens, scores, types, model = gguf_vocab_from_spm(str(mp))
    assert tokens[-2:] == ["<extra_0>", "<extra_1>"]
    assert scores[-1] == -1000.0 and types[-1] == 4
    assert len(tokens) == len(PIECES) + 2


def test_gguf_round_trip_and_dispatch(tmp_path, spm_bytes):
    from fun_asr_gguf_tpu.formats.gguf import GGUFWriter

    mp = tmp_path / "tokenizer.model"
    mp.write_bytes(spm_bytes)
    tokens, scores, types, model = gguf_vocab_from_spm(str(mp))
    gp = str(tmp_path / "tiny_spm.gguf")
    w = GGUFWriter(gp, arch="llama")
    w.add_kv("tokenizer.ggml.model", "llama")
    w.add_kv("tokenizer.ggml.tokens", tokens)
    w.add_kv("tokenizer.ggml.scores", [float(s) for s in scores])
    w.add_kv("tokenizer.ggml.token_type", types)
    w.add_kv("tokenizer.ggml.unknown_token_id", model.unk_id)
    w.add_kv("tokenizer.ggml.bos_token_id", model.bos_id)
    w.add_kv("tokenizer.ggml.eos_token_id", model.eos_id)
    w.write()

    tok = tokenizer_from_gguf(gp)
    assert isinstance(tok, SpmTokenizer)
    assert tok.encode("hello") == [IDS[SPM_SPACE + "he"], IDS["llo"]]
    assert tok.stop_tokens == (2,)
    assert tok.decode(tok.encode("<s>hello")) == "<s> hello"


def test_save_qwen3_gguf_embeds_spm_vocab(tmp_path, spm_bytes):
    """save_qwen3_to_gguf(tokenizer_model=...) produces a GGUF whose
    embedded vocab round-trips through the dispatcher."""
    import jax.numpy as jnp

    from fun_asr_gguf_tpu.models.config import Qwen3Config
    from fun_asr_gguf_tpu.models.loaders import save_qwen3_to_gguf
    from fun_asr_gguf_tpu.models.qwen3 import init_qwen3_params

    mp = tmp_path / "tokenizer.model"
    mp.write_bytes(spm_bytes)
    cfg = Qwen3Config(hidden=64, n_layers=1, q_heads=2, kv_heads=1,
                      head_dim=32, ffn_dim=96, vocab_size=len(PIECES),
                      arch="llama", qk_norm=False)
    import jax
    params = init_qwen3_params(jax.random.PRNGKey(0), cfg, jnp.float32)
    gp = str(tmp_path / "llama_tiny.gguf")
    save_qwen3_to_gguf(gp, params, cfg, quantize_q8_0=False,
                       tokenizer_model=str(mp))
    tok = tokenizer_from_gguf(gp)
    assert isinstance(tok, SpmTokenizer)
    assert tok.encode("hello") == [IDS[SPM_SPACE + "he"], IDS["llo"]]
    # load_tokenizer picks up the raw tokenizer.model from a directory
    from fun_asr_gguf_tpu.formats.tokenizer import load_tokenizer
    (tmp_path / "tokenizer.json").unlink(missing_ok=True)
    tok2 = load_tokenizer(str(tmp_path))
    assert isinstance(tok2, SpmTokenizer)
    assert tok2.encode("hello") == tok.encode("hello")


def test_special_vocab_kvs(tmp_path):
    """SpecialVocab parity: contents from tokenizer_config.json resolve
    to ids; config.json ids fill gaps; flags/template pass through."""
    import json

    from fun_asr_gguf_tpu.formats.tokenizer import special_vocab_kvs

    tokens = ["<unk>", "<s>", "</s>", "hi"]
    (tmp_path / "tokenizer_config.json").write_text(json.dumps({
        "bos_token": "<s>",
        "eos_token": {"content": "</s>"},
        "add_bos_token": True,
        "add_eos_token": False,
        "chat_template": "{{ messages }}",
    }))
    (tmp_path / "config.json").write_text(json.dumps({"pad_token_id": 0}))
    kvs = special_vocab_kvs(str(tmp_path), tokens)
    assert kvs["tokenizer.ggml.bos_token_id"] == 1
    assert kvs["tokenizer.ggml.eos_token_id"] == 2
    assert kvs["tokenizer.ggml.padding_token_id"] == 0
    assert kvs["tokenizer.ggml.add_bos_token"] is True
    assert kvs["tokenizer.ggml.add_eos_token"] is False
    assert kvs["tokenizer.chat_template"] == "{{ messages }}"


def test_corrupt_protobuf_raises():
    with pytest.raises((ValueError, IndexError)):
        parse_spm_model(b"\xff" * 32)
