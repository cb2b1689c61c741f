"""Standalone HF-decoder → GGUF conversion (`tools/convert.py
--llm-only`), end to end: weights, SentencePiece vocab, special tokens,
chat template and general.* metadata land in ONE self-contained file
that the decode stack and tokenizer runtime then load with no other
artifacts — the reference's `convert_hf_to_gguf.py <dir> --outfile`
workflow."""

import json
import struct

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")


# -- minimal SPM ModelProto builder (same wire format as tests/test_spm) --

def _varint(v):
    out = bytearray()
    while True:
        b = v & 0x7F
        v >>= 7
        out.append(b | (0x80 if v else 0))
        if not v:
            return bytes(out)


def _piece(text, score, ptype):
    body = _varint((1 << 3) | 2) + _varint(len(text.encode())) \
        + text.encode()
    body += _varint((2 << 3) | 5) + struct.pack("<f", score)
    body += _varint((3 << 3) | 0) + _varint(ptype)
    return _varint((1 << 3) | 2) + _varint(len(body)) + body


PIECES = ([("<unk>", 0.0, 2), ("<s>", 0.0, 3), ("</s>", 0.0, 3),
           ("▁", -3.0, 1)]
          + [(c, -10.0, 1) for c in "helowrd"]
          + [("he", -5.0, 1), ("llo", -2.0, 1),
             ("▁he", -1.5, 1), ("▁wor", -1.6, 1)])


@pytest.fixture(scope="module")
def hf_dir(tmp_path_factory):
    from safetensors.torch import save_file
    from transformers import LlamaConfig, LlamaForCausalLM

    d = tmp_path_factory.mktemp("ckpts") / "TinyLlama-Chat-v1.0"
    d.mkdir()
    cfg = dict(vocab_size=len(PIECES), hidden_size=64,
               intermediate_size=96, num_hidden_layers=2,
               num_attention_heads=2, num_key_value_heads=1,
               rope_theta=10000.0, rms_norm_eps=1e-6,
               tie_word_embeddings=True, max_position_embeddings=128)
    torch.manual_seed(3)
    model = LlamaForCausalLM(LlamaConfig(**cfg)).eval()
    save_file({k: v.contiguous() for k, v in model.state_dict().items()
               if k != "lm_head.weight"},
              str(d / "model.safetensors"))
    (d / "config.json").write_text(json.dumps(
        {**cfg, "architectures": ["LlamaForCausalLM"]}))
    (d / "tokenizer.model").write_bytes(
        b"".join(_piece(*p) for p in PIECES))
    (d / "tokenizer_config.json").write_text(json.dumps({
        "bos_token": "<s>", "eos_token": "</s>", "add_bos_token": True,
        "chat_template": "{{ messages }}"}))
    return d, model


def test_convert_llm_end_to_end(hf_dir, tmp_path):
    from fun_asr_gguf_tpu.formats.gguf import GGUFReader
    from fun_asr_gguf_tpu.formats.spm import SpmTokenizer
    from fun_asr_gguf_tpu.formats.tokenizer import tokenizer_from_gguf
    from fun_asr_gguf_tpu.models.loaders import load_qwen3_from_gguf
    from fun_asr_gguf_tpu.models.qwen3 import (qwen3_decode_step,
                                               qwen3_prefill)
    from fun_asr_gguf_tpu.tools.convert import convert_llm

    d, model = hf_dir
    gp = str(tmp_path / "tiny.gguf")
    convert_llm(str(d), gp, outtype="f16")

    # one self-contained file: vocab + specials + template + metadata
    fields = GGUFReader(gp).fields
    assert fields["tokenizer.ggml.model"] == "llama"
    assert fields["tokenizer.ggml.bos_token_id"] == 1
    assert fields["tokenizer.ggml.eos_token_id"] == 2
    assert fields["tokenizer.ggml.add_bos_token"] is True
    assert fields["tokenizer.chat_template"] == "{{ messages }}"
    assert fields["general.basename"] == "TinyLlama"
    assert fields["general.finetune"] == "Chat"

    tok = tokenizer_from_gguf(gp)
    assert isinstance(tok, SpmTokenizer)
    ids = tok.encode("hello world")
    assert tok.decode(ids) == " hello world"

    # the converted weights generate the same greedy ids as HF
    params, cfg, _ = load_qwen3_from_gguf(gp, dtype=jnp.float32)
    prompt = [tok.bos_token] + ids
    n_new = 8
    with torch.no_grad():
        ref = model.generate(torch.tensor([prompt]), max_new_tokens=n_new,
                             do_sample=False, use_cache=True
                             ).numpy()[0, len(prompt):]
    embeds = params["embed"][jnp.asarray([prompt])].astype(jnp.float32)
    mask = jnp.ones((1, len(prompt)), jnp.float32)
    logits, kv = qwen3_prefill(params, embeds, mask, cfg,
                               kv_max_len=len(prompt) + n_new)
    out = [int(jnp.argmax(logits[0]))]
    for t in range(n_new - 1):
        emb = params["embed"][jnp.asarray([out[-1]])].astype(jnp.float32)
        logits, kv = qwen3_decode_step(
            params, kv, emb, jnp.asarray(len(prompt) + t, jnp.int32),
            jnp.asarray([len(prompt) + t], jnp.int32),
            jnp.asarray([0], jnp.int32), cfg)
        out.append(int(jnp.argmax(logits[0])))
    assert out == list(ref)


def test_streamed_export_byte_identical(hf_dir, tmp_path):
    """Lazy (streamed) conversion must produce byte-identical GGUF to the
    eager path — same offsets, same quantized payloads."""
    from fun_asr_gguf_tpu.formats.lazy import LazyHFDict, tree_has_lazy
    from fun_asr_gguf_tpu.models.loaders import save_qwen3_to_gguf
    from fun_asr_gguf_tpu.tools.convert import (load_hf_safetensors_dir,
                                                qwen3_config_from_hf,
                                                qwen3_params_from_hf_state)
    d, _ = hf_dir
    cfg = qwen3_config_from_hf(json.loads((d / "config.json").read_text()))
    p_eager = qwen3_params_from_hf_state(
        load_hf_safetensors_dir(str(d)), cfg)
    f_eager = tmp_path / "eager.gguf"
    save_qwen3_to_gguf(str(f_eager), p_eager, cfg, quantize_q8_0=True)

    p_lazy = qwen3_params_from_hf_state(LazyHFDict(str(d)), cfg,
                                        lazy=True)
    assert tree_has_lazy(p_lazy), "lazy mode did not defer any tensors"
    f_lazy = tmp_path / "lazy.gguf"
    save_qwen3_to_gguf(str(f_lazy), p_lazy, cfg, quantize_q8_0=True)
    assert f_eager.read_bytes() == f_lazy.read_bytes()


def test_streamed_export_f16_byte_identical(hf_dir, tmp_path):
    from fun_asr_gguf_tpu.formats.lazy import LazyHFDict
    from fun_asr_gguf_tpu.models.loaders import save_qwen3_to_gguf
    from fun_asr_gguf_tpu.tools.convert import (load_hf_safetensors_dir,
                                                qwen3_config_from_hf,
                                                qwen3_params_from_hf_state)
    d, _ = hf_dir
    cfg = qwen3_config_from_hf(json.loads((d / "config.json").read_text()))
    f_eager = tmp_path / "eager16.gguf"
    save_qwen3_to_gguf(
        str(f_eager),
        qwen3_params_from_hf_state(load_hf_safetensors_dir(str(d)), cfg),
        cfg, quantize_q8_0=False)
    f_lazy = tmp_path / "lazy16.gguf"
    save_qwen3_to_gguf(
        str(f_lazy),
        qwen3_params_from_hf_state(LazyHFDict(str(d)), cfg, lazy=True),
        cfg, quantize_q8_0=False)
    assert f_eager.read_bytes() == f_lazy.read_bytes()
