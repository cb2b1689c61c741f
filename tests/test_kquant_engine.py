# coding: utf-8
"""Any llama.cpp export must be RUNNABLE, not just decodable.

The codec level (tests/test_gguf_interop.py) proves we read/write every
quant type bit-exactly; these tests close the loop the reference closes
with llama.dll (which executes every format it ships): quantize a tiny
decoder to k-quant / i-quant / legacy types with ``tools/quantize.py``,
point the ENGINE at the file, and transcribe — dequant-at-load feeds the
int8/bf16 decode graphs.
"""

import base64
import os
import shutil

import numpy as np
import pytest

import jax.numpy as jnp

from fun_asr_gguf_tpu.audio import write_wav
from fun_asr_gguf_tpu.hotword.manager import reset_hotword_manager
from fun_asr_gguf_tpu.models.config import (AdaptorConfig, CTCHeadConfig,
                                            EncoderConfig, HybridConfig,
                                            Qwen3Config)
from fun_asr_gguf_tpu.models.loaders import (create_random_checkpoint,
                                             load_qwen3_from_gguf)
from fun_asr_gguf_tpu.tools.quantize import quantize_gguf


def _kquant_cfg():
    """Tiny stack whose decoder in-dims divide the 256-wide k-quant
    superblock (hidden/ffn/attn-out all 256)."""
    enc = EncoderConfig.tiny()
    llm = Qwen3Config(hidden=256, n_layers=2, q_heads=4, kv_heads=2,
                      head_dim=64, ffn_dim=256, vocab_size=512,
                      rope_theta=1e4)
    return HybridConfig(
        encoder=enc,
        adaptor=AdaptorConfig.tiny(in_dim=enc.d_model, out_dim=llm.hidden),
        ctc=CTCHeadConfig.tiny(d=enc.d_model, vocab_size=101),
        llm=llm)


@pytest.fixture(scope="module")
def q8_checkpoint(tmp_path_factory):
    ckpt = str(tmp_path_factory.mktemp("kq") / "model")
    cfg = create_random_checkpoint(ckpt, _kquant_cfg(), seed=0)
    lines = []
    for i in range(cfg.ctc.vocab_size):
        ch = chr(ord("一") + i) if i < cfg.ctc.vocab_size - 1 else "<blk>"
        lines.append(f"{base64.b64encode(ch.encode()).decode()} {i}")
    with open(os.path.join(ckpt, "tokens.txt"), "w", encoding="utf-8") as f:
        f.write("\n".join(lines) + "\n")
    return ckpt, cfg


def _requantized_copy(ckpt, tmp_path, ttype):
    """Copy of the checkpoint dir with decoder.gguf rewritten as ttype
    (exactly what a user does with a llama.cpp-quantized file)."""
    dst = str(tmp_path / f"ckpt_{ttype}")
    shutil.copytree(ckpt, dst)
    src_gguf = os.path.join(ckpt, "decoder.gguf")
    out_gguf = os.path.join(dst, "decoder.gguf")
    os.remove(out_gguf)
    quantize_gguf(src_gguf, out_gguf, ttype)
    return dst


def _make_wav(tmp_path, name, seconds=1.0, seed=0):
    sr = 16000
    rng = np.random.default_rng(seed)
    sig = rng.normal(size=int(sr * seconds)) * 0.05
    path = str(tmp_path / name)
    write_wav(path, sig, sr)
    return path


def _engine(ckpt_dir):
    from fun_asr_gguf_tpu import create_asr_engine
    reset_hotword_manager()
    return create_asr_engine(
        checkpoint_dir=ckpt_dir, verbose=False,
        segment_pad_seconds=2.0, n_predict=12, prefill_buckets=(64,))


def test_q4_k_engine_transcribes(q8_checkpoint, tmp_path):
    """The headline case: llama.cpp's most common k-quant export runs
    end-to-end through the engine (dequant-at-load → int8 decode)."""
    ckpt, _cfg = q8_checkpoint
    dst = _requantized_copy(ckpt, tmp_path, "q4_k")

    # the rewritten file really is q4_K on its matmul weights
    from fun_asr_gguf_tpu.formats.gguf import GGMLType, GGUFReader
    r = GGUFReader(os.path.join(dst, "decoder.gguf"))
    qtypes = {info.name: info.ggml_type for info in r.tensors}
    assert qtypes["blk.0.attn_q.weight"] == GGMLType.Q4_K
    assert qtypes["token_embd.weight"] == GGMLType.Q4_K

    eng = _engine(dst)
    try:
        path = _make_wav(tmp_path, "a.wav")
        r1 = eng.transcribe(path, verbose=False, temperature=0.0)
        r2 = eng.transcribe(path, verbose=False, temperature=0.0)
        assert isinstance(r1.text, str)
        assert r1.timings.llm_generate > 0
        assert r1.text == r2.text                  # greedy deterministic
    finally:
        eng.cleanup()
        reset_hotword_manager()


def test_q4_k_logits_close_to_source(q8_checkpoint, tmp_path):
    """Decode-graph numerics: the q4_K reload must stay close to the
    q8_0 original (same weights, one extra quantization)."""
    from fun_asr_gguf_tpu.models.qwen3 import qwen3_forward_logits

    ckpt, _cfg = q8_checkpoint
    dst = _requantized_copy(ckpt, tmp_path, "q4_k")
    pa, ca, _ = load_qwen3_from_gguf(os.path.join(ckpt, "decoder.gguf"),
                                     dtype=jnp.float32)
    pb, cb, _ = load_qwen3_from_gguf(os.path.join(dst, "decoder.gguf"),
                                     dtype=jnp.float32)
    assert ca == cb
    rng = np.random.default_rng(1)
    ids = rng.integers(0, ca.vocab_size, size=(1, 16))
    mask = jnp.ones(ids.shape, jnp.float32)
    a = np.asarray(qwen3_forward_logits(
        pa, pa["embed"][jnp.asarray(ids)], mask, ca))
    b = np.asarray(qwen3_forward_logits(
        pb, pb["embed"][jnp.asarray(ids)], mask, cb))
    cos = np.sum(a * b) / (np.linalg.norm(a) * np.linalg.norm(b))
    # random (incompressible) weights are the worst case for 4-bit
    # superblock quantization — measured cos ≈ 0.965 here; trained
    # weights land far higher (see tests/test_imatrix.py PPL deltas)
    assert cos > 0.94, cos


@pytest.mark.slow
@pytest.mark.parametrize("ttype", ["q2_k", "q5_k", "q6_k", "iq4_xs",
                                   "q4_0", "q5_1", "mxfp4", "iq4_nl"])
def test_other_quant_types_generate(q8_checkpoint, tmp_path, ttype):
    """Every quantizer target loads into the decode graph and generates
    (prefill + greedy steps) without error."""
    from fun_asr_gguf_tpu.models.qwen3 import (qwen3_decode_step,
                                               qwen3_prefill)

    ckpt, _cfg = q8_checkpoint
    dst = _requantized_copy(ckpt, tmp_path, ttype)
    params, cfg, _ = load_qwen3_from_gguf(os.path.join(dst, "decoder.gguf"),
                                          dtype=jnp.float32)
    rng = np.random.default_rng(2)
    ids = rng.integers(0, cfg.vocab_size, size=(1, 8))
    embeds = params["embed"][jnp.asarray(ids)].astype(jnp.float32)
    mask = jnp.ones(ids.shape, jnp.float32)
    logits, kv = qwen3_prefill(params, embeds, mask, cfg, kv_max_len=12)
    assert np.isfinite(np.asarray(logits)).all()
    tok = int(jnp.argmax(logits[0]))
    for t in range(3):
        emb = params["embed"][jnp.asarray([tok])].astype(jnp.float32)
        logits, kv = qwen3_decode_step(
            params, kv, emb, jnp.asarray(8 + t, jnp.int32),
            jnp.asarray([8 + t], jnp.int32), jnp.asarray([0], jnp.int32),
            cfg)
        assert np.isfinite(np.asarray(logits)).all()
        tok = int(jnp.argmax(logits[0]))
