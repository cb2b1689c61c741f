# coding: utf-8
"""Cross-validation against the reference's vendored llama.cpp gguf-py.

Bit-level interop proof for the GGUF layer (PARITY §2.3): files written
by the reference writer load through our reader with identical values
(incl. q8_0 block payloads and dequantization), and files written by our
writer load through the reference reader. Skipped when the read-only
reference checkout is absent.
"""

import os
import sys

import numpy as np
import pytest

REF = "/root/reference/fun_asr_gguf"
pytestmark = pytest.mark.skipif(
    not os.path.isdir(os.path.join(REF, "gguf")),
    reason="reference gguf-py not present")


def _ref_gguf():
    if REF not in sys.path:
        sys.path.insert(0, REF)
    import gguf as refgguf
    return refgguf


def test_reference_writer_to_our_reader(tmp_path):
    refgguf = _ref_gguf()
    from fun_asr_gguf_tpu.formats.gguf import GGUFReader

    path = str(tmp_path / "ref_written.gguf")
    rng = np.random.default_rng(0)
    w_f32 = rng.normal(size=(8, 64)).astype(np.float32)
    w_f16 = rng.normal(size=(4, 32)).astype(np.float16)
    w_q8_src = rng.normal(size=(2, 64)).astype(np.float32)

    w = refgguf.GGUFWriter(path, "qwen3")
    w.add_uint32("qwen3.block_count", 28)
    w.add_string("general.name", "interop")
    w.add_float32("qwen3.rope.freq_base", 1e6)
    w.add_array("tokenizer.ggml.tokens", ["a", "b", "<|im_end|>"])
    w.add_bool("general.flag", True)
    w.add_tensor("w_f32", w_f32)
    w.add_tensor("w_f16", w_f16)
    # quantize with the reference's own bit-exact q8_0
    q8_data = refgguf.quants.quantize(w_q8_src, refgguf.GGMLQuantizationType.Q8_0)
    w.add_tensor("w_q8", q8_data,
                 raw_shape=q8_data.shape,
                 raw_dtype=refgguf.GGMLQuantizationType.Q8_0)
    w.write_header_to_file()
    w.write_kv_data_to_file()
    w.write_tensors_to_file()
    w.close()

    r = GGUFReader(path)
    assert r.fields["qwen3.block_count"] == 28
    assert r.fields["general.name"] == "interop"
    assert abs(r.fields["qwen3.rope.freq_base"] - 1e6) < 1.0
    assert r.fields["tokenizer.ggml.tokens"] == ["a", "b", "<|im_end|>"]
    assert r.fields["general.flag"] is True

    np.testing.assert_array_equal(r.tensor("w_f32"), w_f32)
    np.testing.assert_array_equal(r.tensor("w_f16"), w_f16)
    # q8_0: our reader's dequant must equal the reference's dequant of the
    # same payload
    ours = np.asarray(r.tensor("w_q8"), np.float32)
    theirs = refgguf.quants.dequantize(
        q8_data, refgguf.GGMLQuantizationType.Q8_0).astype(np.float32)
    np.testing.assert_array_equal(ours.reshape(theirs.shape), theirs)


def test_our_writer_to_reference_reader(tmp_path):
    refgguf = _ref_gguf()
    from fun_asr_gguf_tpu.formats.gguf import GGMLType, GGUFWriter

    path = str(tmp_path / "ours_written.gguf")
    rng = np.random.default_rng(1)
    w_f32 = rng.normal(size=(6, 32)).astype(np.float32)
    w_q8_src = rng.normal(size=(2, 64)).astype(np.float32)

    w = GGUFWriter(path, "qwen3")
    w.add_kv("qwen3.embedding_length", 1024)
    w.add_kv("general.name", "ours")
    w.add_kv("tokenizer.ggml.tokens", ["x", "y"])
    w.add_tensor("w_f32", w_f32)
    w.add_tensor("w_q8", w_q8_src, ggml_type=GGMLType.Q8_0)
    w.write()

    r = refgguf.GGUFReader(path)
    fields = {f.name: f for f in r.fields.values()}
    assert "qwen3.embedding_length" in fields
    emb = fields["qwen3.embedding_length"]
    assert int(emb.parts[emb.data[0]][0]) == 1024

    tensors = {t.name: t for t in r.tensors}
    assert set(tensors) == {"w_f32", "w_q8"}
    np.testing.assert_array_equal(
        np.asarray(tensors["w_f32"].data, np.float32
                   ).reshape(w_f32.shape), w_f32)
    # reference-side dequant of our q8_0 bytes == reference quant+dequant
    # of the same source (our quantizer is bit-exact with gguf-py's)
    theirs = refgguf.quants.dequantize(
        np.asarray(tensors["w_q8"].data).reshape(2, -1),
        refgguf.GGMLQuantizationType.Q8_0)
    ref_roundtrip = refgguf.quants.dequantize(
        refgguf.quants.quantize(w_q8_src,
                                refgguf.GGMLQuantizationType.Q8_0),
        refgguf.GGMLQuantizationType.Q8_0)
    np.testing.assert_array_equal(theirs.astype(np.float32),
                                  ref_roundtrip.astype(np.float32))


# ---------------------------------------------------------------------------
# Quantizer bit-exactness + K-quant read support (round-2 additions)
# ---------------------------------------------------------------------------

LEGACY_QUANT = ["Q4_0", "Q4_1", "Q5_0", "Q5_1", "Q8_0"]
K_QUANT_BLOCK_BYTES = {"Q2_K": 84, "Q3_K": 110, "Q4_K": 144,
                       "Q5_K": 176, "Q6_K": 210}


@pytest.mark.parametrize("tname", LEGACY_QUANT)
def test_legacy_quantizers_bit_exact(tname):
    """Our float→bytes quantizers emit byte-identical streams to the
    reference's vendored gguf-py (which is itself bit-exact with ggml's C
    quantizers) — incl. the trunc(+0.5/8.5/16.5) rounding and the
    unrounded-f32-scale semantics."""
    refgguf = _ref_gguf()
    from fun_asr_gguf_tpu.formats import quant_np as qn
    rt = getattr(refgguf.GGMLQuantizationType, tname)
    rng = np.random.default_rng(hash(tname) % 2**31)
    x = rng.normal(size=(16, 256)).astype(np.float32) * 3
    # exercise ties and zero blocks too
    x[0] = 0.0
    x[1, ::2] = np.float32(0.5) * np.sign(x[1, ::2])
    ref = refgguf.quants.quantize(x, rt).reshape(-1).view(np.uint8)
    if tname == "Q8_0":
        q, d = qn.q8_0_quantize(x)
        mine = qn.q8_0_to_blocks(q, d)
    else:
        mine = getattr(qn, f"{tname.lower()}_quantize")(x)
    np.testing.assert_array_equal(mine, ref)


@pytest.mark.parametrize("tname", sorted(K_QUANT_BLOCK_BYTES))
def test_kquant_dequant_bit_exact(tname):
    """K-quant (256-value superblock) dequantizers agree bit-for-bit with
    the reference's on arbitrary encoded blocks (any byte pattern is a
    valid encoding; gguf-py has no K-quant quantizer to generate 'real'
    ones)."""
    refgguf = _ref_gguf()
    from fun_asr_gguf_tpu.formats import quant_np as qn
    rt = getattr(refgguf.GGMLQuantizationType, tname)
    bb = K_QUANT_BLOCK_BYTES[tname]
    rng = np.random.default_rng(hash(tname) % 2**31)
    nb = 12
    raw = rng.integers(0, 256, size=nb * bb, dtype=np.uint8)
    with np.errstate(invalid="ignore"):
        theirs = refgguf.quants.dequantize(raw.reshape(nb, bb),
                                           rt).astype(np.float32)
        ours = getattr(qn, f"{tname.lower()}_dequantize_blocks")(
            raw, (nb, 256))
    np.testing.assert_array_equal(
        np.where(np.isnan(ours), 0, ours), np.where(np.isnan(theirs), 0,
                                                    theirs))
    np.testing.assert_array_equal(np.isnan(ours), np.isnan(theirs))


IQ4_BLOCKS = {"IQ4_NL": (32, 18), "IQ4_XS": (256, 136)}


@pytest.mark.parametrize("tname", sorted(IQ4_BLOCKS))
def test_iq4_dequant_bit_exact(tname):
    """IQ4 non-linear-codebook dequantizers agree bit-for-bit with the
    reference's vendored gguf-py on arbitrary encoded blocks."""
    refgguf = _ref_gguf()
    from fun_asr_gguf_tpu.formats import quant_np as qn
    rt = getattr(refgguf.GGMLQuantizationType, tname)
    bv, bb = IQ4_BLOCKS[tname]
    rng = np.random.default_rng(hash(tname) % 2**31)
    nb = 12
    raw = rng.integers(0, 256, size=nb * bb, dtype=np.uint8)
    with np.errstate(invalid="ignore"):
        theirs = refgguf.quants.dequantize(raw.reshape(nb, bb),
                                           rt).astype(np.float32)
        ours = getattr(qn, f"{tname.lower()}_dequantize_blocks")(
            raw, (nb, bv))
    np.testing.assert_array_equal(
        np.where(np.isnan(ours), 0, ours), np.where(np.isnan(theirs), 0,
                                                    theirs))
    np.testing.assert_array_equal(np.isnan(ours), np.isnan(theirs))


def test_reader_dequantizes_kquant_tensor(tmp_path):
    """A GGUF carrying a Q4_K tensor (e.g. a q4_K_M llama.cpp export)
    loads through GGUFReader.tensor() with reference-identical values."""
    refgguf = _ref_gguf()
    from fun_asr_gguf_tpu.formats.gguf import (GGMLType, GGUFReader,
                                               GGUFWriter)
    rng = np.random.default_rng(7)
    nb = 8
    raw = rng.integers(0, 128, size=nb * 144, dtype=np.uint8)  # finite f16s
    path = str(tmp_path / "kq.gguf")
    w = GGUFWriter(path, "qwen3")
    w.add_tensor_raw("w_q4k", raw.tobytes(), (nb, 256), GGMLType.Q4_K)
    w.write()
    r = GGUFReader(path)
    info = r.tensor_info("w_q4k")
    assert info.ggml_type == GGMLType.Q4_K
    assert info.nbytes == nb * 144
    ours = r.tensor("w_q4k")
    theirs = refgguf.quants.dequantize(
        raw.reshape(nb, 144), refgguf.GGMLQuantizationType.Q4_K)
    np.testing.assert_array_equal(ours, theirs.astype(np.float32))


def test_qwen3_loader_reads_kquant_gguf(tmp_path):
    """load_qwen3_from_gguf on a decoder whose matmul weights are Q4_K /
    Q6_K (the llama.cpp q4_K_M recipe: most mats q4_K, some q6_K) — the
    engine's load path dequantizes them transparently."""
    import jax.numpy as jnp
    from fun_asr_gguf_tpu.formats.gguf import GGMLType, GGUFWriter
    from fun_asr_gguf_tpu.models.config import Qwen3Config
    from fun_asr_gguf_tpu.models.loaders import (load_qwen3_from_gguf,
                                                 save_qwen3_to_gguf)
    from fun_asr_gguf_tpu.models.qwen3 import init_qwen3_params
    import jax

    cfg = Qwen3Config(hidden=256, n_layers=2, q_heads=4, kv_heads=2,
                      head_dim=64, ffn_dim=256, vocab_size=512,
                      rope_theta=1e4)
    params = init_qwen3_params(jax.random.PRNGKey(0), cfg)
    path = str(tmp_path / "dec.gguf")
    save_qwen3_to_gguf(path, params, cfg, quantize_q8_0=False)

    # rewrite with q/k mats as synthetic K-quant payloads
    from fun_asr_gguf_tpu.formats.gguf import GGUFReader
    r = GGUFReader(path)
    w = GGUFWriter(str(tmp_path / "dec_kq.gguf"), None)
    for k, v in r.fields.items():
        if k != "general.alignment":
            w.add_kv(k, v, *r.field_types[k])
    rng = np.random.default_rng(3)

    def finite_blocks(n_el, block_bytes, f16_offsets):
        raw = rng.integers(0, 256, size=(n_el // 256, block_bytes),
                           dtype=np.uint8)
        for off in f16_offsets:       # clamp f16 exponents: no inf/nan
            raw[:, off + 1] &= 0x3F
        return raw.reshape(-1)

    for name in r.tensor_names():
        info = r.tensor_info(name)
        if name.endswith("attn_q.weight"):
            n_el = int(np.prod(info.shape))
            raw = finite_blocks(n_el, 144, (0, 2))
            w.add_tensor_raw(name, raw.tobytes(), info.shape, GGMLType.Q4_K)
        elif name.endswith("ffn_down.weight"):
            n_el = int(np.prod(info.shape))
            raw = finite_blocks(n_el, 210, (208,))
            w.add_tensor_raw(name, raw.tobytes(), info.shape, GGMLType.Q6_K)
        else:
            w.add_tensor_raw(name, r.tensor_raw(name).tobytes(), info.shape,
                             info.ggml_type)
    w.write()

    loaded, lcfg, embed = load_qwen3_from_gguf(
        str(tmp_path / "dec_kq.gguf"), dtype=jnp.float32)
    assert lcfg.n_layers == cfg.n_layers
    # the K-quant mats decoded to finite floats with the right shapes
    qw = np.asarray(loaded["layers"]["q_w"])
    assert qw.shape == (2, cfg.hidden, cfg.q_heads * cfg.head_dim)
    assert np.isfinite(qw).all()
    dw = np.asarray(loaded["layers"]["down_w"])
    assert np.isfinite(dw).all()


# ---------------------------------------------------------------------------
# Full reference-python type coverage: i-quants, ternary, MXFP4, BF16
# ---------------------------------------------------------------------------

IQ_BLOCK_BYTES = {"IQ1_S": 50, "IQ1_M": 56, "IQ2_XXS": 66, "IQ2_XS": 74,
                  "IQ2_S": 82, "IQ3_XXS": 98, "IQ3_S": 110}


def test_iq_codebooks_match_format_spec():
    """The embedded lattice codebooks and the derived ksigns table are
    byte-identical to the reference's grid constants (gguf/quants.py
    grid_hex tables, themselves ggml's iq*_grid arrays)."""
    refgguf = _ref_gguf()
    from fun_asr_gguf_tpu.formats import iq_codebooks as cb
    rq = refgguf.quants
    for mine, refcls in [(cb.GRID_IQ2_XXS, rq.IQ2_XXS),
                         (cb.GRID_IQ2_XS, rq.IQ2_XS),
                         (cb.GRID_IQ2_S, rq.IQ2_S),
                         (cb.GRID_IQ3_XXS, rq.IQ3_XXS),
                         (cb.GRID_IQ3_S, rq.IQ3_S),
                         (cb.GRID_IQ1, rq.IQ1_S)]:
        refcls.init_grid()
        np.testing.assert_array_equal(
            mine, refcls.grid.reshape(refcls.grid_shape))
    np.testing.assert_array_equal(
        cb.KSIGNS, np.frombuffer(rq.IQ2_XXS.ksigns, np.uint8))


@pytest.mark.parametrize("tname", sorted(IQ_BLOCK_BYTES))
def test_iquant_dequant_bit_exact(tname):
    """I-quant (codebook lattice) dequantizers agree bit-for-bit with the
    reference's vendored gguf-py on arbitrary encoded blocks (all index
    bit-patterns are valid codebook entries)."""
    refgguf = _ref_gguf()
    from fun_asr_gguf_tpu.formats import quant_np as qn
    rt = getattr(refgguf.GGMLQuantizationType, tname)
    bb = IQ_BLOCK_BYTES[tname]
    rng = np.random.default_rng(hash(tname) % 2**31)
    nb = 12
    raw = rng.integers(0, 256, size=nb * bb, dtype=np.uint8)
    with np.errstate(invalid="ignore"):
        theirs = refgguf.quants.dequantize(raw.reshape(nb, bb),
                                           rt).astype(np.float32)
        ours = getattr(qn, f"{tname.lower()}_dequantize_blocks")(
            raw, (nb, 256))
    np.testing.assert_array_equal(
        np.where(np.isnan(ours), 0, ours),
        np.where(np.isnan(theirs), 0, theirs))
    np.testing.assert_array_equal(np.isnan(ours), np.isnan(theirs))


TERNARY_MX = {"TQ1_0": (256, 54), "TQ2_0": (256, 66), "MXFP4": (32, 17)}


@pytest.mark.parametrize("tname", sorted(TERNARY_MX))
def test_ternary_mxfp4_quantize_bit_exact(tname):
    """TQ1_0 / TQ2_0 (ternary BitNet) and MXFP4 (OCP-MX e2m1) quantizers
    emit byte-identical streams to the reference's vendored gguf-py, and
    the dequantizers invert them bit-exactly."""
    refgguf = _ref_gguf()
    from fun_asr_gguf_tpu.formats import quant_np as qn
    rt = getattr(refgguf.GGMLQuantizationType, tname)
    rng = np.random.default_rng(hash(tname) % 2**31)
    x = (rng.normal(size=(8, 512)) *
         rng.uniform(0.01, 30, size=(8, 1))).astype(np.float32)
    x[0] = 0.0                                    # zero-block edge
    x[1, ::2] = np.float32(0.5) * np.sign(x[1, ::2])   # ties
    ref = refgguf.quants.quantize(x, rt).reshape(-1)
    mine = getattr(qn, f"{tname.lower()}_quantize")(x)
    np.testing.assert_array_equal(mine, ref)
    deq_ref = refgguf.quants.dequantize(
        ref.reshape(8, -1), rt).astype(np.float32)
    deq_mine = getattr(qn, f"{tname.lower()}_dequantize_blocks")(
        mine, x.shape)
    np.testing.assert_array_equal(deq_mine, deq_ref.reshape(x.shape))


def test_bf16_quantize_bit_exact():
    """fp32→bf16 matches ggml semantics (round-to-nearest-even on the top
    16 bits, NaNs forced quiet) — including NaN/inf/subnormal edges."""
    refgguf = _ref_gguf()
    from fun_asr_gguf_tpu.formats import quant_np as qn
    rt = refgguf.GGMLQuantizationType.BF16
    rng = np.random.default_rng(30)
    x = np.concatenate([
        rng.normal(size=500).astype(np.float32) * 1e3,
        np.array([np.nan, -np.nan, np.inf, -np.inf, 0.0, -0.0,
                  1.5e-40, -1.5e-40, 1.0 + 2**-9, 1.0 + 2**-8,
                  np.float32(3.0).item(), 65504.0], np.float32),
    ]).reshape(2, -1)
    ref = refgguf.quants.quantize(x, rt).reshape(-1)
    mine = qn.bf16_quantize(x).view(np.uint8).reshape(-1)
    np.testing.assert_array_equal(mine, ref)
    back = qn.bf16_dequantize(qn.bf16_quantize(x))
    ref_back = refgguf.quants.dequantize(ref.reshape(2, -1), rt)
    np.testing.assert_array_equal(back.view(np.uint32),
                                  ref_back.astype(np.float32)
                                  .reshape(back.shape).view(np.uint32))


def test_reader_dequantizes_iquant_and_ternary(tmp_path):
    """GGUFs carrying IQ2_S / TQ2_0 / MXFP4 tensors load through
    GGUFReader.tensor() with reference-identical values."""
    refgguf = _ref_gguf()
    from fun_asr_gguf_tpu.formats.gguf import (GGMLType, GGUFReader,
                                               GGUFWriter)
    rng = np.random.default_rng(9)
    path = str(tmp_path / "iq.gguf")
    w = GGUFWriter(path, "qwen3")
    payloads = {}
    for tname, (bv, bb) in [("IQ2_S", (256, 82)), ("TQ2_0", (256, 66)),
                            ("MXFP4", (32, 17))]:
        raw = rng.integers(0, 128, size=4 * bb, dtype=np.uint8)
        payloads[tname] = raw
        w.add_tensor_raw(f"t_{tname.lower()}", raw.tobytes(),
                         (4, bv), getattr(GGMLType, tname))
    w.write()
    r = GGUFReader(path)
    for tname, raw in payloads.items():
        bv, bb = {"IQ2_S": (256, 82), "TQ2_0": (256, 66),
                  "MXFP4": (32, 17)}[tname]
        ours = r.tensor(f"t_{tname.lower()}")
        theirs = refgguf.quants.dequantize(
            raw.reshape(4, bb), getattr(refgguf.GGMLQuantizationType, tname))
        np.testing.assert_array_equal(ours, theirs.astype(np.float32))


K_QUANT_WRITE = {"Q2_K": (84, 3, 0.35), "Q3_K": (110, 7, 0.20),
                 "Q4_K": (144, 15, 0.12), "Q5_K": (176, 31, 0.06),
                 "Q6_K": (210, 63, 0.03)}


@pytest.mark.parametrize("tname", sorted(K_QUANT_WRITE))
def test_kquant_quantize_roundtrip(tname):
    """K-quant WRITE support: emitted superblocks decode identically
    through our dequantizers and the reference's vendored gguf-py, and
    the ggml-style scale search keeps reconstruction error within the
    expected bound for the bit width. (Bit-exactness vs ggml's C
    quantizer is unverifiable here — the reference ships only DLLs and
    gguf-py has no k-quant quantizer — so decode-compat + error bounds
    are the provable contract.)"""
    refgguf = _ref_gguf()
    from fun_asr_gguf_tpu.formats import quant_np as qn
    bb, nmax, tol = K_QUANT_WRITE[tname]
    rt = getattr(refgguf.GGMLQuantizationType, tname)
    rng = np.random.default_rng(hash(tname) % 2**31)
    x = (rng.normal(size=(6, 512)) *
         rng.uniform(0.05, 8, size=(6, 1))).astype(np.float32)
    x[0, :256] = 0.0                               # all-zero superblock
    x[1, :256] = 3.25                              # constant block
    raw = getattr(qn, f"{tname.lower()}_quantize")(x)
    assert raw.size == x.size // 256 * bb
    ours = getattr(qn, f"{tname.lower()}_dequantize_blocks")(raw, x.shape)
    theirs = refgguf.quants.dequantize(
        raw.reshape(-1, bb), rt).reshape(x.shape).astype(np.float32)
    np.testing.assert_array_equal(ours, theirs)
    scale = np.sqrt((x ** 2).mean())
    assert np.sqrt(((ours - x) ** 2).mean()) < tol * scale
    # zero in, zero out
    np.testing.assert_array_equal(ours[0, :256], 0.0)


def test_kquant_search_beats_naive_absmax():
    """The make_qx_quants-style scale search must beat a plain absmax
    encoder on RMSE — the reason ggml does the search at all."""
    from fun_asr_gguf_tpu.formats import quant_np as qn
    rng = np.random.default_rng(11)
    x = (rng.normal(size=(8, 512)) *
         rng.uniform(0.1, 4, size=(8, 1))).astype(np.float32)
    ours = qn.q6_k_dequantize_blocks(qn.q6_k_quantize(x), x.shape)
    g = x.reshape(-1, 16)
    d = np.abs(g).max(axis=1, keepdims=True) / 31.0
    with np.errstate(divide="ignore", invalid="ignore"):
        q = np.clip(np.rint(np.where(d == 0, 0, g / d)), -32, 31)
    naive = (q * d).reshape(x.shape)
    assert (np.sqrt(((ours - x) ** 2).mean())
            < np.sqrt(((naive - x) ** 2).mean()))


IQ4_WRITE = {"IQ4_NL": (18, 32, 0.12), "IQ4_XS": (136, 256, 0.12)}


@pytest.mark.parametrize("tname", sorted(IQ4_WRITE))
def test_iq4_quantize_roundtrip(tname):
    """IQ4 WRITE support: format-valid encoding into the non-linear
    codebook (scale candidates + weighted least-squares refinement),
    decode-verified through gguf-py; not claimed bit-identical to ggml's
    C search."""
    refgguf = _ref_gguf()
    from fun_asr_gguf_tpu.formats import quant_np as qn
    bb, bv, tol = IQ4_WRITE[tname]
    rt = getattr(refgguf.GGMLQuantizationType, tname)
    rng = np.random.default_rng(hash(tname) % 2**31)
    x = (rng.normal(size=(6, 512)) *
         rng.uniform(0.05, 8, size=(6, 1))).astype(np.float32)
    x[0, :256] = 0.0
    raw = getattr(qn, f"{tname.lower()}_quantize")(x)
    assert raw.size == x.size // bv * bb
    ours = getattr(qn, f"{tname.lower()}_dequantize_blocks")(raw, x.shape)
    theirs = refgguf.quants.dequantize(
        raw.reshape(-1, bb), rt).reshape(x.shape).astype(np.float32)
    np.testing.assert_array_equal(ours, theirs)
    scale = np.sqrt((x ** 2).mean())
    assert np.sqrt(((ours - x) ** 2).mean()) < tol * scale
    np.testing.assert_array_equal(ours[0, :256], np.zeros(256, np.float32))


def test_our_llama3_rope_freqs_reads_via_reference(tmp_path):
    """r5 additions through the reference reader: a llama export with
    Llama-3.1 rope scaling must expose the llama.cpp-convention
    rope_freqs.weight tensor, and a gemma2 export its KV set."""
    import jax
    refgguf = _ref_gguf()
    from fun_asr_gguf_tpu.models.config import (Qwen3Config,
                                                llama3_rope_factors)
    from fun_asr_gguf_tpu.models.loaders import save_qwen3_to_gguf
    from fun_asr_gguf_tpu.models.qwen3 import init_qwen3_params

    factors = llama3_rope_factors(16, 10000.0, 8.0, 1.0, 4.0, 64)
    cfg = Qwen3Config(hidden=64, n_layers=2, q_heads=4, kv_heads=2,
                      head_dim=16, ffn_dim=96, vocab_size=128,
                      rope_theta=10000.0, arch="llama", qk_norm=False,
                      rope_factors_short=factors,
                      rope_orig_max_position=64)
    params = init_qwen3_params(jax.random.PRNGKey(0), cfg)
    path = str(tmp_path / "l3.gguf")
    save_qwen3_to_gguf(path, params, cfg, quantize_q8_0=False)

    r = refgguf.GGUFReader(path)
    names = {t.name for t in r.tensors}
    assert "rope_freqs.weight" in names
    t = next(t for t in r.tensors if t.name == "rope_freqs.weight")
    np.testing.assert_allclose(np.asarray(t.data, np.float32),
                               np.asarray(factors, np.float32),
                               rtol=1e-6)


def test_our_gemma2_kvs_read_via_reference(tmp_path):
    import jax
    refgguf = _ref_gguf()
    from fun_asr_gguf_tpu.models.config import Qwen3Config
    from fun_asr_gguf_tpu.models.loaders import save_qwen3_to_gguf
    from fun_asr_gguf_tpu.models.qwen3 import init_qwen3_params

    cfg = Qwen3Config(hidden=64, n_layers=2, q_heads=2, kv_heads=1,
                      head_dim=32, ffn_dim=96, vocab_size=128,
                      rope_theta=1e4, arch="gemma2", qk_norm=False,
                      post_norms=True, act="gelu_tanh",
                      embed_scale=8.0, attn_scale=32 ** -0.5,
                      sliding_window=8, sliding_pattern=2,
                      rope_local_theta=1e4, attn_softcap=50.0,
                      final_softcap=30.0)
    params = init_qwen3_params(jax.random.PRNGKey(1), cfg)
    path = str(tmp_path / "g2.gguf")
    save_qwen3_to_gguf(path, params, cfg, quantize_q8_0=False)

    r = refgguf.GGUFReader(path)
    fields = {f.name: f for f in r.fields.values()}
    def scalar(name):
        f = fields[name]
        return float(f.parts[f.data[0]][0])
    assert scalar("gemma2.attn_logit_softcapping") == pytest.approx(50.0)
    assert scalar("gemma2.final_logit_softcapping") == pytest.approx(30.0)
    assert scalar("gemma2.attention.sliding_window") == pytest.approx(8)
    names = {t.name for t in r.tensors}
    assert "blk.0.post_attention_norm.weight" in names
    assert "blk.0.post_ffw_norm.weight" in names


def test_our_qwen2moe_reads_via_reference(tmp_path):
    import jax
    refgguf = _ref_gguf()
    from fun_asr_gguf_tpu.models.config import Qwen3Config
    from fun_asr_gguf_tpu.models.loaders import save_qwen3_to_gguf
    from fun_asr_gguf_tpu.models.qwen3 import init_qwen3_params

    cfg = Qwen3Config.tiny_qwen2moe(vocab_size=128)
    params = init_qwen3_params(jax.random.PRNGKey(2), cfg)
    path = str(tmp_path / "q2moe.gguf")
    save_qwen3_to_gguf(path, params, cfg, quantize_q8_0=False)

    r = refgguf.GGUFReader(path)
    fields = {f.name: f for f in r.fields.values()}
    def scalar(name):
        f = fields[name]
        return float(f.parts[f.data[0]][0])
    assert scalar("qwen2moe.expert_shared_feed_forward_length") \
        == pytest.approx(cfg.shared_ffn_dim)
    assert scalar("qwen2moe.expert_count") == pytest.approx(cfg.n_experts)
    names = {t.name for t in r.tensors}
    # llama.cpp qwen2moe tensor set: expert stacks + gated shared expert
    assert "blk.0.ffn_gate_exps.weight" in names
    assert "blk.0.ffn_gate_shexp.weight" in names
    assert "blk.0.ffn_gate_inp_shexp.weight" in names
    t = next(t for t in r.tensors
             if t.name == "blk.0.ffn_gate_inp_shexp.weight")
    assert tuple(int(x) for x in t.shape) == (cfg.hidden, 1)
