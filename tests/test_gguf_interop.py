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
