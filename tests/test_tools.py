"""Toolchain tests: HF conversion, quantizer, inspector."""

import json
import os

import numpy as np
import pytest

import jax

from fun_asr_gguf_tpu.formats.gguf import GGMLType, GGUFReader
from fun_asr_gguf_tpu.models.config import Qwen3Config
from fun_asr_gguf_tpu.models.loaders import (load_qwen3_from_gguf,
                                             save_qwen3_to_gguf)
from fun_asr_gguf_tpu.models.qwen3 import init_qwen3_params
from fun_asr_gguf_tpu.tools.convert import (qwen3_config_from_hf,
                                            qwen3_params_from_hf_state)
from fun_asr_gguf_tpu.tools.quantize import quantize_gguf


class TestHFConversion:
    def test_config_from_hf(self):
        hf = {"hidden_size": 1024, "num_hidden_layers": 28,
              "num_attention_heads": 16, "num_key_value_heads": 8,
              "head_dim": 128, "intermediate_size": 3072,
              "vocab_size": 151936, "rope_theta": 1000000,
              "rms_norm_eps": 1e-6, "tie_word_embeddings": True}
        cfg = qwen3_config_from_hf(hf)
        assert cfg == Qwen3Config()

    def test_params_from_hf_state(self):
        cfg = Qwen3Config.tiny(vocab_size=48)
        rng = np.random.default_rng(0)
        h, qd = cfg.hidden, cfg.q_heads * cfg.head_dim
        kd, f = cfg.kv_heads * cfg.head_dim, cfg.ffn_dim
        sd = {"model.embed_tokens.weight": rng.normal(size=(48, h)),
              "model.norm.weight": rng.normal(size=(h,))}
        for i in range(cfg.n_layers):
            p = f"model.layers.{i}"
            sd[f"{p}.input_layernorm.weight"] = rng.normal(size=(h,))
            sd[f"{p}.post_attention_layernorm.weight"] = rng.normal(size=(h,))
            sd[f"{p}.self_attn.q_norm.weight"] = rng.normal(size=(cfg.head_dim,))
            sd[f"{p}.self_attn.k_norm.weight"] = rng.normal(size=(cfg.head_dim,))
            sd[f"{p}.self_attn.q_proj.weight"] = rng.normal(size=(qd, h))
            sd[f"{p}.self_attn.k_proj.weight"] = rng.normal(size=(kd, h))
            sd[f"{p}.self_attn.v_proj.weight"] = rng.normal(size=(kd, h))
            sd[f"{p}.self_attn.o_proj.weight"] = rng.normal(size=(h, qd))
            sd[f"{p}.mlp.gate_proj.weight"] = rng.normal(size=(f, h))
            sd[f"{p}.mlp.up_proj.weight"] = rng.normal(size=(f, h))
            sd[f"{p}.mlp.down_proj.weight"] = rng.normal(size=(h, f))
        params = qwen3_params_from_hf_state(sd, cfg)
        assert params["layers"]["q_w"].shape == (cfg.n_layers, h, qd)
        # transposition check
        np.testing.assert_allclose(
            params["layers"]["q_w"][0],
            sd["model.layers.0.self_attn.q_proj.weight"].T, atol=1e-6)
        assert params["embed"].shape == (48, h)


class TestQuantizer:
    def test_quantize_roundtrip(self, tmp_path):
        cfg = Qwen3Config.tiny(vocab_size=64)
        params = init_qwen3_params(jax.random.PRNGKey(0), cfg)
        f16 = str(tmp_path / "f16.gguf")
        q8 = str(tmp_path / "q8.gguf")
        save_qwen3_to_gguf(f16, params, cfg, quantize_q8_0=False)
        quantize_gguf(f16, q8, "q8_0")
        r = GGUFReader(q8)
        assert r.tensor_info("blk.0.attn_q.weight").ggml_type == GGMLType.Q8_0
        assert r.tensor_info("blk.0.attn_norm.weight").ggml_type == GGMLType.F32
        # loads and matches within quantization error
        p2, cfg2, _ = load_qwen3_from_gguf(q8)
        w1 = np.asarray(params["layers"]["q_w"][0])
        w2 = np.asarray(p2["layers"]["q_w"][0], dtype=np.float32)
        assert np.abs(w1 - w2).max() < np.abs(w1).max() * 0.02

    def test_quantize_all_types(self, tmp_path):
        """Every --type target produces a loadable GGUF whose matmul
        weights carry the requested type and reconstruct the originals
        within that type's quantization error."""
        cfg = Qwen3Config.tiny(vocab_size=64)
        params = init_qwen3_params(jax.random.PRNGKey(3), cfg)
        f16 = str(tmp_path / "f16.gguf")
        save_qwen3_to_gguf(f16, params, cfg, quantize_q8_0=False)
        w1 = np.asarray(params["layers"]["q_w"][0])
        # (type, worst-case relative reconstruction error)
        for ttype, gt, tol in [("q4_0", GGMLType.Q4_0, 0.2),
                               ("q5_1", GGMLType.Q5_1, 0.1),
                               ("mxfp4", GGMLType.MXFP4, 0.5),
                               ("bf16", GGMLType.BF16, 0.02)]:
            out = str(tmp_path / f"{ttype}.gguf")
            quantize_gguf(f16, out, ttype)
            r = GGUFReader(out)
            assert r.tensor_info("blk.0.attn_q.weight").ggml_type == gt
            assert (r.tensor_info("blk.0.attn_norm.weight").ggml_type
                    == GGMLType.F32)
            p2, _, _ = load_qwen3_from_gguf(out)
            w2 = np.asarray(p2["layers"]["q_w"][0], dtype=np.float32)
            assert np.abs(w1 - w2).max() < np.abs(w1).max() * tol, ttype

    def test_smaller_file(self, tmp_path):
        cfg = Qwen3Config.tiny(vocab_size=64)
        params = init_qwen3_params(jax.random.PRNGKey(1), cfg)
        f16 = str(tmp_path / "f16.gguf")
        q8 = str(tmp_path / "q8.gguf")
        save_qwen3_to_gguf(f16, params, cfg, quantize_q8_0=False)
        quantize_gguf(f16, q8, "q8_0")
        assert os.path.getsize(q8) < os.path.getsize(f16)


class TestInspector:
    def test_inspect_runs(self, tmp_path, capsys):
        from fun_asr_gguf_tpu.tools.inspect_gguf import inspect
        cfg = Qwen3Config.tiny(vocab_size=32)
        params = init_qwen3_params(jax.random.PRNGKey(2), cfg)
        path = str(tmp_path / "m.gguf")
        save_qwen3_to_gguf(path, params, cfg)
        inspect(path)
        out = capsys.readouterr().out
        assert "token_embd.weight" in out
        assert "qwen3" in out


class TestGGUFEdit:
    """Metadata editor: byte-faithful tensor copy, typed KV rewrite."""

    def _make(self, tmp_path):
        import numpy as np
        from fun_asr_gguf_tpu.formats.gguf import (GGMLType, GGUFValueType,
                                                   GGUFWriter)
        path = str(tmp_path / "m.gguf")
        w = GGUFWriter(path, arch="qwen3")
        w.add_kv("general.name", "orig")
        w.add_kv("qwen3.block_count", 2, GGUFValueType.UINT32)
        w.add_kv("qwen3.rope.freq_base", 1e6, GGUFValueType.FLOAT32)
        w.add_kv("tokenizer.ggml.token_type", [1, 2, 3],
                 GGUFValueType.ARRAY, GGUFValueType.INT32)
        rng = np.random.default_rng(0)
        w.add_tensor("a.weight", rng.normal(size=(8, 64)).astype(np.float32))
        w.add_tensor("b.weight", rng.normal(size=(4, 32)).astype(np.float32),
                     ggml_type=GGMLType.Q8_0)
        w.write()
        return path

    def test_set_and_remove_preserves_rest(self, tmp_path):
        import numpy as np
        from fun_asr_gguf_tpu.formats.gguf import GGUFReader, GGUFValueType
        from fun_asr_gguf_tpu.tools.gguf_edit import main
        src = self._make(tmp_path)
        out = str(tmp_path / "o.gguf")
        rc = main(["set", src, out, "--set", "general.name=edited",
                   "--remove", "qwen3.rope.freq_base"])
        assert rc == 0
        r0, r1 = GGUFReader(src), GGUFReader(out)
        assert r1.fields["general.name"] == "edited"
        assert "qwen3.rope.freq_base" not in r1.fields
        # declared types preserved
        assert r1.field_types["qwen3.block_count"][0] == GGUFValueType.UINT32
        assert r1.field_types["tokenizer.ggml.token_type"] == (
            GGUFValueType.ARRAY, GGUFValueType.INT32)
        assert r1.fields["tokenizer.ggml.token_type"] == [1, 2, 3]
        # tensor payloads byte-identical (q8_0 NOT requantized)
        for name in r0.tensor_names():
            np.testing.assert_array_equal(
                np.asarray(r0.tensor_raw(name)), np.asarray(r1.tensor_raw(name)))
            assert r0.tensor_info(name).ggml_type == \
                r1.tensor_info(name).ggml_type

    def test_unknown_key_rejected_without_add(self, tmp_path, capsys):
        from fun_asr_gguf_tpu.tools.gguf_edit import main
        src = self._make(tmp_path)
        out = str(tmp_path / "o2.gguf")
        assert main(["set", src, out, "--set", "nope.key=1"]) == 2
        assert main(["set", src, out, "--set", "nope.key=1", "--add"]) == 0
        from fun_asr_gguf_tpu.formats.gguf import GGUFReader
        assert GGUFReader(out).fields["nope.key"] == 1

    def test_hash_runs(self, tmp_path, capsys):
        from fun_asr_gguf_tpu.tools.gguf_edit import main
        src = self._make(tmp_path)
        assert main(["hash", src, "--tensors"]) == 0
        out = capsys.readouterr().out
        assert "sha256" in out and "a.weight" in out


class TestEvalCER:
    def test_identical_zero(self):
        from fun_asr_gguf_tpu.tools.eval_cer import cer
        r = cer("大家好，欢迎收看。", "大家好，欢迎收看。")
        assert r["cer"] == 0.0
        assert r["ref_chars"] == 7   # punctuation stripped

    def test_known_ops(self):
        from fun_asr_gguf_tpu.tools.eval_cer import cer
        # ref 5 chars; hyp: 1 sub + 1 del
        r = cer("一二三四五", "一二X四")
        assert r["substitutions"] == 1
        assert r["deletions"] == 1
        assert r["insertions"] == 0
        assert abs(r["cer"] - 2 / 5) < 1e-9

    def test_insertion(self):
        from fun_asr_gguf_tpu.tools.eval_cer import cer
        r = cer("一二三", "一二三四")
        assert r["insertions"] == 1 and r["cer"] == pytest.approx(1 / 3)

    def test_punct_modes(self):
        from fun_asr_gguf_tpu.tools.eval_cer import cer
        assert cer("你好。", "你好", strip_punct=True)["cer"] == 0.0
        assert cer("你好。", "你好", strip_punct=False)["cer"] > 0.0

    def test_wer(self):
        from fun_asr_gguf_tpu.tools.eval_cer import wer
        r = wer("the cat sat", "the cat sit")
        assert r["substitutions"] == 1 and r["wer"] == pytest.approx(1 / 3)

    def test_golden_self_score(self, capsys):
        from fun_asr_gguf_tpu.tools.eval_cer import (GOLDEN_INPUT_MP3, cer)
        assert cer(GOLDEN_INPUT_MP3, GOLDEN_INPUT_MP3)["cer"] == 0.0
        # golden text sanity: ~350 chars Chinese (README.md:200 "~350 字")
        from fun_asr_gguf_tpu.tools.eval_cer import normalize
        n = len(normalize(GOLDEN_INPUT_MP3))
        assert 300 < n < 420

    def test_cli_files(self, tmp_path, capsys):
        from fun_asr_gguf_tpu.tools.eval_cer import main
        ref = tmp_path / "r.txt"; ref.write_text("一二三四五", "utf-8")
        hyp = tmp_path / "h.txt"; hyp.write_text("一二三四五", "utf-8")
        assert main(["--ref", str(ref), "--hyp", str(hyp)]) == 0
        assert "CER: 0.0000" in capsys.readouterr().out


def test_alignment_edit_rejected(tmp_path):
    import numpy as np
    from fun_asr_gguf_tpu.formats.gguf import GGUFWriter
    from fun_asr_gguf_tpu.tools.gguf_edit import main
    src = str(tmp_path / "a.gguf")
    w = GGUFWriter(src, arch="qwen3")
    w.add_tensor("t", np.zeros((4, 32), np.float32))
    w.write()
    out = str(tmp_path / "oa.gguf")
    assert main(["set", src, out, "--set", "general.alignment=64"]) == 2


def test_nested_array_types_preserved(tmp_path):
    import numpy as np
    from fun_asr_gguf_tpu.formats.gguf import (GGUFReader, GGUFValueType,
                                               GGUFWriter)
    path = str(tmp_path / "n.gguf")
    w = GGUFWriter(path, arch="qwen3")
    w.add_kv("nested", [[1, 2], [3]], GGUFValueType.ARRAY,
             GGUFValueType.ARRAY)
    w.add_tensor("t", np.zeros((4, 32), np.float32))
    w.write()
    r = GGUFReader(path)
    assert r.fields["nested"] == [[1, 2], [3]]
    # outer etype must be ARRAY, not the inner scalar type
    assert r.field_types["nested"] == (GGUFValueType.ARRAY,
                                       GGUFValueType.ARRAY)


class TestConvertEndian:
    """gguf endianness converter (reference gguf/scripts convert_endian)."""

    def _make_gguf(self, path):
        from fun_asr_gguf_tpu.formats.gguf import GGMLType, GGUFWriter
        w = GGUFWriter(path, arch="qwen3")
        w.add_kv("test.str", "hello")
        w.add_kv("test.int", 7)
        w.add_kv("test.float", 0.25)
        w.add_kv("test.bool", True)
        w.add_kv("test.arr_i", [1, 2, 3])
        w.add_kv("test.arr_s", ["a", "bc"])
        rng = np.random.default_rng(0)
        w.add_tensor("t_f32", rng.normal(size=(4, 8)).astype(np.float32))
        w.add_tensor("t_f16", rng.normal(size=(2, 8)).astype(np.float16))
        w.add_tensor("t_i32", np.arange(12, dtype=np.int32).reshape(3, 4))
        w.add_tensor("t_q8", rng.normal(size=(2, 64)).astype(np.float32),
                     ggml_type=GGMLType.Q8_0)
        w.add_tensor_raw("t_q5", bytes(range(44)), (64,), GGMLType.Q5_0)
        # K-quant superblocks: only the f16 d/dmin words swap (Q4_K at
        # offsets 0/2, Q6_K at 208)
        w.add_tensor_raw("t_q4k", bytes(i % 251 for i in range(2 * 144)),
                         (2, 256), GGMLType.Q4_K)
        w.add_tensor_raw("t_q6k", bytes(i % 247 for i in range(210)),
                         (256,), GGMLType.Q6_K)
        # IQ4 codebook formats: f16 d at 0 (both) + u16 scales_h at 2 (XS)
        w.add_tensor_raw("t_iq4nl", bytes(i % 253 for i in range(2 * 18)),
                         (2, 32), GGMLType.IQ4_NL)
        w.add_tensor_raw("t_iq4xs", bytes(i % 241 for i in range(136)),
                         (256,), GGMLType.IQ4_XS)
        # i-quants (u32 code words / u16 code words / u16 qh+scale words),
        # ternary trailing-f16, and single-byte-scale MXFP4
        w.add_tensor_raw("t_iq2xxs", bytes(i % 239 for i in range(66)),
                         (256,), GGMLType.IQ2_XXS)
        w.add_tensor_raw("t_iq2xs", bytes(i % 233 for i in range(74)),
                         (256,), GGMLType.IQ2_XS)
        w.add_tensor_raw("t_iq1s", bytes(i % 229 for i in range(50)),
                         (256,), GGMLType.IQ1_S)
        w.add_tensor_raw("t_iq1m", bytes(i % 227 for i in range(56)),
                         (256,), GGMLType.IQ1_M)
        w.add_tensor_raw("t_iq3s", bytes(i % 223 for i in range(110)),
                         (256,), GGMLType.IQ3_S)
        w.add_tensor_raw("t_tq1", bytes(i % 219 for i in range(54)),
                         (256,), GGMLType.TQ1_0)
        w.add_tensor_raw("t_tq2", bytes(i % 215 for i in range(66)),
                         (256,), GGMLType.TQ2_0)
        w.add_tensor_raw("t_iq2s", bytes(i % 213 for i in range(82)),
                         (256,), GGMLType.IQ2_S)
        w.add_tensor_raw("t_iq3xxs", bytes(i % 211 for i in range(98)),
                         (256,), GGMLType.IQ3_XXS)
        w.add_tensor_raw("t_mx", bytes(i % 217 for i in range(2 * 17)),
                         (2, 32), GGMLType.MXFP4)
        w.write()

    def test_roundtrip_bit_exact(self, tmp_path):
        from fun_asr_gguf_tpu.tools.convert_endian import (convert_endian,
                                                           detect_byteorder)
        le = str(tmp_path / "m.gguf")
        be = str(tmp_path / "m.be.gguf")
        le2 = str(tmp_path / "m.rt.gguf")
        self._make_gguf(le)
        assert detect_byteorder(le) == "little"
        assert convert_endian(le, be, "big", verbose=False) == "big"
        assert detect_byteorder(be) == "big"
        assert convert_endian(be, le2, "little", verbose=False) == "little"
        with open(le, "rb") as a, open(le2, "rb") as b:
            assert a.read() == b.read()

    # literal per-type word layout (independent restatement of the swap
    # rules: 2-byte word starts, 4-byte word starts within one block) —
    # an accidental edit to convert_endian._QUANT_SWAP fails here
    QUANT_WORDS = {
        "t_q8": (34, [0], []),
        "t_q4k": (144, [0, 2], []),
        "t_q6k": (210, [208], []),
        "t_iq4nl": (18, [0], []),
        "t_iq4xs": (136, [0, 2], []),
        "t_iq2xxs": (66, [0], list(range(2, 66, 4))),
        "t_iq2xs": (74, [0] + list(range(2, 66, 2)), []),
        "t_iq2s": (82, [0], []),
        "t_iq3xxs": (98, [0], list(range(66, 98, 4))),
        "t_iq3s": (110, [0], []),
        "t_iq1s": (50, [0] + list(range(34, 50, 2)), []),
        "t_iq1m": (56, list(range(48, 56, 2)), []),
        "t_tq1": (54, [52], []),
        "t_tq2": (66, [64], []),
        "t_mx": (17, [], []),
    }

    def test_single_swap_touches_exactly_the_scale_words(self, tmp_path):
        """One LE→BE pass must reverse exactly the multi-byte words of
        each quant block (f16/u16 scales, u32 code words) and leave every
        packed index/sign byte untouched — a round-trip cannot see this
        (double swap restores any offset table)."""
        from fun_asr_gguf_tpu.formats.gguf import GGUFReader
        from fun_asr_gguf_tpu.tools.convert_endian import convert_endian
        le = str(tmp_path / "m.gguf")
        be = str(tmp_path / "m.be.gguf")
        self._make_gguf(le)
        convert_endian(le, be, verbose=False)
        r = GGUFReader(le)
        be_raw = np.fromfile(be, dtype=np.uint8)
        for name, (bb, w16, w32) in self.QUANT_WORDS.items():
            t = r.tensor_info(name)
            le_pay = np.frombuffer(r.tensor_raw(name), dtype=np.uint8)
            start = r.data_start + t.offset
            be_pay = be_raw[start:start + t.nbytes]
            expect = le_pay.reshape(-1, bb).copy()
            for off in w16:
                expect[:, [off, off + 1]] = expect[:, [off + 1, off]]
            for off in w32:
                expect[:, off:off + 4] = expect[:, off:off + 4][:, ::-1]
            np.testing.assert_array_equal(
                be_pay.reshape(-1, bb), expect, err_msg=name)

    def test_big_endian_payloads_decode(self, tmp_path):
        import struct
        from fun_asr_gguf_tpu.formats.gguf import GGUFReader
        from fun_asr_gguf_tpu.tools.convert_endian import convert_endian
        le = str(tmp_path / "m.gguf")
        be = str(tmp_path / "m.be.gguf")
        self._make_gguf(le)
        convert_endian(le, be, verbose=False)
        r = GGUFReader(le)
        raw = open(be, "rb").read()
        # version field reads correctly big-endian
        assert struct.unpack(">I", raw[4:8])[0] == 3
        # f32 payload appears byteswapped at the same offsets
        t = r.tensor_info("t_f32")
        start = r.data_start + t.offset
        le_vals = np.frombuffer(r.tensor_raw("t_f32"), dtype="<f4")
        be_vals = np.frombuffer(raw[start:start + t.nbytes], dtype=">f4")
        assert np.array_equal(le_vals, be_vals)
        # Q4_K blocks: d (bytes 0-1) and dmin (2-3) swapped, the 12-byte
        # scale table and nibble payload untouched
        tk = r.tensor_info("t_q4k")
        le_blk = np.frombuffer(r.tensor_raw("t_q4k"),
                               np.uint8).reshape(-1, 144)
        sk = r.data_start + tk.offset
        be_blk = np.frombuffer(raw[sk:sk + tk.nbytes],
                               np.uint8).reshape(-1, 144)
        assert np.array_equal(be_blk[:, 0], le_blk[:, 1])
        assert np.array_equal(be_blk[:, 1], le_blk[:, 0])
        assert np.array_equal(be_blk[:, 2], le_blk[:, 3])
        assert np.array_equal(be_blk[:, 4:], le_blk[:, 4:])
        # q8_0 blocks: fp16 scale swapped, int8 values untouched
        tq = r.tensor_info("t_q8")
        qstart = r.data_start + tq.offset
        le_blocks = np.frombuffer(r.tensor_raw("t_q8"),
                                  dtype=np.uint8).reshape(-1, 34)
        be_blocks = np.frombuffer(raw[qstart:qstart + tq.nbytes],
                                  dtype=np.uint8).reshape(-1, 34)
        assert np.array_equal(le_blocks[:, 0], be_blocks[:, 1])
        assert np.array_equal(le_blocks[:, 1], be_blocks[:, 0])
        assert np.array_equal(le_blocks[:, 2:], be_blocks[:, 2:])
        # q5_0 blocks: fp16 d swapped, u32 qh byte-reversed, nibbles kept
        t5 = r.tensor_info("t_q5")
        s5 = r.data_start + t5.offset
        le5 = np.frombuffer(r.tensor_raw("t_q5"),
                            dtype=np.uint8).reshape(-1, 22)
        be5 = np.frombuffer(raw[s5:s5 + t5.nbytes],
                            dtype=np.uint8).reshape(-1, 22)
        assert np.array_equal(le5[:, [0, 1]], be5[:, [1, 0]])
        assert np.array_equal(le5[:, 2:6], be5[:, 2:6][:, ::-1])
        assert np.array_equal(le5[:, 6:], be5[:, 6:])

    def test_same_order_rejected(self, tmp_path):
        from fun_asr_gguf_tpu.tools.convert_endian import convert_endian
        le = str(tmp_path / "m.gguf")
        self._make_gguf(le)
        with pytest.raises(ValueError, match="already little"):
            convert_endian(le, str(tmp_path / "x.gguf"), "little",
                           verbose=False)

    def test_cli(self, tmp_path, capsys):
        from fun_asr_gguf_tpu.tools.convert_endian import main
        le = str(tmp_path / "m.gguf")
        be = str(tmp_path / "m.be.gguf")
        self._make_gguf(le)
        assert main([le, be, "--quiet"]) == 0
        assert "big-endian" in capsys.readouterr().out


class TestGGUFSplit:
    """llama-gguf-split equivalent: shard scheme + byte-exact merge."""

    def _make(self, tmp_path, n_tensors=7):
        from fun_asr_gguf_tpu.formats.gguf import (GGMLType, GGUFValueType,
                                                   GGUFWriter)
        path = str(tmp_path / "model.gguf")
        w = GGUFWriter(path, arch="qwen3")
        w.add_kv("general.name", "split-me")
        w.add_kv("qwen3.block_count", 3, GGUFValueType.UINT32)
        rng = np.random.default_rng(3)
        for i in range(n_tensors):
            w.add_tensor(f"blk.{i}.w", rng.normal(
                size=(4, 64)).astype(np.float32),
                ggml_type=GGMLType.Q8_0 if i % 2 else GGMLType.F32)
        w.write()
        return path

    def test_split_merge_roundtrip_bit_exact(self, tmp_path):
        import hashlib

        from fun_asr_gguf_tpu.tools.gguf_split import main
        src = self._make(tmp_path)
        prefix = str(tmp_path / "shards" / "model")
        assert main(["split", src, prefix, "--max-tensors", "3"]) == 0
        shard1 = prefix + "-00001-of-00003.gguf"
        assert os.path.exists(shard1)
        assert os.path.exists(prefix + "-00003-of-00003.gguf")

        r1 = GGUFReader(shard1)
        assert r1.fields["split.no"] == 0
        assert r1.fields["split.count"] == 3
        assert r1.fields["split.tensors.count"] == 7
        assert r1.fields["general.name"] == "split-me"
        r2 = GGUFReader(prefix + "-00002-of-00003.gguf")
        assert "general.name" not in r2.fields   # first shard only
        assert r2.fields["split.no"] == 1

        merged = str(tmp_path / "merged.gguf")
        assert main(["merge", shard1, merged]) == 0
        a, b = GGUFReader(src), GGUFReader(merged)
        assert a.tensor_names() == b.tensor_names()
        assert {k: v for k, v in a.fields.items()} == \
               {k: v for k, v in b.fields.items()}
        for name in a.tensor_names():
            ta, tb = a.tensor_info(name), b.tensor_info(name)
            assert ta.ggml_type == tb.ggml_type and ta.shape == tb.shape
            assert hashlib.sha256(bytes(a.tensor_raw(name))).digest() == \
                   hashlib.sha256(bytes(b.tensor_raw(name))).digest()

    def test_split_by_size(self, tmp_path):
        from fun_asr_gguf_tpu.tools.gguf_split import main, shard_paths
        src = self._make(tmp_path)
        prefix = str(tmp_path / "bysize" / "model")
        assert main(["split", src, prefix, "--max-size", "2K"]) == 0
        shards = sorted(os.listdir(tmp_path / "bysize"))
        assert len(shards) > 2          # 2 KiB forces several shards
        paths = shard_paths(str(tmp_path / "bysize" / shards[0]))
        assert [os.path.basename(p) for p in paths] == shards
        # no shard's tensor payload exceeds the limit
        for p in paths:
            r = GGUFReader(p)
            assert sum(t.nbytes for t in r.tensors) <= 2048

    def test_refuses_single_shard(self, tmp_path):
        from fun_asr_gguf_tpu.tools.gguf_split import main
        src = self._make(tmp_path, n_tensors=2)
        assert main(["split", src, str(tmp_path / "x"),
                     "--max-tensors", "128"]) == 1

    def test_merge_detects_missing_shard(self, tmp_path):
        from fun_asr_gguf_tpu.tools.gguf_split import main
        src = self._make(tmp_path)
        prefix = str(tmp_path / "gap" / "model")
        assert main(["split", src, prefix, "--max-tensors", "3"]) == 0
        os.remove(prefix + "-00002-of-00003.gguf")
        with pytest.raises(FileNotFoundError):
            main(["merge", prefix + "-00001-of-00003.gguf",
                  str(tmp_path / "m.gguf")])

    def test_rejects_nonpositive_max_tensors(self, tmp_path):
        from fun_asr_gguf_tpu.tools.gguf_split import main
        src = self._make(tmp_path)
        assert main(["split", src, str(tmp_path / "x"),
                     "--max-tensors", "0"]) == 2
        assert main(["split", src, str(tmp_path / "x"),
                     "--max-tensors", "-3"]) == 2

    def test_custom_alignment_preserved(self, tmp_path):
        from fun_asr_gguf_tpu.formats.gguf import GGMLType, GGUFWriter
        from fun_asr_gguf_tpu.tools.gguf_split import main
        path = str(tmp_path / "aligned.gguf")
        w = GGUFWriter(path, arch="qwen3", alignment=64)
        rng = np.random.default_rng(5)
        for i in range(4):
            w.add_tensor(f"blk.{i}.w",
                         rng.normal(size=(4, 64)).astype(np.float32),
                         ggml_type=GGMLType.F32)
        w.write()
        assert GGUFReader(path).alignment == 64
        prefix = str(tmp_path / "al" / "model")
        assert main(["split", path, prefix, "--max-tensors", "2"]) == 0
        assert GGUFReader(prefix + "-00001-of-00002.gguf").alignment == 64
        merged = str(tmp_path / "al_merged.gguf")
        assert main(["merge", prefix + "-00001-of-00002.gguf", merged]) == 0
        assert GGUFReader(merged).alignment == 64

    def test_merge_rejects_foreign_shard(self, tmp_path):
        import shutil

        from fun_asr_gguf_tpu.tools.gguf_split import main
        src = self._make(tmp_path)
        prefix = str(tmp_path / "ok" / "model")
        assert main(["split", src, prefix, "--max-tensors", "3"]) == 0
        other = str(tmp_path / "other" / "model")
        assert main(["split", src, other, "--max-tensors", "4"]) == 0
        # shard 2 of a 2-way split dropped into slot 2 of the 3-way split:
        # split.no matches (1) but split.count disagrees (2 vs 3)
        shutil.copy(other + "-00002-of-00002.gguf",
                    prefix + "-00002-of-00003.gguf")
        assert main(["merge", prefix + "-00001-of-00003.gguf",
                     str(tmp_path / "m.gguf")]) == 1


class TestTokenizeCLI:
    """llama-tokenize equivalent over the byte-fallback tokenizer."""

    def test_encode_decode_roundtrip(self, tmp_path, capsys):
        from fun_asr_gguf_tpu.tools.tokenize import main
        assert main(["--model", str(tmp_path), "--prompt", "hi",
                     "--ids", "--show-count"]) == 0
        out = capsys.readouterr().out.strip().splitlines()
        ids = eval(out[0])
        assert out[-1].endswith(f"{len(ids)}")
        assert main(["--model", str(tmp_path), "--decode",
                     ",".join(map(str, ids))]) == 0
        assert capsys.readouterr().out.strip() == "hi"

    def test_piece_listing(self, tmp_path, capsys):
        from fun_asr_gguf_tpu.tools.tokenize import main
        assert main(["--model", str(tmp_path), "--prompt", "ab"]) == 0
        lines = capsys.readouterr().out.strip().splitlines()
        assert all("->" in ln for ln in lines)

    def test_decode_excludes_encode_inputs(self, tmp_path):
        # --decode is an input mode: combining it with --prompt must be a
        # usage error, not a silent prompt drop
        from fun_asr_gguf_tpu.tools.tokenize import main
        with pytest.raises(SystemExit) as exc:
            main(["--model", str(tmp_path), "--prompt", "hi",
                  "--decode", "1,2"])
        assert exc.value.code == 2
