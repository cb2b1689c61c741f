# coding: utf-8
"""PromptBuilder parity: prompt strings must be byte-identical to the
reference's construction (``prompt_utils.py:29-45``) — the LLM was trained
on these exact templates, so every byte matters for CER parity."""

import numpy as np
import pytest

from fun_asr_gguf_tpu.prompt_utils import PromptBuilder


class _FakeTok:
    def encode(self, text):
        return list(text.encode("utf-8"))[:8]    # any stable mapping


@pytest.fixture
def builder():
    return PromptBuilder(_FakeTok(), np.zeros((256, 4), np.float32))


PREFIX_BASE = ("<|im_start|>system\nYou are a helpful assistant."
               "<|im_end|>\n<|im_start|>user\n")
SUFFIX = "<|im_end|>\n<|im_start|>assistant\n"


class TestPromptBytes:
    def test_plain(self, builder):
        *_, text = builder.build_prompt()
        assert text == PREFIX_BASE + "语音转写："

    def test_language(self, builder):
        *_, text = builder.build_prompt(language="英文")
        assert text == PREFIX_BASE + "语音转写成英文："

    def test_hotwords(self, builder):
        *_, text = builder.build_prompt(hotwords=["督工", "睡前消息"])
        assert text == (PREFIX_BASE
                        + "热词列表：[督工, 睡前消息]\n"
                        + "语音转写：")

    def test_context_and_hotwords(self, builder):
        *_, text = builder.build_prompt(hotwords=["甲"], context="会议记录")
        assert text == (PREFIX_BASE
                        + "请结合上下文信息，更加准确地完成语音转写任务。\n\n\n"
                        + "**上下文信息：**会议记录\n\n\n"
                        + "热词列表：[甲]\n"
                        + "语音转写：")

    def test_suffix_constant(self, builder):
        prefix_embd, suffix_embd, n_p, n_s, _ = builder.build_prompt()
        # suffix always tokenizes the same constant string
        assert n_s == len(_FakeTok().encode(SUFFIX))
        assert prefix_embd.shape == (n_p, 4)
        assert suffix_embd.shape == (n_s, 4)
        assert prefix_embd.dtype == np.float32


class TestConfigDefaults:
    def test_reference_behavioral_defaults(self):
        """Behavioral defaults must match the reference's
        (``nano_dataclass.py:145-157``) — engine behavior parity depends
        on them, not just on the algorithms."""
        from fun_asr_gguf_tpu.datatypes import ASREngineConfig
        cfg = ASREngineConfig(checkpoint_dir="x")
        assert cfg.n_predict == 512
        assert cfg.similar_threshold == 0.6
        assert cfg.max_hotwords == 10
        assert cfg.sample_rate == 16000
        assert cfg.enable_ctc is True

    def test_stop_tokens_default(self):
        # stop ids {151643, 151645} (reference core/decoder.py:53) are the
        # ModelManager default until the tokenizer overrides them
        from fun_asr_gguf_tpu.core.model_manager import ModelManager
        from fun_asr_gguf_tpu.datatypes import ASREngineConfig
        m = ModelManager(ASREngineConfig(checkpoint_dir="x"))
        assert m.stop_tokens == (151643, 151645)
