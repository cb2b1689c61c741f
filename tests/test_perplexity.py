"""tools/perplexity.py — sliding-window NLL correctness + format paths."""

import math

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from fun_asr_gguf_tpu.models.config import Qwen3Config
from fun_asr_gguf_tpu.models.qwen3 import (init_qwen3_params,
                                           qwen3_forward_logits)
from fun_asr_gguf_tpu.tools.perplexity import window_nll


@pytest.fixture(scope="module")
def tiny():
    cfg = Qwen3Config.tiny(vocab_size=128)
    params = init_qwen3_params(jax.random.PRNGKey(5), cfg)
    return params, cfg


def _direct_nll(params, cfg, ids):
    """Reference: one full-context forward, score every token after the
    first."""
    embeds = params["embed"][jnp.asarray(ids)][None]
    mask = jnp.ones((1, len(ids)), jnp.float32)
    logits = qwen3_forward_logits(params, embeds, mask, cfg)[0]
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    nll = 0.0
    for i in range(len(ids) - 1):
        nll -= float(logp[i, ids[i + 1]])
    return nll, len(ids) - 1


class TestWindowNLL:
    def test_single_window_matches_direct(self, tiny):
        params, cfg = tiny
        rng = np.random.default_rng(0)
        ids = rng.integers(0, cfg.vocab_size, size=24)
        ref_nll, ref_cnt = _direct_nll(params, cfg, ids)
        nll, cnt = window_nll(params, cfg, ids, window=24, stride=24)
        assert cnt == ref_cnt
        np.testing.assert_allclose(nll, ref_nll, rtol=1e-4)

    def test_every_token_scored_once_with_overlap(self, tiny):
        params, cfg = tiny
        rng = np.random.default_rng(1)
        ids = rng.integers(0, cfg.vocab_size, size=50)
        nll, cnt = window_nll(params, cfg, ids, window=16, stride=8)
        # first window scores 15, each later stride scores 8, the ragged
        # tail scores the remainder — every token after position 0 exactly
        # once
        assert cnt == len(ids) - 1
        assert math.isfinite(nll) and nll > 0

    def test_ragged_tail_left_pad_consistent(self, tiny):
        """The padded ragged-tail window must score its tokens identically
        to an exact-length run (left-padding + mask must not leak)."""
        params, cfg = tiny
        rng = np.random.default_rng(2)
        ids = rng.integers(0, cfg.vocab_size, size=21)   # 16 + ragged 5
        nll_a, cnt_a = window_nll(params, cfg, ids, window=16, stride=8)
        # same stream evaluated with a window that divides it evenly
        nll_b, cnt_b = window_nll(params, cfg, ids, window=21, stride=21)
        assert cnt_a == cnt_b == 20
        # values differ (different context per token) but both are sane
        assert math.isfinite(nll_a) and math.isfinite(nll_b)

    def test_random_model_ppl_near_vocab(self, tiny):
        """A random-init model is near-uniform: ppl ~ vocab_size."""
        params, cfg = tiny
        rng = np.random.default_rng(3)
        ids = rng.integers(0, cfg.vocab_size, size=64)
        nll, cnt = window_nll(params, cfg, ids, window=32, stride=16)
        ppl = math.exp(nll / cnt)
        assert 0.3 * cfg.vocab_size < ppl < 3.0 * cfg.vocab_size

    def test_quantized_formats_close_to_dense(self, tiny):
        from fun_asr_gguf_tpu.models.qwen3 import (
            quantize_qwen3_params_int4, quantize_qwen3_params_int8)
        params, cfg = tiny
        rng = np.random.default_rng(4)
        ids = rng.integers(0, cfg.vocab_size, size=32)
        nll, cnt = window_nll(params, cfg, ids, window=32, stride=32)
        nll8, _ = window_nll(quantize_qwen3_params_int8(params), cfg, ids,
                             window=32, stride=32)
        nll4, _ = window_nll(quantize_qwen3_params_int4(params), cfg, ids,
                             window=32, stride=32)
        ppl, ppl8, ppl4 = (math.exp(x / cnt) for x in (nll, nll8, nll4))
        assert abs(ppl8 - ppl) / ppl < 0.05       # int8 ~ free
        assert abs(ppl4 - ppl) / ppl < 0.25       # int4 visibly lossier


class TestGGUFPath:
    def test_load_params_formats(self, tiny, tmp_path):
        from fun_asr_gguf_tpu.models.loaders import save_qwen3_to_gguf
        from fun_asr_gguf_tpu.models.qwen3 import Int4Weight, QuantTensor
        from fun_asr_gguf_tpu.tools.perplexity import _load_params
        params, cfg = tiny
        path = str(tmp_path / "d.gguf")
        save_qwen3_to_gguf(path, params, cfg)      # q8_0 tensors

        p_q8, cfg2, tok = None, None, None
        with pytest.raises(Exception):
            # no tokenizer.json and no embedded vocab: must raise, not
            # silently return a broken tokenizer
            _load_params(path, "bf16")
