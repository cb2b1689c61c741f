# coding: utf-8
"""CTC prefix beam search tests: recurrence correctness, hotword biasing,
device top-k integration."""

import math

import numpy as np
import pytest

from fun_asr_gguf_tpu.ctc_beam import (HotwordTrie, beam_decode,
                                       prefix_beam_search)


def _topk_from_dense(probs, k):
    """probs [T, V] → (log top-k vals, ids, blank log-prob), blank = V-1."""
    lp = np.log(np.maximum(probs, 1e-30))
    ids = np.argsort(-lp, axis=1)[:, :k]
    vals = np.take_along_axis(lp, ids, axis=1)
    return vals.astype(np.float32), ids.astype(np.int32), \
        lp[:, -1].astype(np.float32)


class TestPrefixBeamSearch:
    def test_beats_greedy_on_classic_case(self):
        """Greedy picks blank-blank → ""; summing paths gives "a"."""
        V = 3                      # {a, b, blank}
        probs = np.array([[0.3, 0.3, 0.4],
                          [0.3, 0.3, 0.4]])
        vals, ids, blank = _topk_from_dense(probs, V)
        id2tok = {0: "a", 1: "b", 2: ""}
        # greedy = argmax per frame = blank, blank → ""
        assert np.argmax(probs, 1).tolist() == [2, 2]
        text, out_ids = prefix_beam_search(vals, ids, blank, blank_id=2,
                                           id2token=id2tok, beam_size=8)
        # P("") = .16 < P("a") = .3*.4 + .4*.3 + .3*.3 = .33
        assert text == "a" and out_ids == [0]

    def test_repeat_collapse_vs_blank_separated(self):
        """a,a (no blank) collapses; a,blank,a stays 'aa'."""
        V = 2                      # {a, blank}
        probs = np.array([[0.9, 0.1],
                          [0.1, 0.9],
                          [0.9, 0.1]])
        vals, ids, blank = _topk_from_dense(probs, V)
        id2tok = {0: "a", 1: ""}
        text, out_ids = prefix_beam_search(vals, ids, blank, blank_id=1,
                                           id2token=id2tok, beam_size=8)
        assert text == "aa" and out_ids == [0, 0]

    def test_matches_greedy_on_peaked_distribution(self):
        rng = np.random.default_rng(0)
        V, T = 6, 12
        peaks = rng.integers(0, V, T)
        probs = np.full((T, V), 0.01)
        probs[np.arange(T), peaks] = 1.0
        probs /= probs.sum(1, keepdims=True)
        vals, ids, blank = _topk_from_dense(probs, V)
        id2tok = {i: chr(ord("a") + i) for i in range(V - 1)}
        id2tok[V - 1] = ""
        text, _ = prefix_beam_search(vals, ids, blank, blank_id=V - 1,
                                     id2token=id2tok, beam_size=4)
        # greedy collapse reference
        greedy = []
        prev = None
        for p in peaks:
            if p != prev and p != V - 1:
                greedy.append(chr(ord("a") + p))
            prev = p
        assert text == "".join(greedy)

    def test_hotword_bonus_steers_close_call(self):
        """Two near-equal hypotheses; the trie bonus flips to the hotword."""
        V = 3                      # {甲, 乙, blank}
        probs = np.array([[0.48, 0.50, 0.02],
                          [0.02, 0.02, 0.96]])
        vals, ids, blank = _topk_from_dense(probs, V)
        id2tok = {0: "甲", 1: "乙", 2: ""}
        text_plain, _ = prefix_beam_search(vals, ids, blank, 2, id2tok,
                                           beam_size=4)
        assert text_plain == "乙"
        trie = HotwordTrie(["甲"], char_bonus=2.0)
        text_hw, out_ids = prefix_beam_search(vals, ids, blank, 2, id2tok,
                                              beam_size=4, trie=trie)
        assert text_hw == "甲" and out_ids == [0]

    def test_multichar_token_trie_advance(self):
        V = 3
        probs = np.array([[0.49, 0.50, 0.01]])
        vals, ids, blank = _topk_from_dense(probs, V)
        id2tok = {0: "睡前", 1: "水钱", 2: ""}
        trie = HotwordTrie(["睡前消息"], char_bonus=1.5)
        text, _ = prefix_beam_search(vals, ids, blank, 2, id2tok,
                                     beam_size=4, trie=trie)
        assert text == "睡前"    # two matched chars overcome the prob gap


class TestHotwordTrie:
    def test_match_fail_retracts_provisional_bonus(self):
        """Partial-match bonus is given back when the match falls off."""
        trie = HotwordTrie(["abc"], char_bonus=1.0)
        total = 0.0
        s = None
        for ch in "abz":
            s, d = trie.step(s, ch)
            total += d
        # a(+1) b(+1) then z retracts both → net 0
        assert total == 0.0
        # restart works after the failure
        s, d = trie.step(s, "a"); assert d == 1.0

    def test_completed_word_bonus_locked_in(self):
        trie = HotwordTrie(["ab"], char_bonus=1.0)
        total = 0.0
        s = None
        for ch in "abz":
            s, d = trie.step(s, ch)
            total += d
        # completing "ab" locks +2; the 'z' retracts nothing
        assert total == 2.0

    def test_fall_back_to_root_retry(self):
        trie = HotwordTrie(["ab"], char_bonus=1.0)
        s, d = trie.step(None, "a"); assert d == 1.0
        # 'a' again: fails under node 'a' (retract -1), restarts (+1)
        s, d = trie.step(s, "a"); assert d == 0.0
        s, d = trie.step(s, "b"); assert d == 1.0


class TestDeviceTopK:
    def test_ctc_topk_forward_agrees_with_dense(self):
        import jax
        import jax.numpy as jnp
        from fun_asr_gguf_tpu.models.adaptor import (ctc_logits_forward,
                                                     ctc_topk_forward,
                                                     init_ctc_head_params)
        from fun_asr_gguf_tpu.models.config import CTCHeadConfig
        cfg = CTCHeadConfig.tiny(d=16, vocab_size=33)
        params = init_ctc_head_params(jax.random.PRNGKey(0), cfg)
        enc = jnp.asarray(
            np.random.default_rng(1).normal(size=(1, 5, 16)), jnp.float32)
        vals, ids, blank, argmax = ctc_topk_forward(params, enc, cfg, k=4)
        dense = np.asarray(jax.nn.log_softmax(
            ctc_logits_forward(params, enc, cfg).astype(jnp.float32), -1))
        np.testing.assert_allclose(np.asarray(blank), dense[..., -1],
                                   rtol=1e-5)
        np.testing.assert_array_equal(np.asarray(argmax),
                                      np.argmax(dense, axis=-1))
        for t in range(5):
            top = np.sort(dense[0, t])[-4:][::-1]
            np.testing.assert_allclose(np.sort(np.asarray(vals[0, t]))[::-1],
                                       top, rtol=1e-5)

    def test_beam_decode_wrapper(self):
        import jax
        import jax.numpy as jnp
        from fun_asr_gguf_tpu.models.adaptor import (ctc_topk_forward,
                                                     init_ctc_head_params)
        from fun_asr_gguf_tpu.models.config import CTCHeadConfig
        cfg = CTCHeadConfig.tiny(d=16, vocab_size=33)
        params = init_ctc_head_params(jax.random.PRNGKey(0), cfg)
        enc = jnp.asarray(
            np.random.default_rng(2).normal(size=(1, 6, 16)), jnp.float32)
        topk = ctc_topk_forward(params, enc, cfg, k=4)
        id2tok = {i: chr(ord("一") + i) for i in range(32)}
        id2tok[32] = ""
        text = beam_decode(topk, id2tok, beam_size=4, hotwords=["一二"])
        assert isinstance(text, str)
