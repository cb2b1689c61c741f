# coding: utf-8
"""Hotword subsystem tests.

Fixtures mirror the reference's inline self-tests
(``hot_phoneme.py:224-370``, ``rag_accu.py:123-183``) — the de-facto
behavioral spec of the hotword stack (SURVEY.md §4).
"""

import time

import numpy as np
import pytest

from fun_asr_gguf_tpu.hotword.algo_calc import (SIMILAR_PHONEMES,
                                                find_best_match,
                                                fuzzy_substring_distance,
                                                fuzzy_substring_score,
                                                get_phoneme_cost, lcs_length)
from fun_asr_gguf_tpu.hotword.algo_phoneme import (Phoneme, get_phoneme_info,
                                                   get_phoneme_seq,
                                                   normalize_text,
                                                   split_mixed_label)
from fun_asr_gguf_tpu.hotword.hot_phoneme import PhonemeCorrector
from fun_asr_gguf_tpu.hotword.hot_rectification import (
    RectificationRAG, extract_diff_fragments)
from fun_asr_gguf_tpu.hotword.hot_rule import RuleCorrector
from fun_asr_gguf_tpu.hotword.manager import (HotwordManager,
                                              get_hotword_manager,
                                              reset_hotword_manager)
from fun_asr_gguf_tpu.hotword.rag_fast import (FastRAG,
                                               batched_fuzzy_distance)

HOTWORDS = """
# 中文热词
撒贝宁
康辉
周涛
乐清
东方财富
科大讯飞

# 英文热词
CapsWriter
Python
Microsoft
iPhone
7-Zip

# 杂项
Claude
Bilibili
麦当劳
肯德基
VsCode
七浦路
句子
"""


class TestNormalize:
    def test_camel_and_digits(self):
        assert normalize_text("CapsWriter") == "caps writer"
        assert normalize_text("iPhone15Pro") == "i phone 15 pro"
        assert normalize_text("7-Zip") == "7 zip"

    def test_split_mixed_label(self):
        assert split_mixed_label("hello world") == ["hello", "world"]
        assert split_mixed_label("iphone15") == ["iphone", "15"]
        assert split_mixed_label("测试123") == ["测", "试", "123"]


class TestPhonemes:
    def test_zh_decomposition(self):
        seq = get_phoneme_seq("撒贝宁")
        vals = [p.value for p in seq]
        assert vals == ["s", "a", "1", "b", "ei", "4", "n", "ing", "2"]
        assert seq[0].is_word_start and seq[2].is_word_end

    def test_zero_initial(self):
        seq = get_phoneme_seq("安")
        assert seq[0].value == "an" and seq[0].is_word_start

    def test_en_token(self):
        seq = get_phoneme_seq("Hello World")
        assert [p.value for p in seq] == ["hello", "world"]
        assert all(p.lang == "en" for p in seq)

    def test_info_spans(self):
        seq = get_phoneme_info("测试ab")
        # spans cover the original char positions
        assert seq[0].char_start == 0 and seq[0].char_end == 1
        en = [p for p in seq if p.lang == "en"]
        assert [p.value for p in en] == ["a", "b"]
        assert en[0].char_start == 2

    def test_unknown_char_fallback(self):
        seq = get_phoneme_seq("龤")  # rare char unlikely in the table
        assert len(seq) >= 1


class TestCosts:
    def test_similar_phonemes(self):
        p1 = Phoneme("an", "zh")
        p2 = Phoneme("ang", "zh")
        assert get_phoneme_cost(p1, p2) == 0.5
        assert get_phoneme_cost(p1, Phoneme("an", "zh")) == 0.0
        assert get_phoneme_cost(p1, Phoneme("uo", "zh")) == 1.0
        assert get_phoneme_cost(p1, Phoneme("an", "en")) == 1.0

    def test_en_lcs_cost(self):
        c = get_phoneme_cost(Phoneme("python", "en"), Phoneme("pythn", "en"))
        assert abs(c - (1.0 - 5 / 6)) < 1e-9

    def test_lcs(self):
        assert lcs_length("abcde", "ace") == 3
        assert lcs_length("", "abc") == 0


class TestFuzzyDistance:
    def _info(self, text):
        return [p.info for p in get_phoneme_info(text)]

    def test_exact_substring_zero(self):
        d = fuzzy_substring_distance(self._info("贝宁"), self._info("我是撒贝宁啊"))
        assert d == 0.0

    def test_score_monotonic(self):
        good = fuzzy_substring_score(self._info("撒贝宁"), self._info("撒贝你"))
        bad = fuzzy_substring_score(self._info("撒贝宁"), self._info("天气真好"))
        assert good > bad

    def test_vectorized_matches_naive(self):
        """Vectorized scan DP must equal the naive O(nm) DP."""
        rng = np.random.default_rng(0)
        for _ in range(30):
            n, m = int(rng.integers(1, 8)), int(rng.integers(1, 15))
            sub = rng.integers(0, 4, n).tolist()
            main = rng.integers(0, 4, m).tolist()
            sub_i = [(str(v), "zh", True, True, False, 0, 0) for v in sub]
            main_i = [(str(v), "zh", True, True, False, 0, 0) for v in main]
            got = fuzzy_substring_distance(sub_i, main_i)
            assert got == _naive_distance(sub, main)

    def test_batched_matches_single(self):
        rng = np.random.default_rng(1)
        main = rng.integers(1, 5, 20).astype(np.int32)
        subs = [rng.integers(1, 5, int(rng.integers(1, 7))).astype(np.int32)
                for _ in range(9)]
        batch = batched_fuzzy_distance(main, subs)
        for s, d in zip(subs, batch):
            assert d == _naive_distance(s.tolist(), main.tolist())


def _naive_distance(sub, main):
    n, m = len(sub), len(main)
    dp = [[0.0] * (m + 1) for _ in range(n + 1)]
    for i in range(1, n + 1):
        dp[i][0] = float(i)
    for i in range(1, n + 1):
        for j in range(1, m + 1):
            cost = 0.0 if sub[i - 1] == main[j - 1] else 1.0
            dp[i][j] = min(dp[i - 1][j] + 1, dp[i][j - 1] + 1,
                           dp[i - 1][j - 1] + cost)
    return min(dp[n])


class TestFindBestMatch:
    def test_boundary_constrained(self):
        main = get_phoneme_info("我非常喜欢撒贝你说的新闻")
        sub = get_phoneme_info("撒贝宁")
        score, start, end = find_best_match(main, sub)
        assert score > 0.6
        assert main[start].is_word_start


class TestCorrector:
    @classmethod
    def setup_class(cls):
        cls.corrector = PhonemeCorrector(threshold=0.7)
        cls.corrector.update_hotwords(HOTWORDS)

    def test_zh_corrections(self):
        """The reference demo's headline cases (hot_phoneme.py:260-271)."""
        cases = {
            "我非常喜欢撒贝你说的新闻": "撒贝宁",
            "康灰是央视著名主持人": "康辉",
            "东方菜富股票上涨了": "东方财富",
            "科大迅飞的语音识别": "科大讯飞",
            "我想去吃买当劳和啃得鸡": "麦当劳",
        }
        for text, expected_hw in cases.items():
            result = self.corrector.correct(text)
            recalled = {hw for _, hw, _ in result.matchs} | \
                       {hw for _, hw, _ in result.similars}
            assert expected_hw in recalled, (text, result)

    def test_replacement_in_text(self):
        result = self.corrector.correct("我非常喜欢撒贝你说的新闻")
        assert "撒贝宁" in result.text

    def test_clean_text_untouched(self):
        result = self.corrector.correct("今天天气真不错")
        assert result.text == "今天天气真不错"
        assert not result.matchs

    def test_en_recall(self):
        res = self.corrector.correct("download pythn code")
        recalled = {hw for _, hw, _ in res.matchs} | \
                   {hw for _, hw, _ in res.similars}
        assert "Python" in recalled

    def test_engine_threshold_no_spurious_replace(self):
        # the engine runs with threshold=1.0 (model_manager.py:86): only
        # exact matches replace, so near-misses like 这是→测试 are hints only
        c = PhonemeCorrector(threshold=1.0, similar_threshold=0.6)
        c.update_hotwords("测试")
        res = c.correct("这是测试")
        assert res.text == "这是测试"
        assert any(hw == "测试" for _, hw, _ in res.similars)

    def test_warmup_call(self):
        # the engine warms up with this exact call (model_manager.py:92)
        self.corrector.correct("热个身")


class TestFastRAG:
    def test_index_and_search(self):
        rag = FastRAG(threshold=0.3)
        hws = {w: get_phoneme_info(w)
               for w in ["撒贝宁", "康辉", "东方财富", "科大讯飞"]}
        rag.add_hotwords(hws)
        results = rag.search(get_phoneme_info("撒贝你主持节目"), top_k=5)
        assert results and results[0][0] == "撒贝宁"

    def test_scale_perf(self):
        """10k-hotword index + search stays fast (rag_fast.py:320-366)."""
        rng = np.random.default_rng(0)
        chars = "的一是不了在人有我他这个们中来上大为和国地到以说时要就出会可也你对生能而子那得于着下自之年过发后作里如等"
        hws = {}
        while len(hws) < 2000:
            w = "".join(rng.choice(list(chars))
                        for _ in range(int(rng.integers(2, 5))))
            hws.setdefault(w, get_phoneme_seq(w))
        rag = FastRAG(threshold=0.6)
        t0 = time.perf_counter()
        rag.add_hotwords(hws)
        build = time.perf_counter() - t0
        query = get_phoneme_seq("".join(rng.choice(list(chars))
                                        for _ in range(50)))
        t0 = time.perf_counter()
        rag.search(query, top_k=10)
        search = time.perf_counter() - t0
        assert build < 10.0 and search < 2.0


class TestRuleCorrector:
    def test_rules(self):
        c = RuleCorrector()
        n = c.update_rules("毫安时  =  mAh\n赫兹   =   Hz\n# comment\n")
        assert n == 2
        assert c.substitute("电池5000毫安时") == "电池5000mAh"
        assert c.correct("50赫兹") == "50Hz"

    def test_invalid_regex_skipped(self):
        c = RuleCorrector()
        c.update_rules("([bad = X")
        assert c.substitute("([bad") == "([bad"


class TestRectification:
    def test_extract_diff(self):
        frags = extract_diff_fragments("原锯子", "原句子")
        assert frags  # the changed span is captured (expanded if short)
        assert any("锯" in f or "句" in f for f in frags)

    def test_search_and_prompt(self, tmp_path):
        p = tmp_path / "hot-rectify.txt"
        p.write_text("原锯子\n原句子\n---\ncaps riter\nCapsWriter\n",
                     encoding="utf-8")
        rag = RectificationRAG(str(p), threshold=0.5)
        assert len(rag.records) == 2
        results = rag.search("请把那个锯子发给我")
        assert any(r[1] == "原句子" for r in results)
        prompt = rag.format_prompt("请把那个锯子发给我")
        assert "=>" in prompt

    def test_autocreate(self, tmp_path):
        p = tmp_path / "new.txt"
        RectificationRAG(str(p))
        assert p.exists()


class TestManager:
    def test_load_and_reload(self, tmp_path):
        reset_hotword_manager()
        f = tmp_path / "hot.txt"
        f.write_text("撒贝宁\n", encoding="utf-8")
        mgr = HotwordManager(hotword_file=f, threshold=1.0,
                             similar_threshold=0.6)
        mgr.load()
        corrector = mgr.get_corrector()
        assert "撒贝宁" in corrector.hotwords
        # manual reload picks up edits
        f.write_text("撒贝宁\n康辉\n", encoding="utf-8")
        mgr._load_hot()
        assert "康辉" in corrector.hotwords

    def test_autocreate_missing(self, tmp_path):
        mgr = HotwordManager(hotword_file=tmp_path / "none.txt")
        mgr.load()
        assert (tmp_path / "none.txt").exists()

    def test_singleton(self, tmp_path):
        reset_hotword_manager()
        m1 = get_hotword_manager(hotword_file=tmp_path / "h.txt")
        m2 = get_hotword_manager()
        assert m1 is m2
        reset_hotword_manager()


class TestConcurrency:
    def test_correct_during_update(self):
        """Hammer correct() from threads while update_hotwords swaps the
        index — must never raise or return None (thread-safety contract,
        reference hot_phoneme.py:67,83,198)."""
        import threading
        corrector = PhonemeCorrector(threshold=1.0, similar_threshold=0.6)
        corrector.update_hotwords("撒贝宁\n康辉\n")
        errors = []
        stop = threading.Event()

        def reader():
            while not stop.is_set():
                try:
                    res = corrector.correct("撒贝你说的康灰")
                    assert res is not None
                except Exception as e:   # pragma: no cover
                    errors.append(e)
                    return

        def writer():
            sets = ["撒贝宁\n康辉\n", "东方财富\n", "撒贝宁\n科大讯飞\n周涛\n"]
            i = 0
            while not stop.is_set():
                corrector.update_hotwords(sets[i % len(sets)])
                i += 1

        threads = [threading.Thread(target=reader) for _ in range(3)]
        threads.append(threading.Thread(target=writer))
        for t in threads:
            t.start()
        time.sleep(1.5)
        stop.set()
        for t in threads:
            t.join(timeout=5)
        assert not errors, errors

    def test_polling_watcher_reloads(self, tmp_path, monkeypatch):
        """The mtime-polling watcher must hot-reload after the debounce."""
        from fun_asr_gguf_tpu.hotword import manager as mgr_mod
        monkeypatch.setattr(mgr_mod, "_DEBOUNCE_SECONDS", 0.3)
        monkeypatch.setattr(mgr_mod, "_POLL_SECONDS", 0.1)
        f = tmp_path / "hot.txt"
        f.write_text("撒贝宁\n", encoding="utf-8")
        mgr = mgr_mod.HotwordManager(hotword_file=f, threshold=1.0,
                                     similar_threshold=0.6)
        mgr.load()
        mgr.start_file_watcher()
        try:
            assert "康辉" not in mgr.get_corrector().hotwords
            time.sleep(0.2)
            f.write_text("撒贝宁\n康辉\n", encoding="utf-8")
            deadline = time.time() + 5.0
            while time.time() < deadline:
                if "康辉" in mgr.get_corrector().hotwords:
                    break
                time.sleep(0.1)
            assert "康辉" in mgr.get_corrector().hotwords
        finally:
            mgr.stop_file_watcher()


class TestHotwordScale:
    def test_10k_hotword_index_and_search(self):
        """Mirror of the reference's 10,000-word self-benchmark
        (``rag_fast.py:320-366``): index build and per-query search must
        stay interactive at production hotword-list scale."""
        import random
        import time
        from fun_asr_gguf_tpu.hotword.algo_phoneme import get_phoneme_seq
        from fun_asr_gguf_tpu.hotword.rag_fast import FastRAG
        rng = random.Random(0)
        # draw from the embedded pinyin table's coverage
        chars = "的一是在不了有和人这中大为上个国我以要他时来用们生到作地于出就分对成会可主发年动同工也能下过子说产种面而方后多定行学法所民得经十三之进着等部度家电力里如水化高自二理起小物现实加量都两体制机当使点从业本去把性好应开它合还因由其些然前外天政四日那社义事平形相全表间样与关各重新线内数正心反你明看原又么利比或但质气第向道命此变条只没结解问意建月公无系军很情者最立代想已通并提直题党程展五果料象员革位入常文总次品式活设及管特件长求老头基资边流路级少图山统接知较将组见计别她手角期根论运农指几九区强放决西被干做必战先回则任取据处队南给色光门即保治北造百规热领七海口东导器压志世金增争济阶油思术极交受联什认六共权收证改清己美再采转更单风切打白教速花带安场身车例真务具万每目至达走积示议声报斗完类八离华名确才科张信马节话米整空元况今集温传土许步群广石记需段研界拉林律叫且究观越织装影算低持音众书布复容儿须际商非验连断深难近矿千周委素技备半办青省列习响约支般史感劳便团往酸历市克何除消构府称太准精值号率族维划选标写存候毛亲快效斯院查江型眼王按格养易置派层片始却专状育厂京识适属圆包火住调满县局照参红细引听该铁价严龙飞"
        words = ["".join(rng.choices(chars, k=rng.randint(2, 4)))
                 for _ in range(10_000)]
        hw_map = {}
        t0 = time.perf_counter()
        for w in words:
            phons = get_phoneme_seq(w)
            if phons:
                hw_map[w] = phons
        rag = FastRAG()
        rag.add_hotwords(hw_map)
        build_s = time.perf_counter() - t0
        assert rag.hotword_count > 9000
        target = words[137]
        query = get_phoneme_seq(target + "".join(rng.choices(chars, k=6)))
        t0 = time.perf_counter()
        for _ in range(5):
            results = rag.search(query)
        search_s = (time.perf_counter() - t0) / 5
        assert results, "no candidates returned at 10k scale"
        # generous CI bounds; the reference budget is ms-scale per query
        assert build_s < 60.0, f"index build too slow: {build_s:.1f}s"
        assert search_s < 0.5, f"search too slow: {search_s*1000:.0f}ms"
