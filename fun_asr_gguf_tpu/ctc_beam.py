# coding: utf-8
"""CTC prefix beam search with hotword contextual biasing.

Beyond-reference capability (the reference decodes CTC greedy-only,
``nano_ctc.py:38-116``): a prefix beam search in the FlexCTC style —
device computes per-frame top-k log-probs (``ctc_topk_forward``), the
host runs the prefix search with shallow-fusion hotword bonuses from a
character trie, so recognition of in-vocabulary hotwords improves
*before* the LLM pass. Enabled via ``ASREngineConfig.ctc_beam_size > 1``;
the greedy path stays the timestamp source (frame indices are exact
there).

Scores are log-domain; each beam prefix tracks (p_blank, p_nonblank)
per the standard CTC prefix-search recurrence.
"""

import math
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

NEG_INF = float("-inf")


def _logsumexp2(a: float, b: float) -> float:
    if a == NEG_INF:
        return b
    if b == NEG_INF:
        return a
    m = a if a > b else b
    return m + math.log1p(math.exp(-abs(a - b)))


# ---------------------------------------------------------------------------
# Hotword trie (character level, built from the decoded token strings)
# ---------------------------------------------------------------------------

class _TrieNode:
    __slots__ = ("children", "fail", "depth", "terminal")

    def __init__(self, depth: int = 0):
        self.children: Dict[str, "_TrieNode"] = {}
        self.fail: Optional["_TrieNode"] = None
        self.depth = depth
        self.terminal = False


class HotwordTrie:
    """Aho–Corasick trie for shallow-fusion bonuses with fail retraction.

    ``step(state, ch)`` → (new_state, delta): per matched char a positive
    bonus accrues *provisionally*; when a partial match fails, the walk
    follows proper failure links (longest proper suffix that is still a
    hotword prefix), retracting exactly the bonus of the dropped depth —
    so "北京大" under hotword "北京大学" gives back +3·bonus on mismatch,
    while self-overlapping prefixes (e.g. "aab" after input "aaab") keep
    their surviving suffix match. Completing a word locks its bonus in.
    State = (node, pending) with pending = retractable bonus since the
    last completed word.
    """

    def __init__(self, words: Sequence[str], char_bonus: float = 2.0):
        self.root = _TrieNode()
        self.char_bonus = float(char_bonus)
        for w in words:
            node = self.root
            for ch in w:
                nxt = node.children.get(ch)
                if nxt is None:
                    nxt = _TrieNode(node.depth + 1)
                    node.children[ch] = nxt
                node = nxt
            node.terminal = True
        # BFS failure links
        from collections import deque
        q = deque()
        for child in self.root.children.values():
            child.fail = self.root
            q.append(child)
        while q:
            node = q.popleft()
            for ch, child in node.children.items():
                f = node.fail
                while f is not None and ch not in f.children:
                    f = f.fail
                child.fail = f.children[ch] if f and ch in f.children \
                    else self.root
                q.append(child)

    def _goto(self, node: "_TrieNode", ch: str) -> "_TrieNode":
        while node is not None and ch not in node.children:
            node = node.fail
        return node.children[ch] if node is not None else self.root

    def step(self, state, ch: str):
        node, pending = state if state is not None else (self.root, 0.0)
        nxt = self._goto(node, ch)
        advanced = nxt.depth == node.depth + 1      # direct extension
        if nxt.depth > 0:
            if advanced:
                delta = self.char_bonus
                pending2 = pending + self.char_bonus
            else:
                # fell back to a shorter live prefix: keep its share,
                # retract the rest, then credit the new char
                kept = (nxt.depth - 1) * self.char_bonus
                kept = min(kept, pending)
                delta = (kept - pending) + self.char_bonus
                pending2 = kept + self.char_bonus
            if nxt.terminal:
                pending2 = 0.0              # completed word: lock bonus in
            return (nxt, pending2), delta
        # no live prefix at all: retract everything provisional
        return (self.root, 0.0), -pending


# ---------------------------------------------------------------------------
# Prefix beam search
# ---------------------------------------------------------------------------

class _Beam:
    __slots__ = ("p_b", "p_nb", "bonus", "trie_state")

    def __init__(self, p_b=NEG_INF, p_nb=NEG_INF, bonus=0.0,
                 trie_state=None):
        self.p_b = p_b              # log P(prefix, ending in blank)
        self.p_nb = p_nb            # log P(prefix, ending in non-blank)
        self.bonus = bonus          # accumulated hotword shaping score
        self.trie_state = trie_state

    @property
    def total(self):
        return _logsumexp2(self.p_b, self.p_nb)

    @property
    def score(self):
        return self.total + self.bonus


def prefix_beam_search(top_vals: np.ndarray, top_ids: np.ndarray,
                       blank_lp: np.ndarray, blank_id: int,
                       id2token: Dict[int, str],
                       beam_size: int = 8,
                       trie: Optional[HotwordTrie] = None
                       ) -> Tuple[str, List[int]]:
    """Run CTC prefix beam search over per-frame top-k candidates.

    top_vals/top_ids: [T, K] log-probs and token ids; blank_lp: [T].
    Returns (text, token_ids) of the best prefix. The hotword bonus
    shapes beam ranking only — the returned ids are real vocab tokens.
    """
    T, K = top_vals.shape
    beams: Dict[Tuple[int, ...], _Beam] = {
        (): _Beam(p_b=0.0, bonus=0.0, trie_state=None)}

    for t in range(T):
        b_lp = float(blank_lp[t])
        new: Dict[Tuple[int, ...], _Beam] = {}

        # bonus/trie_state are functions of the prefix alone, so they are
        # installed once, when the prefix's beam entry is first created
        def get(prefix, parent, appended_token=None):
            beam = new.get(prefix)
            if beam is None:
                beam = _Beam()
                if appended_token is None:
                    beam.bonus = parent.bonus
                    beam.trie_state = parent.trie_state
                else:
                    beam.bonus, beam.trie_state = _advance(
                        parent, appended_token, trie)
                new[prefix] = beam
            return beam

        for prefix, beam in beams.items():
            total = beam.total
            last = prefix[-1] if prefix else None

            # 1. emit blank → same prefix
            nb = get(prefix, beam)
            nb.p_b = _logsumexp2(nb.p_b, b_lp + total)

            for j in range(K):
                c = int(top_ids[t, j])
                lp = float(top_vals[t, j])
                if c == blank_id:
                    continue
                if c == last:
                    # repeat char: same prefix via p_nb…
                    nb = get(prefix, beam)
                    nb.p_nb = _logsumexp2(nb.p_nb, lp + beam.p_nb)
                    # …or a new occurrence, only after a blank
                    eb = get(prefix + (c,), beam, id2token.get(c, ""))
                    eb.p_nb = _logsumexp2(eb.p_nb, lp + beam.p_b)
                else:
                    eb = get(prefix + (c,), beam, id2token.get(c, ""))
                    eb.p_nb = _logsumexp2(eb.p_nb, lp + total)

        beams = dict(sorted(new.items(), key=lambda kv: -kv[1].score)
                     [:beam_size])

    best = max(beams.items(), key=lambda kv: kv[1].score)
    ids = list(best[0])
    text = "".join(id2token.get(i, "") for i in ids)
    return text, ids


def _advance(beam: _Beam, token_text: str, trie: Optional[HotwordTrie]
             ) -> Tuple[float, Optional[Dict]]:
    """Extend the beam's trie state over the (possibly multi-char) token."""
    if trie is None:
        return beam.bonus, None
    bonus = beam.bonus
    state = beam.trie_state
    for ch in token_text:
        state, add = trie.step(state, ch)
        bonus += add
    return bonus, state


def beam_decode(topk, id2token: Dict[int, str], beam_size: int = 8,
                hotwords: Sequence[str] = (), char_bonus: float = 2.0,
                blank_id: Optional[int] = None) -> str:
    """Convenience wrapper: device top-k tuple → best text.

    topk = (vals [B,T,K], ids [B,T,K], blank_lp [B,T], ...) for B == 1.
    ``blank_id`` should be the model's vocab_size-1 (the same constant the
    device program used); falling back to max(id2token) is only safe when
    tokens.txt is complete.
    """
    vals, ids, blank = (np.asarray(x) for x in topk[:3])
    if blank_id is None:
        blank_id = max(id2token)      # blank = last vocab id
    trie = HotwordTrie(hotwords, char_bonus) if hotwords else None
    text, _ = prefix_beam_search(vals[0], ids[0], blank[0], blank_id,
                                 id2token, beam_size=beam_size, trie=trie)
    return text
