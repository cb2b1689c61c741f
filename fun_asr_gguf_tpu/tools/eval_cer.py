# coding: utf-8
"""CER/WER evaluation: measure transcript parity against a reference.

BASELINE.json's acceptance bar is "CER parity vs the ONNX+llama.cpp
reference"; this tool is the measurement harness. It ships the reference
run's golden transcript for the bundled ``input.mp3`` (published at
reference ``README.md:248-257``) so a checkpointed engine can be scored
with one command:

    python -m fun_asr_gguf_tpu.tools.eval_cer --checkpoint model_dir \
        --audio input.mp3 --golden
    python -m fun_asr_gguf_tpu.tools.eval_cer --ref ref.txt --hyp hyp.txt
"""

import argparse
import re
import sys
from typing import List, Tuple

# Reference transcript of the repo's 60 s input.mp3, as produced by the
# reference pipeline (q8_0 decoder, greedy path) — reference README.md:248-257.
GOLDEN_INPUT_MP3 = (
    "大家好，2026年1月11日星期日，欢迎收看1004期《睡前消息》。请静静介绍话题。"
    "去年10月19日967期节目说到委内瑞拉问题，我们回顾一下你当时的评论。"
    "无论是从集结的兵力来看，还是从动机来看，特朗普政府并不打算对委内瑞拉政权发动全面的进攻，"
    "最多是发动象征性的轰炸进行政治投机。在诺贝尔和平奖发给了委内瑞拉反对派之后，"
    "美国军队进攻的概率进一步降低。现在美国突袭委内瑞拉，抓走了总统马杜罗，"
    "督工你怎么看待两个月之前的判断？当初的判断不变，美国对于委内瑞拉的突袭性质依然是政治投机，"
    "不能算是地面战争。入侵的美国军队总数是一两百，站在委内瑞拉领土上的时间不超过一个小时，"
    "算是地面战争或者全面进攻，实在有点勉强。当然，美国东用总力量并不小，"
    "150架先进飞机加上经年累月部署的情报网络，这放在东亚或者欧洲也不是一只很小的力量。"
    "用到美国的西半球主场压倒委内瑞拉的军队那是必然的。"
)

_PUNCT = re.compile(r"[，。、！？：；“”‘’《》（）,.!?:;\"'()\[\]【】\s]+")


def normalize(text: str, strip_punct: bool = True) -> str:
    """Collapse whitespace; optionally drop punctuation (the usual Chinese
    ASR CER convention scores characters only)."""
    if strip_punct:
        return _PUNCT.sub("", text)
    return re.sub(r"\s+", " ", text.strip())


def edit_ops(ref: List[str], hyp: List[str]) -> Tuple[int, int, int]:
    """Levenshtein alignment → (substitutions, deletions, insertions)."""
    m, n = len(ref), len(hyp)
    # dp rows: cost; parallel op-count tracking via backtrace-free rolling
    # count triples (sub, del, ins)
    prev = [(0, (0, 0, 0))] * (n + 1)
    for j in range(1, n + 1):
        prev[j] = (j, (0, 0, j))
    for i in range(1, m + 1):
        cur = [(i, (0, i, 0))] + [None] * n
        for j in range(1, n + 1):
            if ref[i - 1] == hyp[j - 1]:
                cand = [(prev[j - 1][0], prev[j - 1][1])]
            else:
                s, d, ins = prev[j - 1][1]
                cand = [(prev[j - 1][0] + 1, (s + 1, d, ins))]
            s, d, ins = prev[j][1]
            cand.append((prev[j][0] + 1, (s, d + 1, ins)))
            s, d, ins = cur[j - 1][1]
            cand.append((cur[j - 1][0] + 1, (s, d, ins + 1)))
            cur[j] = min(cand, key=lambda t: t[0])
        prev = cur
    return prev[n][1]


def cer(ref_text: str, hyp_text: str, strip_punct: bool = True) -> dict:
    """Character error rate + op breakdown."""
    ref = list(normalize(ref_text, strip_punct))
    hyp = list(normalize(hyp_text, strip_punct))
    if not ref:
        raise ValueError("empty reference after normalization")
    s, d, i = edit_ops(ref, hyp)
    return {
        "cer": (s + d + i) / len(ref),
        "substitutions": s,
        "deletions": d,
        "insertions": i,
        "ref_chars": len(ref),
        "hyp_chars": len(hyp),
    }


def wer(ref_text: str, hyp_text: str) -> dict:
    """Word error rate (whitespace tokens — for English/latin output)."""
    ref = normalize(ref_text, strip_punct=False).split()
    hyp = normalize(hyp_text, strip_punct=False).split()
    if not ref:
        raise ValueError("empty reference")
    s, d, i = edit_ops(ref, hyp)
    return {"wer": (s + d + i) / len(ref), "substitutions": s,
            "deletions": d, "insertions": i, "ref_words": len(ref)}


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--ref", help="reference transcript file")
    ap.add_argument("--hyp", help="hypothesis transcript file")
    ap.add_argument("--golden", action="store_true",
                    help="score against the bundled input.mp3 golden text")
    ap.add_argument("--checkpoint", help="transcribe --audio with this "
                                         "engine checkpoint first")
    ap.add_argument("--audio", help="audio file to transcribe")
    ap.add_argument("--keep-punct", action="store_true")
    args = ap.parse_args(argv)

    if args.golden:
        ref_text = GOLDEN_INPUT_MP3
    elif args.ref:
        ref_text = open(args.ref, encoding="utf-8").read()
    else:
        print("need --ref or --golden", file=sys.stderr)
        return 2

    if args.hyp:
        hyp_text = open(args.hyp, encoding="utf-8").read()
    elif args.checkpoint and args.audio:
        from .. import create_asr_engine
        eng = create_asr_engine(checkpoint_dir=args.checkpoint,
                                verbose=False)
        try:
            hyp_text = eng.transcribe(args.audio, verbose=False,
                                      temperature=0.0).text
        finally:
            eng.cleanup()
    else:
        print("need --hyp, or --checkpoint with --audio", file=sys.stderr)
        return 2

    result = cer(ref_text, hyp_text, strip_punct=not args.keep_punct)
    print(f"CER: {result['cer']:.4f}  "
          f"(S={result['substitutions']} D={result['deletions']} "
          f"I={result['insertions']} / {result['ref_chars']} ref chars)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
