# coding: utf-8
"""Streaming transcription demo: feed a file in chunks, print partials.

The reference decodes whole segments only — its first text arrives after
the full segment. This demo shows text flowing while "audio" is still
arriving: a 60 s file fed in 1 s chunks, the provisional transcript
reprinted per tick, the exact batch-path result at the end.

Usage:
    python examples/streaming_demo.py --checkpoint <dir> [--audio f.mp3]
                                      [--chunk-seconds 1.0]

Without --audio a synthetic 60 s waveform is used (random checkpoints
transcribe it to arbitrary-but-deterministic text; with real weights
point --audio at real speech).
"""

import argparse
import sys
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--checkpoint", required=True)
    ap.add_argument("--audio", default=None)
    ap.add_argument("--chunk-seconds", type=float, default=1.0)
    ap.add_argument("--seconds", type=float, default=60.0,
                    help="synthetic audio length when --audio is absent")
    ap.add_argument("--partial-tokens", type=int, default=48)
    args = ap.parse_args()

    from fun_asr_gguf_tpu import create_asr_engine
    engine = create_asr_engine(args.checkpoint, verbose=False)
    sr = engine.sample_rate

    if args.audio:
        from fun_asr_gguf_tpu.audio import load_audio
        audio = load_audio(args.audio, sr)
    else:
        rng = np.random.default_rng(0)
        audio = (rng.normal(size=int(sr * args.seconds)) * 0.05
                 ).astype(np.float32)

    sess = engine.create_streaming_session(
        partial_tokens=args.partial_tokens)
    step = int(sr * args.chunk_seconds)
    t_start = time.perf_counter()
    for off in range(0, len(audio), step):
        part = sess.feed(audio[off:off + step])
        line = (f"[{part.seconds:5.1f}s fed | tick {part.latency_ms:6.1f}ms"
                f" | ctc {len(part.ctc_text):4d} ch] {part.text[-60:]}")
        print(line, file=sys.stderr, flush=True)
    final = sess.finish()
    wall = time.perf_counter() - t_start
    print(f"\nfinal ({wall:.2f}s wall, first text "
          f"{sess.stats.first_text_ms or float('nan'):.0f} ms after "
          f"first chunk):\n{final.text}")


if __name__ == "__main__":
    main()
