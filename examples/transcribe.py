"""End-to-end demo + benchmark driver.

The equivalent of the reference's ``04-Inference.py``: initialize the
engine, transcribe a file (short or long path), report per-stage timings,
RTF and peak host RSS (sampled by a background monitor thread).

Usage:
    python examples/transcribe.py --checkpoint model_tpu audio.wav \
        [--language 中文] [--context "..."] [--srt] [--duration 60]
"""

import argparse
import os
import sys
import threading
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


class MemoryMonitor:
    """Peak-RSS sampler (the reference uses psutil, ``04-Inference.py:63-91``;
    this reads /proc/self/status to stay dependency-free)."""

    def __init__(self, interval: float = 0.2):
        self.interval = interval
        self.peak_mb = 0.0
        self._stop = threading.Event()
        self._thread = threading.Thread(target=self._run, daemon=True)

    @staticmethod
    def _rss_mb() -> float:
        try:
            with open("/proc/self/status") as f:
                for line in f:
                    if line.startswith("VmRSS:"):
                        return float(line.split()[1]) / 1024.0
        except OSError:
            pass
        return 0.0

    def _run(self):
        while not self._stop.wait(self.interval):
            self.peak_mb = max(self.peak_mb, self._rss_mb())

    def __enter__(self):
        self._thread.start()
        return self

    def __exit__(self, *exc):
        self._stop.set()
        self._thread.join(timeout=1.0)


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("audio")
    ap.add_argument("--checkpoint", required=True)
    ap.add_argument("--language", default=None)
    ap.add_argument("--context", default=None)
    ap.add_argument("--srt", action="store_true")
    ap.add_argument("--segment-size", type=float, default=60.0)
    ap.add_argument("--overlap", type=float, default=2.0)
    ap.add_argument("--start-second", type=float, default=None)
    ap.add_argument("--duration", type=float, default=None)
    ap.add_argument("--temperature", type=float, default=0.4)
    ap.add_argument("--parallel-segments", action="store_true",
                    help="batch long-audio segments through one "
                         "device program (TPU-native extension)")
    ap.add_argument("--llm-weight-format", default="auto",
                    choices=["auto", "bf16", "int8", "int4", "q8_0"],
                    help="decoder weight format (int4: experimental "
                         "w4a16, half the HBM bytes of int8)")
    ap.add_argument("--tp", type=int, default=1,
                    help="tensor-parallel ways over the first N chips")
    ap.add_argument("--kv-cache-dtype", default="bf16",
                    choices=["bf16", "int8"])
    ap.add_argument("--quiet", action="store_true")
    args = ap.parse_args()

    from fun_asr_gguf_tpu import create_asr_engine

    with MemoryMonitor() as mem:
        t0 = time.perf_counter()
        engine = create_asr_engine(checkpoint_dir=args.checkpoint,
                                   verbose=not args.quiet,
                                   llm_weight_format=args.llm_weight_format,
                                   kv_cache_dtype=args.kv_cache_dtype,
                                   mesh_shape=({"dp": 1, "tp": args.tp}
                                               if args.tp > 1 else None))
        t_init = time.perf_counter() - t0

        result = engine.transcribe(
            args.audio, language=args.language, context=args.context,
            verbose=not args.quiet, segment_size=args.segment_size,
            overlap=args.overlap, start_second=args.start_second,
            duration=args.duration, srt=args.srt,
            temperature=args.temperature,
            parallel_segments=args.parallel_segments)

    audio_s = max(len(result.segments) and
                  result.segments[-1]["start"] or 0.0, 0.001)
    # prefer the precise duration when timestamps exist
    rtf = result.timings.total / audio_s if audio_s > 0.01 else float("nan")

    print("\n==== summary ====")
    print(f"init:          {t_init:6.2f}s")
    print(f"processing:    {result.timings.total:6.2f}s")
    if rtf == rtf:
        print(f"RTF:           {rtf:8.4f}")
    print(f"peak RSS:      {mem.peak_mb:6.0f} MB")
    print(f"text ({len(result.text)} chars): {result.text[:120]}"
          f"{'...' if len(result.text) > 120 else ''}")
    engine.cleanup()


if __name__ == "__main__":
    main()
