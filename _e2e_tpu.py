"""Full-size engine E2E on the real chip: 300 s long-audio path."""
import sys, time, numpy as np
from fun_asr_gguf_tpu.models.config import HybridConfig
from fun_asr_gguf_tpu.models.loaders import create_random_checkpoint
from fun_asr_gguf_tpu.audio import write_wav
import base64, os, tempfile

tmp = tempfile.mkdtemp()
ckpt = os.path.join(tmp, "model")
print("creating full-size random checkpoint...", file=sys.stderr)
cfg = create_random_checkpoint(ckpt, HybridConfig(), seed=0)   # FULL SIZE
lines = []
for i in range(200):
    ch = chr(ord("一") + i)
    lines.append(f"{base64.b64encode(ch.encode()).decode()} {i}")
# pad vocab mapping to full size sparsely (loader needs tokens file; engine
# maps ids->tokens lazily)
lines.append(f"{base64.b64encode('<blk>'.encode()).decode()} {cfg.ctc.vocab_size-1}")
open(os.path.join(ckpt, "tokens.txt"), "w").write("\n".join(lines) + "\n")
open(os.path.join(ckpt, "hot.txt"), "w").write("睡前消息\n督工\n")

sr = 16000
rng = np.random.default_rng(0)
wav = os.path.join(tmp, "long.wav")
write_wav(wav, rng.normal(size=sr * 300) * 0.05, sr)   # 5 minutes

from fun_asr_gguf_tpu import create_asr_engine
t0 = time.perf_counter()
eng = create_asr_engine(checkpoint_dir=ckpt, verbose=False, n_predict=64,
                        ctc_beam_size=4)
print(f"init {time.perf_counter()-t0:.0f}s", file=sys.stderr)
t0 = time.perf_counter()
res = eng.transcribe(wav, verbose=False, temperature=0.0, srt=True)
wall = time.perf_counter() - t0
print(f"E2E 300s audio: wall={wall:.1f}s rtf={wall/300:.4f} "
      f"segments={len(res.segments)} text_len={len(res.text)} "
      f"audio_seconds={res.audio_seconds}")
print(f"timings: encode={res.timings.encode:.2f} ctc={res.timings.ctc:.2f} "
      f"inject={res.timings.inject:.2f} gen={res.timings.llm_generate:.2f} "
      f"align={res.timings.align:.3f}")
srt = os.path.splitext(wav)[0] + ".srt"
print("srt exists:", os.path.exists(srt))
eng.cleanup()
