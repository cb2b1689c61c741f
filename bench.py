"""Benchmark driver: full-size pipeline on one real TPU chip.

Measures the reference's headline workload (BASELINE.md): 60 s audio
through frontend + SANM encoder + adaptor + CTC, a 204-token embedding-
injection prefill, and 253 generated tokens — reference GPU numbers are
1.89 s E2E / 219 tok/s generation on an RTX 5050 (README.md:200,268).

Timing methodology, tuned for the remote-tunnel runtime (per-fetch
latency, memoized identical dispatches, and XLA compile cost that explodes
when big subprograms are fused under one outer jit):

* every stage is its own jitted program (same structure the engine uses);
* N executions are chained through a device-side scalar feedback term, so
  dispatches overlap execution and ONE final fetch drains the chain;
* per-call cost = (t(chain N2) − t(chain N1)) / (N2 − N1) — fetch latency
  and fixed overhead cancel;
* generation is measured as chunked decode (host loop over a small
  compiled chunk program), exactly like the engine's decode path.

Prints ONE JSON line:
  {"metric": "rtf_60s_e2e", "value": <rtf>, "unit": "ratio",
   "vs_baseline": <ref_time / our_time>, ...sub-metrics...}
"""

import json
import os
import signal
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

REF_E2E_S = 1.89          # BASELINE.md: reference E2E on 60 s audio
REF_GEN_TOKS_PER_S = 219.0
_TINY = os.environ.get("BENCH_TINY") == "1"   # CPU smoke-test mode
AUDIO_SECONDS = 2 if _TINY else 60
N_PROMPT = 16 if _TINY else 204   # full: 73 prefix + 126 audio + 5 suffix
N_GEN = 12 if _TINY else 253      # full: generated tokens in reference run

_partial = {"metric": "rtf_60s_e2e", "value": -1.0, "unit": "ratio",
            "vs_baseline": 0.0, "status": "incomplete"}

REF_LONG_S = 9.90         # BASELINE.md: reference 300 s long-audio run
HBM_PEAK_GBPS = 819.0     # v5e HBM bandwidth (weight-streaming ceiling)


def _update_headline():
    """Refresh the headline rtf from whatever lanes have landed so far,
    so every partial emission (and any SIGTERM/SIGALRM cut) carries a
    valid engine-default estimate instead of value=-1."""
    gen = (_partial.get("generate_tokens_per_s_spec_sampled")
           or _partial.get("generate_tokens_per_s_int8_sampled")
           or _partial.get("generate_tokens_per_s_int8")
           or _partial.get("generate_tokens_per_s_bf16"))
    if not gen:
        return
    stages = ("encode_ms", "ctc_ms", "prefill_ms")
    if not all(k in _partial for k in stages):
        return
    total = sum(_partial[k] for k in stages) / 1000.0 + N_GEN / gen
    _partial["value"] = round(total / AUDIO_SECONDS, 5)
    _partial["vs_baseline"] = round(REF_E2E_S / total, 2)
    _partial["generate_tokens_per_s"] = gen
    _partial["generate_ms"] = round(N_GEN / gen * 1000, 2)
    _partial["total_s"] = round(total, 4)
    _partial["gen_vs_baseline"] = round(gen / REF_GEN_TOKS_PER_S, 2)


def _update_bandwidth():
    """Effective weight-streaming GB/s per decode lane (bytes-per-token x
    tok/s; batched lanes read weights once per STEP). A lower bound on
    achieved HBM bandwidth (KV/activation reads come on top), tracked so
    rounds measure efficiency vs the chip's ~819 GB/s, not just tok/s.

    Uses the DECODE-READ bytes (``llm_*_read_mb``): the bf16 embedding
    table sits in HBM but is gathered one row per token (the logits run
    through a separate quantized head), so counting it would overstate
    the stream — an earlier revision did, and the 1.7B preset came out
    'faster than the chip' (836 of 819 GB/s), which is how the bug was
    caught."""
    bw = {}
    for lane, mb_key in (("bf16", "llm_bf16_read_mb"),
                         ("int8", "llm_int8_read_mb"),
                         ("q8_0", "llm_q8_0_read_mb"),
                         ("int4", "llm_int4_read_mb")):
        tps = _partial.get(f"generate_tokens_per_s_{lane}")
        mb = _partial.get(mb_key)
        if tps and mb:
            bw[lane] = round(tps * mb / 1e3, 1)
    mb8 = _partial.get("llm_int8_read_mb")
    if mb8:
        for b in (4, 8, 16, 32):
            tps = _partial.get(f"generate_tokens_per_s_batch{b}")
            if tps:
                bw[f"int8_b{b}"] = round(tps / b * mb8 / 1e3, 1)
    if bw:
        _partial["weight_stream_gbps"] = bw
        _partial["hbm_peak_gbps"] = HBM_PEAK_GBPS
        _partial["bw_util_best_pct"] = round(
            max(bw.values()) / HBM_PEAK_GBPS * 100, 1)


def _emit_partial(section: str):
    """Print the running result JSON after every section. The driver
    parses the LAST JSON line, so a SIGKILL (or any uncatchable cut)
    still leaves the newest complete snapshot as the official artifact
    (round 4 lost every collected number to exactly that failure)."""
    _update_headline()
    _update_bandwidth()
    _partial["status"] = f"partial:{section}"
    _partial["timing_spread_pct"] = _spread
    sys.stdout.write("\n" + json.dumps(_partial) + "\n")
    sys.stdout.flush()

# per-label relative spread of the repeated long-point timing samples
# ((max-min)/min over the t2 repetitions) — tunnel variance is ±10-15%
# run-to-run, and without a spread field round-over-round deltas in
# BENCH_r{N}.json are indistinguishable from noise (VERDICT r2 weak #4)
_spread = {}


def _record_spread(label, samples):
    lo = min(samples)
    if lo > 0 and len(samples) > 1:
        _spread[label] = round((max(samples) - lo) / lo * 100, 1)


_cache_sentinel = None     # set by main(); cleared on signal exit


def _emit_and_exit(*_args):
    _update_headline()
    _update_bandwidth()
    _partial.setdefault("timing_spread_pct", _spread)
    # leading newline: the signal may land mid-write of another line and
    # the driver parses the LAST line — keep ours clean
    sys.stdout.write("\n" + json.dumps(_partial) + "\n")
    sys.stdout.flush()
    # os._exit skips atexit: clear the compile-cache sentinel here or
    # the NEXT run wipes the whole cache as "unclean" and pays every
    # compile again (observed: a 205 s cold param init after an
    # alarm-cut run)
    if _cache_sentinel and os.path.exists(_cache_sentinel):
        try:
            os.remove(_cache_sentinel)
        except OSError:
            pass
    os._exit(0)


def fetch(x) -> float:
    return float(jax.device_get(jnp.sum(x.astype(jnp.float32))))


def main():
    # the driver bounds the run with `timeout` (SIGTERM, rc=124): trap it
    # and land the partial JSON instead of dying silently (round 4 ran
    # ~19 min of measurements and recorded nothing). The alarm default
    # sits under the observed ~20 min driver budget as a second fence.
    signal.signal(signal.SIGALRM, _emit_and_exit)
    signal.signal(signal.SIGTERM, _emit_and_exit)
    signal.alarm(int(float(sys.argv[1]) if len(sys.argv) > 1 else 1100))

    from fun_asr_gguf_tpu.frontend import FrontendConfig
    from fun_asr_gguf_tpu.models.adaptor import (ctc_head_forward,
                                                 init_ctc_head_params)
    from fun_asr_gguf_tpu.models.audio_encoder import (
        AudioEncoderConfig, audio_encoder_forward, init_audio_encoder_params,
        make_frontend_constants)
    from fun_asr_gguf_tpu.models.config import HybridConfig
    from fun_asr_gguf_tpu.models.generate import generate_chunk, prefill_init
    from fun_asr_gguf_tpu.models.speculative import (spec_generate_chunk,
                                                     spec_init)
    from fun_asr_gguf_tpu.models.qwen3 import (init_qwen3_params,
                                               pack_qwen3_params,
                                               quantize_lm_head,
                                               quantize_lm_head_per_channel,
                                               quantize_qwen3_params,
                                               quantize_qwen3_params_int8)

    dev = jax.devices()[0]
    log = lambda *a: print("[bench]", *a, file=sys.stderr, flush=True)
    log("device:", dev)

    # persistent compile cache: the driver runs the bench twice per
    # round; the second run (and any rerun this round) skips the
    # multi-minute remote compiles entirely
    cache_dir = os.environ.get("FUNASR_BENCH_CACHE",
                               "/tmp/funasr_bench_xla_cache")
    if cache_dir:
        # a run killed mid-write can leave a truncated entry that
        # SEGFAULTS the next run's cache read (observed with the test
        # cache) — an "unclean shutdown" sentinel wipes the dir first
        sentinel = os.path.join(cache_dir, ".bench_running")
        if os.path.exists(sentinel):
            import shutil
            shutil.rmtree(cache_dir, ignore_errors=True)
        os.makedirs(cache_dir, exist_ok=True)
        open(sentinel, "w").close()
        global _cache_sentinel
        _cache_sentinel = sentinel
        import atexit
        atexit.register(lambda: os.path.exists(sentinel)
                        and os.remove(sentinel))
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

    cfg = HybridConfig.tiny() if _TINY \
        else HybridConfig()  # full-size Fun-ASR-Nano (SenseVoice+Qwen3-0.6B)
    audio_cfg = AudioEncoderConfig(frontend=FrontendConfig(),
                                   encoder=cfg.encoder, adaptor=cfg.adaptor)
    dtype = jnp.bfloat16

    rng = jax.random.PRNGKey(0)
    k1, k2, k3 = jax.random.split(rng, 3)
    t0 = time.perf_counter()
    # ONE fused init program: the eager per-op init issues hundreds of
    # sequential tiny dispatches over the tunnel (~237 s, and none of
    # them persistent-cacheable); a single jitted program compiles once
    # (~190 s cold, cached thereafter) and replays in ~12 s warm
    init_all = jax.jit(lambda a, b, c: (
        init_audio_encoder_params(a, audio_cfg, dtype=dtype),
        init_ctc_head_params(b, cfg.ctc, dtype=dtype),
        init_qwen3_params(c, cfg.llm, dtype=dtype)))
    audio_params, ctc_params, llm_params = init_all(k1, k2, k3)
    consts = jax.tree_util.tree_map(jnp.asarray,
                                    make_frontend_constants(audio_cfg))
    jax.block_until_ready(llm_params["embed"])
    log(f"params initialized in {time.perf_counter()-t0:.1f}s")

    n = 16000 * AUDIO_SECONDS
    audio = jnp.asarray(
        np.random.default_rng(0).normal(size=(1, n)).astype(np.float32) * 0.1)
    ilens = jnp.asarray([n], jnp.int32)
    enc_params_pair = {"encoder": audio_params["encoder"],
                       "adaptor": audio_params["adaptor"]}

    def chain_per_call(call, n1, n2, label):
        """call(i, feed_scalar) -> array; N calls chained by a device-side
        feedback scalar so dispatches overlap; one fetch drains the chain."""
        def run(k):
            feed = jnp.float32(0.0)
            out = None
            for i in range(k):
                out = call(i, feed)
                feed = jnp.sum(out.astype(jnp.float32)) * 1e-20
            t0 = time.perf_counter()
            v = fetch(out)
            return time.perf_counter() - t0, v

        # compile + settle
        t_c, _ = run(1)
        log(f"{label}: compiled ({t_c:.1f}s)")

        def total(k):
            t0 = time.perf_counter()
            feed = jnp.float32(0.0)
            out = None
            for i in range(k):
                out = call(i + 100, feed)
                feed = jnp.sum(out.astype(jnp.float32)) * 1e-20
            fetch(out)
            return time.perf_counter() - t0

        t1 = min(total(n1) for _ in range(3))
        # min-of-5 on the long point (VERDICT r3 #3a: headline fields get
        # N>=5 samples; the tunnel's ms-scale latency spikes only ever ADD
        # time, so min is the right estimator and the spread is reported)
        t2s = [total(n2) for _ in range(5)]
        t2 = min(t2s)
        _record_spread(label, t2s)
        if t2 <= t1:                # timing noise swamped the measurement
            log(f"{label}: degenerate timing t({n1})={t1:.3f} t({n2})={t2:.3f}"
                " — falling back to single-point estimate")
            return t2 / n2
        per = (t2 - t1) / (n2 - n1)
        log(f"{label}: t({n1})={t1:.3f}s t({n2})={t2:.3f}s "
            f"-> {per*1000:.2f} ms/call")
        return per

    # ---- encode (frontend + encoder + adaptor as ONE program, like the
    # engine's encode_audio) ----
    # NOTE: params/consts MUST be explicit jit arguments — closed-over
    # device arrays get baked into the lowered HLO as constants, and the
    # axon remote-compile endpoint rejects multi-hundred-MB uploads (413).
    @jax.jit
    def encode_fn(p, c, a, feed):
        enc, embd, _ = audio_encoder_forward(
            p, c, a + feed, ilens, cfg=audio_cfg, compute_dtype=dtype)
        return enc.astype(dtype), embd

    def encode_call(i, feed):
        return encode_fn(enc_params_pair, consts,
                         audio + (i + 1) * 1e-6, feed)[0]

    t_encode = chain_per_call(encode_call, 2, 10, "encode")
    _partial["encode_ms"] = round(t_encode * 1000, 2)

    enc, embd = encode_fn(enc_params_pair, consts, audio, jnp.float32(0.0))

    # ---- CTC head ----
    @jax.jit
    def ctc_fn(p, e, feed):
        return ctc_head_forward(p, e + feed.astype(dtype), cfg.ctc)

    # ctc/prefill run ~3 ms/call: at a 10-call chain the total (~30 ms)
    # sits inside the tunnel's latency jitter, which showed up as 19-78%
    # spread in BENCH_r03 (VERDICT r3 #3b). 40-call chains push the
    # measured window to >100 ms, where the same jitter is <10%.
    t_ctc = chain_per_call(
        lambda i, feed: ctc_fn(ctc_params,
                               enc + jnp.bfloat16((i + 1) * 1e-3), feed),
        8, 40, "ctc")
    _partial["ctc_ms"] = round(t_ctc * 1000, 2)

    # ---- LLM prefill ----
    prompt = embd[:, :N_PROMPT, :].astype(dtype)
    mask = jnp.ones((1, N_PROMPT), jnp.float32)
    max_len = N_PROMPT + N_GEN + 8
    # the engine's bf16 default: fused projections + per-channel int8 head
    llm_packed = quantize_lm_head_per_channel(
        pack_qwen3_params(llm_params), cfg.llm)

    def prefill_call(i, feed):
        st = prefill_init(llm_packed,
                          prompt + feed.astype(dtype)
                          + jnp.bfloat16((i + 1) * 1e-3),
                          mask, jax.random.PRNGKey(0), cfg.llm,
                          max_len=max_len)
        return st.logits

    t_prefill = chain_per_call(prefill_call, 8, 40, "prefill")
    _partial["prefill_ms"] = round(t_prefill * 1000, 2)
    _emit_partial("prefill")

    # ---- generation: chunked decode, same shape as the engine path ----
    def measure_generation(params, label, gen_prompt=None, gen_mask=None,
                           temperature=0.0, kv_int8=False):
        gen_prompt = prompt if gen_prompt is None else gen_prompt
        gen_mask = mask if gen_mask is None else gen_mask
        chunk = 4 if _TINY else 64
        n_chunks_full = max(1, N_GEN // chunk)
        greedy = temperature == 0.0

        def gen_chunks(n_chunks, seed):
            st = prefill_init(params, gen_prompt, gen_mask,
                              jax.random.PRNGKey(seed),
                              cfg.llm, max_len=max_len, kv_int8=kv_int8)
            toks = None
            for _ in range(n_chunks):
                st, toks = generate_chunk(
                    params, st, cfg.llm, jnp.asarray(temperature),
                    jnp.asarray(1.0), 50, chunk_len=chunk, stop_tokens=(),
                    fuse_enabled=False, greedy=greedy)
            return toks

        t_c = time.perf_counter()
        fetch(gen_chunks(1, 0))
        log(f"{label}: compiled ({time.perf_counter()-t_c:.1f}s)")

        def total(k, seed):
            t0 = time.perf_counter()
            fetch(gen_chunks(k, seed))
            return time.perf_counter() - t0

        n1, n2 = 1, n_chunks_full
        t1 = min(total(n1, 10 + i) for i in range(2))
        t2s = [total(n2, 20 + i) for i in range(5)]   # min-of-5 (hygiene)
        t2 = min(t2s)
        _record_spread(label, t2s)
        if n2 == n1 or t2 <= t1:    # timing noise swamped the measurement
            log(f"{label}: degenerate timing t({n1})={t1:.3f} t({n2})={t2:.3f}"
                " — falling back to single-point estimate")
            return t2 / (n2 * chunk)
        per_tok = (t2 - t1) / ((n2 - n1) * chunk)
        log(f"{label}: t({n1*chunk}tok)={t1:.3f}s t({n2*chunk}tok)={t2:.3f}s"
            f" -> {per_tok*1000:.3f} ms/token")
        return per_tok

    def tree_bytes(tree):
        return int(sum(x.size * x.dtype.itemsize
                       for x in jax.tree_util.tree_leaves(tree)
                       if hasattr(x, "dtype")))

    def decode_read_bytes(tree):
        """Bytes actually STREAMED per decode token: the whole tree
        minus the embedding table (gathered one row per token) whenever
        the logits run through a separate head tensor."""
        total = tree_bytes(tree)
        has_head = any(k in tree for k in ("lm_head", "lm_head_i8",
                                           "lm_head_q"))
        if has_head and "embed" in tree:
            total -= int(sum(x.size * x.dtype.itemsize
                             for x in jax.tree_util.tree_leaves(
                                 tree["embed"]) if hasattr(x, "dtype")))
        return total

    per_tok_bf16 = measure_generation(llm_packed, "generate[bf16]")
    _partial["generate_tokens_per_s_bf16"] = round(1.0 / per_tok_bf16, 1)
    _partial["llm_bf16_mb"] = round(tree_bytes(llm_packed) / 1e6, 1)
    _partial["llm_bf16_read_mb"] = round(
        decode_read_bytes(llm_packed) / 1e6, 1)
    _partial["encoder_mb"] = round(tree_bytes(audio_params) / 1e6, 1)
    _emit_partial("bf16")

    # the engine's "auto" default: per-channel int8 layers + int8 head
    llm_int8 = quantize_qwen3_params_int8(llm_packed)
    _partial["llm_int8_mb"] = round(tree_bytes(llm_int8) / 1e6, 1)
    _partial["llm_int8_read_mb"] = round(
        decode_read_bytes(llm_int8) / 1e6, 1)
    try:
        per_tok_int8 = measure_generation(llm_int8, "generate[int8]")
        _partial["generate_tokens_per_s_int8"] = round(1.0 / per_tok_int8, 1)
    except Exception as e:
        log("int8 generation failed:", e)
        per_tok_int8 = float("inf")

    # plain sampled decode (T=0.4) — the fair comparator for the
    # guardrailed sampled-spec number below: sampling itself (two-stage
    # top-k + gumbel) costs ~15% over greedy, so spec-with-guardrail
    # should be judged against THIS, not the greedy int8 number
    try:
        per_tok_int8_s = measure_generation(
            llm_int8, "generate[int8,T=0.4]", temperature=0.4)
        _partial["generate_tokens_per_s_int8_sampled"] = round(
            1.0 / per_tok_int8_s, 1)
    except Exception as e:
        log("int8 sampled generation failed:", e)
    _emit_partial("int8")

    # q8_0 / batch-sweep lanes moved to the extras tail: the engine-level
    # section (the flagship product numbers) must land in the artifact
    # before any long-tail lane spends budget (VERDICT r4 #1).
    B = 2 if _TINY else 4
    B16 = 4 if _TINY else 16
    per_tok_q8 = float("inf")
    per_step_b = None

    # ---- CTC-draft speculative decoding (the engine default when CTC is
    # on): draft = the verify path's own greedy output with 15% of tokens
    # corrupted, emulating realistic CTC↔LLM transcript disagreement.
    #
    # The draft must come from the VERIFY pass, not the one-token decode
    # pass: with random weights the logits are near-uniform, and the two
    # kernels' bf16 reduction orders flip the argmax on near-ties (~19%
    # token agreement measured) — zero acceptance, so the measurement
    # degenerates to plain decode + overhead. A trained model has
    # well-separated top-1 logits and its CTC transcript is scored by the
    # verify pass alone, so the production path has no such coupling; the
    # fixed point of "emit with the verify kernel, feed back as draft"
    # reproduces the trained-model regime on random weights (one iteration
    # converges: agreement 1.000 measured on v5e). ----
    SPEC_K = 4 if _TINY else 8
    spec_params = llm_int8 if np.isfinite(per_tok_int8) else llm_packed
    per_tok_spec = float("inf")
    per_tok_spec_ceiling = float("inf")
    per_tok_spec_subst = float("inf")
    per_tok_spec_t04 = float("inf")
    try:
        chunk = 4 if _TINY else 64
        ref_toks = []
        st = prefill_init(spec_params, prompt, mask, jax.random.PRNGKey(0),
                          cfg.llm, max_len=max_len)
        while len(ref_toks) < N_GEN:
            st, toks = generate_chunk(
                spec_params, st, cfg.llm, jnp.asarray(0.0), jnp.asarray(1.0),
                50, chunk_len=chunk, stop_tokens=(), fuse_enabled=False,
                greedy=True)
            ref_toks.extend(int(t) for t in np.asarray(toks)[0] if t >= 0)
        ref_toks = ref_toks[:N_GEN]
        # KV headroom: chunks emit in chunk-sized strides (the emit loops
        # below run ceil(N_GEN/chunk) full chunks), and every verify round
        # writes SPEC_K+1 entries starting at the next free slot — honor
        # spec_generate_chunk's documented contract
        n_chunks_full = max(1, -(-N_GEN // chunk))
        spec_max_len = N_PROMPT + n_chunks_full * chunk + SPEC_K + 1

        def spec_emit(draft_arr, p, m):
            """One spec run at prompt ``p``/mask ``m``; returns row 0's
            emitted (verify-kernel) tokens."""
            st = spec_init(prefill_init(
                spec_params, p, m, jax.random.PRNGKey(0), cfg.llm,
                max_len=spec_max_len))
            emitted = []
            while len(emitted) < N_GEN:
                st, toks = spec_generate_chunk(
                    spec_params, st, draft_arr, cfg.llm, jnp.asarray(0.0),
                    jnp.asarray(1.0), 50, spec_k=SPEC_K, chunk_len=chunk,
                    stop_tokens=(), fuse_enabled=False, greedy=True)
                emitted.extend(int(t) for t in np.asarray(toks)[0]
                               if t >= 0)
            return emitted[:N_GEN]

        def to_draft(tok_list):
            buf = np.full((1, 512), -1, np.int32)
            buf[0, :len(tok_list)] = np.asarray(tok_list, np.int32)
            return jnp.asarray(buf)

        # verify-kernel fixed point
        fp_toks = spec_emit(to_draft(ref_toks), prompt, mask)
        draft = np.asarray(fp_toks, np.int32)
        rng_d = np.random.default_rng(7)
        corrupt = rng_d.random(draft.shape) < 0.15
        # headline disagreement model: HOLES (-1), which truncate
        # acceptance at the disagreement point exactly like a rejected
        # token does, but never inject a wrong token into the emission
        # path — substitutions on random weights diverge the emission
        # from the fixed point after the first rejection (trained models
        # don't have that failure; see docs/PERFORMANCE.md)
        draft_holes = np.where(corrupt, -1, draft)
        draft_subst = np.where(corrupt,
                               rng_d.integers(0, cfg.llm.vocab_size,
                                              size=draft.shape), draft)
        draft_perfect = to_draft(fp_toks)
        draft_ids = to_draft(draft_holes)
        draft_ids_subst = to_draft(draft_subst)

        def spec_chunks(n_chunks, seed, d, p, m, temp=0.0):
            st = spec_init(prefill_init(
                spec_params, p, m, jax.random.PRNGKey(seed),
                cfg.llm, max_len=spec_max_len))
            for _ in range(n_chunks):
                st, toks = spec_generate_chunk(
                    spec_params, st, d, cfg.llm, jnp.asarray(temp),
                    jnp.asarray(1.0), 50, spec_k=SPEC_K, chunk_len=chunk,
                    stop_tokens=(), fuse_enabled=False,
                    greedy=(temp <= 0))
            return st.n_gen

        def measure_spec(label, d, p, m, temp=0.0):
            """Two-point chained spec timing; returns s/token *per row*
            (sums emitted tokens over rows for the degenerate fallback)."""
            b_rows = p.shape[0]
            t_c = time.perf_counter()
            fetch(spec_chunks(1, 0, d, p, m, temp))
            log(f"{label}: compiled ({time.perf_counter()-t_c:.1f}s)")

            def total_spec(k, seed):
                t0 = time.perf_counter()
                n = fetch(spec_chunks(k, seed, d, p, m, temp))
                return time.perf_counter() - t0, n

            n1, n2 = 1, n_chunks_full
            t1 = min(total_spec(n1, 30 + i)[0] for i in range(2))
            t2samp = [total_spec(n2, 40 + i) for i in range(2)]
            t2, n_emitted = min(t2samp)
            _record_spread(label, [t for t, _ in t2samp])
            if n2 > n1 and t2 > t1:
                per = (t2 - t1) / ((n2 - n1) * chunk)
                log(f"{label}: t({n1*chunk}tok)={t1:.3f}s "
                    f"t({n2*chunk}tok)={t2:.3f}s -> {per*1000:.3f} "
                    f"ms/token/row (emitted {int(n_emitted)})")
            else:
                per = t2 / max(1.0, n_emitted / b_rows)
                log(f"{label}: degenerate timing — single-point "
                    f"{per*1000:.3f} ms/token/row")
            return per

        # draft-agreement sweep (holes model): CTC↔LLM transcript
        # disagreement from 0% to 50%. The headline spec number is the
        # 15%-disagreement point; the sweep shows how throughput degrades
        # as the draft quality drops (the acceptance-rate guardrail floors
        # the engine at plain-decode speed below break-even).
        sweep = {}
        for agree_pct, d_arr in [(100, draft_perfect), (85, draft_ids)]:
            per = measure_spec(f"generate[spec,int8,{agree_pct}%]",
                               d_arr, prompt, mask)
            sweep[str(agree_pct)] = round(1.0 / per, 1)
            if agree_pct == 100:
                per_tok_spec_ceiling = per
            else:
                per_tok_spec = per
        rng_s = np.random.default_rng(13)
        for agree_pct in (() if _TINY else (70, 50)):
            holes = rng_s.random(draft.shape) < (1 - agree_pct / 100.0)
            d_arr = to_draft(np.where(holes, -1, draft).tolist())
            per = measure_spec(f"generate[spec,int8,{agree_pct}%]",
                               d_arr, prompt, mask)
            sweep[str(agree_pct)] = round(1.0 / per, 1)
        _partial["spec_sweep_tok_per_s"] = sweep
        _partial["generate_tokens_per_s_spec"] = round(1.0 / per_tok_spec, 1)
        _partial["generate_tokens_per_s_spec_ceiling"] = round(
            1.0 / per_tok_spec_ceiling, 1)
        # worst case: substituted wrong tokens (on random weights this
        # also triggers the emission-divergence artifact — lower bound)
        per_tok_spec_subst = measure_spec("generate[spec,int8,subst]",
                                          draft_ids_subst, prompt, mask)
        _partial["generate_tokens_per_s_spec_subst"] = round(
            1.0 / per_tok_spec_subst, 1)

        # engine-default sampled mode (temperature 0.4) WITH the
        # acceptance-rate guardrail, exactly as core/decoder.py runs it:
        # spec chunks until emitted/rounds drops below spec_min_accept,
        # then convert (spec_to_gen) and continue with plain chunks. On
        # random weights sampled acceptance is near zero, so this measures
        # the auto-off path an engine user actually gets.
        from fun_asr_gguf_tpu.models.speculative import spec_to_gen
        MIN_ACCEPT = 1.35

        def sampled_engine_emission(seed, target=None):
            target = N_GEN if target is None else target
            st = spec_init(prefill_init(
                spec_params, prompt, mask, jax.random.PRNGKey(seed),
                cfg.llm, max_len=spec_max_len))
            d = draft_perfect
            emitted, spec_on, first = 0, True, True
            while emitted < target:
                if spec_on:
                    # 16-token probe first, as core/decoder.py does
                    lim = 16 if first else chunk
                    first = False
                    st, toks = spec_generate_chunk(
                        spec_params, st, d, cfg.llm, jnp.asarray(0.4),
                        jnp.asarray(1.0), 50, spec_k=SPEC_K,
                        chunk_len=chunk, stop_tokens=(),
                        fuse_enabled=False, greedy=False, limit=lim)
                    emitted += int((np.asarray(toks) >= 0).sum())
                    rounds = int(np.asarray(st.rounds)[0])
                    if (rounds >= 8 and emitted / rounds < MIN_ACCEPT
                            and int(np.asarray(st.forbid)[0]) < 0):
                        st = spec_to_gen(st)
                        spec_on = False
                else:
                    st, toks = generate_chunk(
                        spec_params, st, cfg.llm, jnp.asarray(0.4),
                        jnp.asarray(1.0), 50, chunk_len=chunk,
                        stop_tokens=(), fuse_enabled=False, greedy=False)
                    emitted += chunk
            return emitted

        sampled_engine_emission(0)      # compile both phases
        # two-point differencing: run to a short and a full emission
        # target; the prefill (and any fixed dispatch cost) cancels in
        # the difference instead of being subtracted from a separately
        # measured number (which over the tunnel can exceed the loop
        # time and go negative). Min per POINT first, then difference —
        # differencing per-repetition pairs lets one noise-inflated
        # short run produce a near-zero (or negative) delta that the
        # min then keeps (a prior run emitted 1.92e11 tok/s that way).
        short_target = max(N_GEN // 4, 16)
        t_s = t_l = float("inf")
        n_s = n_l = 0
        for i in range(1 if _TINY else 3):
            t0 = time.perf_counter()
            n_s = sampled_engine_emission(50 + i, target=short_target)
            t_s = min(t_s, time.perf_counter() - t0)
            t0 = time.perf_counter()
            n_l = sampled_engine_emission(50 + i)
            t_l = min(t_l, time.perf_counter() - t0)
        if n_l > n_s and t_l > t_s:
            per_tok_spec_t04 = (t_l - t_s) / (n_l - n_s)
        else:                       # degenerate timing: conservative
            per_tok_spec_t04 = t_l / max(n_l, 1)   # (includes prefill)
        log(f"generate[spec,int8,T=0.4,guardrail]: d={t_l - t_s:.3f}s for "
            f"{n_l - n_s} tok -> {per_tok_spec_t04*1000:.3f} ms/token")
        _partial["generate_tokens_per_s_spec_sampled"] = round(
            1.0 / per_tok_spec_t04, 1)
    except Exception as e:
        log("speculative generation failed:", e)
    _emit_partial("spec")

    # ---- engine-level batched serving (VERDICT r3 #1): the REAL
    # BatchStreamDecoder with its batch-aware acceptance guardrail, on
    # hardware. Tiny encoder/CTC (generation throughput never reads
    # them) + the full-size decoder; drafts come from the CTC transcript
    # exactly as in production. On random weights draft acceptance is
    # ~0, so this exercises the guardrail's spec->plain drop
    # (core/batch.py:209-269) and the engine default must land at
    # plain-b8 throughput, not at the losing always-spec number. ----
    if not _TINY:
        try:
            import base64
            import logging as _logging
            import tempfile
            from fun_asr_gguf_tpu import create_asr_engine
            from fun_asr_gguf_tpu.core.batch import BatchStreamDecoder
            from fun_asr_gguf_tpu.datatypes import RecognitionStream
            from fun_asr_gguf_tpu.models.config import (AdaptorConfig,
                                                        CTCHeadConfig,
                                                        EncoderConfig)
            from fun_asr_gguf_tpu.models.loaders import \
                create_random_checkpoint

            enc_t = EncoderConfig.tiny()
            eng_cfg = HybridConfig(
                encoder=enc_t,
                adaptor=AdaptorConfig.tiny(in_dim=enc_t.d_model,
                                           out_dim=cfg.llm.hidden),
                ctc=CTCHeadConfig.tiny(d=enc_t.d_model, vocab_size=101),
                llm=cfg.llm)
            ckpt = os.path.join(tempfile.gettempdir(),
                                "funasr_bench_engine_ckpt")
            if not os.path.exists(os.path.join(ckpt, "decoder.gguf")):
                log("engine[b8]: writing random checkpoint "
                    "(full-size decoder, direct-q8 host path)...")
                t0 = time.perf_counter()
                create_random_checkpoint(ckpt, eng_cfg, seed=0,
                                         fast_q8=True)
                log(f"engine[b8]: checkpoint written "
                    f"({time.perf_counter()-t0:.1f}s)")
            tok_file = os.path.join(ckpt, "tokens.txt")
            if not os.path.exists(tok_file):
                rows = []
                for i in range(eng_cfg.ctc.vocab_size):
                    ch = (chr(ord("一") + i)
                          if i < eng_cfg.ctc.vocab_size - 1 else "<blk>")
                    rows.append(
                        f"{base64.b64encode(ch.encode()).decode()} {i}")
                with open(tok_file, "w", encoding="utf-8") as f:
                    f.write("\n".join(rows) + "\n")

            t0 = time.perf_counter()
            # warmup=False: the b=1 warmup programs are never used here
            # (BatchStreamDecoder/streaming compile their own on first
            # call, outside the timed windows) and cost minutes of
            # remote compiles (round-4 init+warmup: 213 s)
            eng = create_asr_engine(
                ckpt, verbose=False, n_predict=N_GEN,
                segment_pad_seconds=float(AUDIO_SECONDS),
                hotwords_path=os.path.join(ckpt, "hot.txt"),
                warmup=False)
            log(f"engine[b8]: init {time.perf_counter()-t0:.1f}s")

            # catch the guardrail's spec->plain log line
            drops = []

            class _Catch(_logging.Handler):
                def emit(self, record):
                    if "speculation off" in record.getMessage():
                        drops.append(record.getMessage())

            batch_logger = _logging.getLogger("fun_asr_gguf_tpu.core.batch")
            handler = _Catch()
            batch_logger.addHandler(handler)
            bd = BatchStreamDecoder(eng.models)
            rng_a = np.random.default_rng(3)

            def engine_run(n_rows, decoder=None):
                streams = []
                for _ in range(n_rows):
                    s = RecognitionStream()
                    s.accept_waveform(16000, rng_a.normal(
                        size=16000 * AUDIO_SECONDS
                    ).astype(np.float32) * 0.1)
                    streams.append(s)
                res = (decoder or bd).decode_streams(streams,
                                                     temperature=0.3)
                t_gen8 = sum(r.timings.llm_generate for r in res)
                n8 = sum(r.n_gen for r in res)
                return n8, t_gen8

            for rows, key in ((8, "generate_tokens_per_s_engine_b8"),
                              (16, "generate_tokens_per_s_engine_b16")):
                engine_run(rows)                    # compile
                samples = [engine_run(rows) for _ in range(3)]
                tps = [n / t for n, t in samples if t > 0 and n > 0]
                if tps:
                    _partial[key] = round(max(tps), 1)
                    log(f"engine[b{rows}]: {max(tps):.0f} tok/s aggregate "
                        f"(BatchStreamDecoder, guardrail active)")

            # the FAIR baseline for the engine default: the same engine
            # with speculation off (same sampled decode, same host loop)
            # — the plain-b8 bench lane is GREEDY, and two-stage top-k
            # sampling over 8x152k logits is its own cost
            # (docs/PERFORMANCE.md "Batched serving")
            eng.models.config.speculative = False
            engine_run(8)
            samples = [engine_run(8) for _ in range(3)]
            tps = [n / t for n, t in samples if t > 0 and n > 0]
            if tps:
                _partial["generate_tokens_per_s_engine_b8_nospec"] = \
                    round(max(tps), 1)
                log(f"engine[b8,nospec]: {max(tps):.0f} tok/s aggregate")
            eng.models.config.speculative = True
            _partial["engine_b8_guardrail_dropped"] = bool(drops)
            log(f"engine[b8]: guardrail dropped spec_k->0: {bool(drops)}"
                + (f" ({drops[0]})" if drops else ""))
            batch_logger.removeHandler(handler)

            # streaming first-text latency: session start + one 4 s chunk
            # fed to the incremental decoder (prefix-KV extend + 16
            # partial tokens), warm programs. The product metric VERDICT
            # r3 #5 asks for — the reference cannot emit text before a
            # full segment decodes.
            try:
                warm = eng.create_streaming_session(partial_tokens=16)
                warm.feed(rng_a.normal(size=16000 * 4
                                       ).astype(np.float32) * 0.1)
                lat = []
                for _ in range(5):
                    sess = eng.create_streaming_session(partial_tokens=16)
                    # NB: local name must not shadow the spec block's
                    # ``chunk`` (chunk_len int) — the b8 section reuses
                    # it as a STATIC jit argument after this block runs
                    feed_audio = rng_a.normal(size=16000 * 4
                                              ).astype(np.float32) * 0.1
                    t0 = time.perf_counter()
                    sess.feed(feed_audio)
                    lat.append((time.perf_counter() - t0) * 1000.0)
                _partial["latency_to_first_token_ms"] = round(min(lat), 1)
                log(f"streaming: first-partial latency "
                    f"{min(lat):.1f} ms (4 s chunk, warm)")
            except Exception as e:
                log("streaming latency measurement failed:", e)
            eng.cleanup()
        except Exception as e:
            log("engine-level batched measurement failed:", e)
    _emit_partial("engine")

    # ---- long audio (BASELINE: 300 s, 6×60 s segments, 9.90 s reference):
    # parallel_segments mode rides all segments on the batch dimension of
    # one encode / CTC / prefill / generate program, padded to the b=8
    # bucket (engine: orchestrator._decode_segments_batched) ----
    long_audio_s = None
    if not _TINY:
        try:
            B8 = 8
            audio8 = jnp.concatenate(
                [audio + (i + 1) * 1e-6 for i in range(B8)], axis=0)
            ilens8 = jnp.asarray([n] * B8, jnp.int32)

            @jax.jit
            def encode8_fn(p, c, a, feed):
                enc8, _, _ = audio_encoder_forward(
                    p, c, a + feed, ilens8, cfg=audio_cfg,
                    compute_dtype=dtype)
                return enc8.astype(dtype)

            t_enc8 = chain_per_call(
                lambda i, feed: encode8_fn(
                    enc_params_pair, consts, audio8 + (i + 1) * 1e-6, feed),
                2, 6, "encode[b8]")
            enc8 = encode8_fn(enc_params_pair, consts, audio8,
                              jnp.float32(0.0))
            t_ctc8 = chain_per_call(
                lambda i, feed: ctc_fn(
                    ctc_params, enc8 + jnp.bfloat16((i + 1) * 1e-3), feed),
                2, 6, "ctc[b8]")

            prompt8 = jnp.concatenate(
                [prompt + jnp.bfloat16(i * 1e-3) for i in range(B8)], axis=0)
            mask8 = jnp.ones((B8, N_PROMPT), jnp.float32)

            def prefill8_call(i, feed):
                st = prefill_init(llm_int8,
                                  prompt8 + feed.astype(dtype)
                                  + jnp.bfloat16((i + 1) * 1e-3),
                                  mask8, jax.random.PRNGKey(0), cfg.llm,
                                  max_len=max_len)
                return st.logits
            t_prefill8 = chain_per_call(prefill8_call, 2, 6, "prefill[b8]")

            per_step_b8 = measure_generation(llm_int8, "generate[int8,b8]",
                                             prompt8, mask8)
            # plain-b8 aggregate — the comparison baseline for both the
            # spec_b8 lane and the engine-level BatchStreamDecoder below
            # (BENCH_r03 measured it but never emitted it; VERDICT r3 #1)
            _partial["generate_tokens_per_s_batch8"] = round(
                B8 / per_step_b8, 1)

            # the engine's batched default: per-row CTC-draft speculation.
            # The b=8 verify kernel has its own bf16 reduction order, so
            # the numerics fixed point is re-derived at b=8 (identical
            # rows; seed variation busts dispatch memoization) — see the
            # b=1 spec comment above for why decode-path drafts measure
            # zero acceptance on random weights.
            per_tok_spec8 = float("inf")
            if "draft_ids" in locals() and np.isfinite(per_tok_spec):
                try:
                    # reuses spec_emit / measure_spec from the b=1 block —
                    # only the (prompt, mask, draft) arguments change
                    prompt8s = jnp.tile(prompt, (B8, 1, 1))
                    fp8 = spec_emit(jnp.tile(to_draft(fp_toks), (B8, 1)),
                                    prompt8s, mask8)
                    d8 = np.tile(np.asarray(to_draft(fp8)), (B8, 1))
                    rng_d8 = np.random.default_rng(11)
                    mask_c = rng_d8.random(d8.shape) < 0.15
                    d8 = np.where(mask_c, -1, d8)   # holes, as at b=1
                    per_tok_spec8 = measure_spec(
                        "generate[spec,int8,b8]", jnp.asarray(d8),
                        prompt8s, mask8)
                    log(f"generate[spec,int8,b8]: "
                        f"{B8/per_tok_spec8:.0f} tok/s aggregate")
                    _partial["generate_tokens_per_s_spec_b8"] = round(
                        B8 / per_tok_spec8, 1)
                except Exception as e:
                    import traceback
                    log("batched speculative measurement failed:", e)
                    traceback.print_exc(file=sys.stderr)

            per_row8 = min(per_step_b8, per_tok_spec8)
            long_audio_s = (t_enc8 + t_ctc8 + t_prefill8
                            + per_row8 * N_GEN)
            _partial["long_audio_300s_s"] = round(long_audio_s, 3)
            log(f"long-audio 300s (6 segs, b8 bucket): {long_audio_s:.3f}s "
                f"(reference 9.90s -> {9.90/long_audio_s:.1f}x)")
        except Exception as e:
            log("long-audio batched measurement failed:", e)
    _emit_partial("b8")

    # ---- q8_0 lane (llama.cpp-format weights through the Pallas
    # dequant-matmul path) + small-batch lane: secondary reference-parity
    # numbers, measured after the flagship sections ----
    try:
        log("quantizing decoder weights to q8_0 (incl. lm_head)...")
        from fun_asr_gguf_tpu.models.qwen3 import fuse_qwen3_params_q8
        qparams = fuse_qwen3_params_q8(pack_qwen3_params(
            quantize_lm_head(quantize_qwen3_params(llm_params), cfg.llm)))
        jax.block_until_ready(qparams["layers"]["qkv_w"].q)
        _partial["llm_q8_0_mb"] = round(tree_bytes(qparams) / 1e6, 1)
        _partial["llm_q8_0_read_mb"] = round(
            decode_read_bytes(qparams) / 1e6, 1)
        per_tok_q8 = measure_generation(qparams, "generate[q8_0]")
        _partial["generate_tokens_per_s_q8_0"] = round(1.0 / per_tok_q8, 1)
    except Exception as e:  # pallas path may be unavailable
        log("q8_0 generation failed:", e)
        per_tok_q8 = float("inf")
    try:
        promptB = jnp.concatenate(
            [prompt + jnp.bfloat16(i * 1e-3) for i in range(B)], axis=0)
        maskB = jnp.ones((B, N_PROMPT), jnp.float32)
        per_step_b = measure_generation(llm_int8, f"generate[int8,b{B}]",
                                        promptB, maskB)
        _partial[f"generate_tokens_per_s_batch{B}"] = round(
            B / per_step_b, 1)
    except Exception as e:
        log(f"batched generation failed: {e}")
        per_step_b = None
    _emit_partial("q8_batch")

    # ---- round-2 experimental formats: int4 (w4a16) weights and the
    # int8 KV cache. Measured LAST so a near-deadline alarm can only
    # truncate these extras, never the headline metrics above. ----
    try:
        from fun_asr_gguf_tpu.models.qwen3 import quantize_qwen3_params_int4
        llm_int4 = quantize_qwen3_params_int4(llm_packed)
        per_tok_int4 = measure_generation(llm_int4, "generate[int4]")
        _partial["generate_tokens_per_s_int4"] = round(1.0 / per_tok_int4, 1)
        _partial["llm_int4_mb"] = round(tree_bytes(llm_int4) / 1e6, 1)
        _partial["llm_int4_read_mb"] = round(
            decode_read_bytes(llm_int4) / 1e6, 1)
        del llm_int4
    except Exception as e:
        log("int4 generation failed:", e)
    _emit_partial("int4")
    try:
        per_tok_kv8 = measure_generation(llm_int8, "generate[int8,kv8]",
                                         kv_int8=True)
        _partial["generate_tokens_per_s_int8_kv8"] = round(
            1.0 / per_tok_kv8, 1)
        # int8 KV halves the cache reads, which only dominate past b≈16
        # (see PERFORMANCE.md batched table) — measure the pair at b=16
        # where the trade is expected to pay, not at b=4 where weight
        # streaming still dominates and the quant/dequant VPU work loses
        prompt16 = jnp.concatenate(
            [prompt + jnp.bfloat16(i * 1e-3) for i in range(B16)], axis=0)
        mask16 = jnp.ones((B16, N_PROMPT), jnp.float32)
        per_step_16 = measure_generation(
            llm_int8, f"generate[int8,b{B16}]", prompt16, mask16)
        _partial[f"generate_tokens_per_s_batch{B16}"] = round(
            B16 / per_step_16, 1)
        per_step_16kv = measure_generation(
            llm_int8, f"generate[int8,b{B16},kv8]", prompt16, mask16,
            kv_int8=True)
        _partial[f"generate_tokens_per_s_batch{B16}_kv8"] = round(
            B16 / per_step_16kv, 1)
        # b=32: the cache-read-dominated regime (VERDICT r3 item 4's
        # measuring stick) — aggregate throughput + the kv8 pair
        B32 = B16 * 2
        prompt32 = jnp.concatenate(
            [prompt + jnp.bfloat16(i * 1e-3) for i in range(B32)], axis=0)
        mask32 = jnp.ones((B32, N_PROMPT), jnp.float32)
        per_step_32 = measure_generation(
            llm_int8, f"generate[int8,b{B32}]", prompt32, mask32)
        _partial[f"generate_tokens_per_s_batch{B32}"] = round(
            B32 / per_step_32, 1)
        per_step_32kv = measure_generation(
            llm_int8, f"generate[int8,b{B32},kv8]", prompt32, mask32,
            kv_int8=True)
        _partial[f"generate_tokens_per_s_batch{B32}_kv8"] = round(
            B32 / per_step_32kv, 1)
    except Exception as e:
        log("int8-KV generation failed:", e)
    _emit_partial("kv8_sweep")

    # headline generation = the ENGINE-DEFAULT decode (VERDICT r3 #3d):
    # sampled (T=0.4) CTC-draft speculation WITH the acceptance guardrail,
    # exactly what `engine.transcribe(path)` runs. The greedy fixed-draft
    # lanes (85% spec, 100% ceiling) stay as secondary fields — they
    # bracket what a trained model's CTC draft can buy, but they are not
    # what a default engine call measures.
    per_tok_spec_eff = min(per_tok_spec, per_tok_spec_subst)
    per_tok_best = min(per_tok_bf16, per_tok_int8, per_tok_q8,
                       per_tok_spec_eff)
    if np.isfinite(per_tok_spec_t04):
        per_tok = per_tok_spec_t04
    elif "generate_tokens_per_s_int8_sampled" in _partial:
        per_tok = 1.0 / _partial["generate_tokens_per_s_int8_sampled"]
    else:
        per_tok = per_tok_best
    t_gen = per_tok * N_GEN
    gen_tps = 1.0 / per_tok

    total = t_encode + t_ctc + t_prefill + t_gen
    rtf = total / AUDIO_SECONDS

    # the final line = everything accumulated in _partial (engine/b8/
    # extras sections write there directly) + the headline fields
    _partial.update({
        "value": round(rtf, 5),
        "vs_baseline": round(REF_E2E_S / total, 2),
        "generate_ms": round(t_gen * 1000, 2),
        # engine-default decode (sampled spec + guardrail); the fastest
        # measured lane is generate_tokens_per_s_best
        "generate_tokens_per_s": round(gen_tps, 1),
        "generate_tokens_per_s_best": round(1.0 / per_tok_best, 1),
        "gen_vs_baseline": round(gen_tps / REF_GEN_TOKS_PER_S, 2),
        "total_s": round(total, 4),
        # parallel long-audio: 300 s / 6 segments through b=8 batched
        # programs (reference long run: 9.90 s, README.md:311-383)
        "long_audio_300s_s": (round(long_audio_s, 3)
                              if long_audio_s else None),
        "long_vs_baseline": (round(REF_LONG_S / long_audio_s, 2)
                             if long_audio_s else None),
        # per-label (max-min)/min % over repeated long-point samples —
        # how much of any round-over-round delta is plain tunnel noise
        "timing_spread_pct": _spread,
        "device": str(dev),
        "status": "complete",
    })
    _update_bandwidth()
    signal.alarm(0)
    sys.stdout.write("\n" + json.dumps(_partial) + "\n")
    sys.stdout.flush()


if __name__ == "__main__":
    main()
