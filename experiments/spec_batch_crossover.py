"""Measure the spec-vs-plain crossover batch size (VERDICT r3 item 2).

At b=1 CTC-draft speculation wins (r02: 1179 vs 746 tok/s); at b=8 it
loses (2539 vs 4077 aggregate). A verify round advances up to K+1
positions per row, so its matmul M dimension is B*(K+1) — the step stops
being weight-bound as B grows and the verify pass gets strictly more
expensive than a plain step. This probe times, per batch size:

  plain[b]      one plain generate_chunk step stream (greedy)
  spec85[b]     spec_generate_chunk with the 15%-holes draft (bench.py's
                headline disagreement model)
  verify_cost   the per-round cost ratio spec-round / plain-step, from the
                same timings (emitted/round tells rounds per chunk)

Output: one JSON line per batch with aggregate tok/s for both paths and
the implied break-even acceptance (emitted tokens/round/row above which
spec beats plain at that batch).

Usage: python experiments/spec_batch_crossover.py [--batches 1,2,4,8]
"""

import argparse
import json
import time

import numpy as np

import jax
import jax.numpy as jnp

import fun_asr_gguf_tpu  # noqa: F401
from fun_asr_gguf_tpu.models.config import HybridConfig
from fun_asr_gguf_tpu.models.generate import generate_chunk, prefill_init
from fun_asr_gguf_tpu.models.qwen3 import (init_qwen3_params,
                                           pack_qwen3_params,
                                           quantize_qwen3_params_int8)
from fun_asr_gguf_tpu.models.speculative import (spec_generate_chunk,
                                                 spec_init)

N_PROMPT = 204
N_GEN = 256
SPEC_K = 8
CHUNK = 64


def fetch(x):
    return np.asarray(jax.device_get(x))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batches", default="1,2,4,8")
    args = ap.parse_args()
    batches = [int(b) for b in args.batches.split(",")]

    cfg = HybridConfig()
    rng = np.random.default_rng(0)
    llm = init_qwen3_params(jax.random.PRNGKey(2), cfg.llm, jnp.bfloat16)
    params = quantize_qwen3_params_int8(pack_qwen3_params(llm))
    jax.block_until_ready(params["layers"]["qkv_w"])

    n_chunks = -(-N_GEN // CHUNK)
    max_len = N_PROMPT + n_chunks * CHUNK + SPEC_K + 1
    prompt1 = jnp.asarray(
        rng.normal(size=(1, N_PROMPT, cfg.llm.hidden)).astype(np.float32)
        * 0.05, jnp.bfloat16)

    # fixed-point draft at b=1 (bench.py's recipe): emit greedily with the
    # verify kernel, feed back as the draft; then punch 15% holes
    st = spec_init(prefill_init(params, prompt1,
                                jnp.ones((1, N_PROMPT), jnp.float32),
                                jax.random.PRNGKey(0), cfg.llm,
                                max_len=max_len))
    zero_draft = jnp.full((1, 512), -1, jnp.int32)
    emitted = []
    while len(emitted) < N_GEN:
        st, toks = spec_generate_chunk(
            params, st, zero_draft, cfg.llm, jnp.asarray(0.0),
            jnp.asarray(1.0), 50, spec_k=SPEC_K, chunk_len=CHUNK,
            stop_tokens=(), fuse_enabled=False, greedy=True)
        emitted.extend(int(t) for t in np.asarray(toks)[0] if t >= 0)
    fp = np.asarray(emitted[:N_GEN], np.int32)
    holes = np.random.default_rng(7).random(fp.shape) < 0.15
    draft1 = np.full((1, 512), -1, np.int32)
    draft1[0, :N_GEN] = np.where(holes, -1, fp)

    results = []
    for b in batches:
        prompt = jnp.concatenate(
            [prompt1 + jnp.bfloat16(i * 1e-3) for i in range(b)], axis=0)
        mask = jnp.ones((b, N_PROMPT), jnp.float32)
        draft = jnp.asarray(np.repeat(draft1, b, axis=0))

        def plain_run(n_ch, seed):
            stt = prefill_init(params, prompt, mask,
                               jax.random.PRNGKey(seed), cfg.llm,
                               max_len=max_len)
            for _ in range(n_ch):
                stt, _ = generate_chunk(
                    params, stt, cfg.llm, jnp.asarray(0.0),
                    jnp.asarray(1.0), 50, chunk_len=CHUNK, stop_tokens=(),
                    fuse_enabled=False, greedy=True)
            return stt.n_gen

        def spec_run(n_ch, seed):
            stt = spec_init(prefill_init(params, prompt, mask,
                                         jax.random.PRNGKey(seed), cfg.llm,
                                         max_len=max_len))
            rounds = 0
            for _ in range(n_ch):
                stt, _ = spec_generate_chunk(
                    params, stt, draft, cfg.llm, jnp.asarray(0.0),
                    jnp.asarray(1.0), 50, spec_k=SPEC_K, chunk_len=CHUNK,
                    stop_tokens=(), fuse_enabled=False, greedy=True)
            rounds = int(np.asarray(stt.rounds)[0])
            return stt.n_gen, rounds

        def two_point(run):
            for n in (1, n_chunks):
                run(n, 0)
            t1 = min(_t(run, 1, 10 + i)[0] for i in range(3))
            samples = [_t(run, n_chunks, 20 + i) for i in range(3)]
            t2, extra = min(samples)
            return t1, t2, extra

        def _t(run, n, seed):
            t0 = time.perf_counter()
            out = run(n, seed)
            jax.block_until_ready(out[0] if isinstance(out, tuple) else out)
            extra = out[1] if isinstance(out, tuple) else None
            return time.perf_counter() - t0, extra

        t1p, t2p, _ = two_point(plain_run)
        per_step_plain = (t2p - t1p) / ((n_chunks - 1) * CHUNK)
        plain_agg = b / per_step_plain

        t1s, t2s, _ = two_point(spec_run)
        n_gen, rounds = spec_run(n_chunks, 99)
        n_total = int(fetch(n_gen).sum())
        rounds_1, _r1t = spec_run(1, 98)[1], None
        d_rounds = rounds - rounds_1
        per_round = (t2s - t1s) / max(d_rounds, 1)
        emitted_pc = n_total / max(rounds, 1)        # aggregate/round
        spec_agg = emitted_pc / per_round
        cost_ratio = per_round / per_step_plain
        # spec beats plain when emitted/round > b * cost_ratio
        breakeven_per_row = cost_ratio
        rec = {
            "b": b,
            "plain_tok_s": round(plain_agg, 1),
            "spec85_tok_s": round(spec_agg, 1),
            "spec_round_ms": round(per_round * 1e3, 3),
            "plain_step_ms": round(per_step_plain * 1e3, 3),
            "cost_ratio": round(cost_ratio, 3),
            "emitted_per_round_per_row": round(emitted_pc / b, 2),
            "breakeven_accept_per_row": round(breakeven_per_row, 2),
            "spec_wins": bool(spec_agg > plain_agg),
        }
        print(json.dumps(rec), flush=True)
        results.append(rec)

    crossover = next((r["b"] for r in results if not r["spec_wins"]), None)
    print(json.dumps({"crossover_batch": crossover}))


if __name__ == "__main__":
    main()
