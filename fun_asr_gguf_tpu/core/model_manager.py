"""Resource manager: checkpoint loading + jitted program compilation.

TPU-native analogue of the reference ModelManager
(``fun_asr_gguf/core/model_manager.py``). The six init stages map as:

1. ONNX sessions            → jitted encode/CTC programs (+ warm-up compile,
                              the XLA analogue of the 60 s DML warm-up runs,
                              ``nano_onnx.py:47-73``)
2. GGUF model load          → qwen3 param pytree from decoder.gguf
3. embedding table          → host f32 copy of token_embd (``llama.py:751``)
4. llama context (KV cache) → prefill/generate jit programs, static buckets
5. CTC vocab + PromptBuilder
6. hotword manager + watcher + numpy warm-up correct("热个身")
"""

import logging
import time
from functools import partial
from pathlib import Path
from typing import Dict, Optional

import numpy as np

import jax
import jax.numpy as jnp

from ..datatypes import ASREngineConfig
from ..formats.ctc_vocab import load_ctc_tokens
from ..formats.tokenizer import load_tokenizer
from ..frontend import audio_token_length
from ..hotword.manager import get_hotword_manager
from ..models.adaptor import ctc_head_forward
from ..models.audio_encoder import (AudioEncoderConfig, audio_encoder_forward,
                                    make_frontend_constants)
from ..models.generate import generate_chunk, prefill_init
from ..models.speculative import spec_generate_chunk, spec_init
from ..models.loaders import load_checkpoint
from ..prompt_utils import PromptBuilder
from ..utils import vprint

logger = logging.getLogger("fun_asr_gguf_tpu.core")


class ModelManager:
    """Owns params, compiled programs and host-side resources."""

    def __init__(self, config: ASREngineConfig):
        self.config = config

        self.hybrid_cfg = None
        self.audio_cfg: Optional[AudioEncoderConfig] = None
        self.frontend_consts = None
        self.encoder_params = None
        self.adaptor_params = None
        self.ctc_params = None
        self.llm_params = None
        self.mesh = None               # set when config.mesh_shape is given
        self.embedding_table: Optional[np.ndarray] = None
        self.tokenizer = None
        self.eos_token = None
        self.stop_tokens = (151643, 151645)
        self.ctc_id2token: Optional[Dict[int, str]] = None
        self.prompt_builder: Optional[PromptBuilder] = None
        self.hotword_manager = None
        self.corrector = None
        self.rule_corrector = None
        self._rules_watcher = None
        self.rectification = None
        self._rectify_watcher = None

        self._compute_dtype = jnp.bfloat16 \
            if config.compute_dtype == "bfloat16" else jnp.float32
        self._ctc_fn_cache = None
        self._ctc_topk_cache = None
        self._initialized = False

    # -- static-shape policy -------------------------------------------------

    def pad_window_samples(self, n_samples: int) -> int:
        """Static audio window for a segment (pad-to-60 s analogue)."""
        base = int(self.config.segment_pad_seconds * self.config.sample_rate)
        if n_samples <= base:
            return base
        # beyond the standard window (e.g. 62 s short-path slack): round up
        # to whole seconds to bound recompilations
        return -(-n_samples // self.config.sample_rate) * self.config.sample_rate

    def prompt_bucket(self, prompt_len: int) -> int:
        for b in sorted(self.config.prefill_buckets):
            if prompt_len <= b:
                return b
        return -(-prompt_len // 128) * 128

    # -- initialization ------------------------------------------------------

    def initialize(self, verbose: bool = True) -> bool:
        if self._initialized:
            return True
        try:
            t_start = time.perf_counter()

            if self.config.compilation_cache_dir:
                # persistent XLA compile cache: cold-start warm-up drops
                # from minutes (70-layer encoder + decode programs) to
                # seconds on every restart after the first
                import os
                os.makedirs(self.config.compilation_cache_dir, exist_ok=True)
                jax.config.update("jax_compilation_cache_dir",
                                  self.config.compilation_cache_dir)
                jax.config.update(
                    "jax_persistent_cache_min_compile_time_secs", 0.5)

            vprint("[1/6] 加载模型权重 (checkpoint)...", verbose)
            ckpt = self.config.checkpoint_dir
            fmt = self.config.llm_weight_format
            # Weight-format resolution (measured on v5e, Qwen3-0.6B):
            #   int8  per-channel, XLA-native  852 tok/s  ~0.74 GB  <- auto
            #   bf16  dense                     567 tok/s  ~1.35 GB
            #   q8_0  per-block Pallas megacall (GGUF-exact bytes)
            #         ~575 tok/s (fused+unroll), ~0.98 GB
            # The reference's own decode runs 8-bit weights (q8_0 GGUF), so
            # 8-bit "auto" matches its numerics class; float32 compute mode
            # stays fully dense/exact for debugging.
            if fmt == "auto":
                fmt = ("int8" if self._compute_dtype == jnp.bfloat16
                       else "bf16")
            keep_q = (fmt == "q8_0")
            (self.hybrid_cfg, self.encoder_params, self.adaptor_params,
             self.ctc_params, self.llm_params,
             self.embedding_table) = load_checkpoint(
                ckpt, dtype=self._compute_dtype,
                llm_dtype=self._compute_dtype,
                llm_keep_quantized=keep_q)
            if keep_q:
                # q8_0 output projection too (llama.cpp quantizes
                # output.weight in its q8_0 files) — the tied-embedding
                # logits matmul is a quarter of per-token HBM traffic
                from ..models.qwen3 import quantize_lm_head
                self.llm_params = quantize_lm_head(self.llm_params,
                                                   self.hybrid_cfg.llm)
            elif (self.config.int8_lm_head
                  and self._compute_dtype == jnp.bfloat16):
                # bf16 mode: per-channel int8 head (XLA fuses the convert
                # into the dot; +6% decode). float32 mode stays exact.
                from ..models.qwen3 import quantize_lm_head_per_channel
                self.llm_params = quantize_lm_head_per_channel(
                    self.llm_params, self.hybrid_cfg.llm)
            if self.config.fuse_projections:
                from ..models.qwen3 import pack_qwen3_params
                self.llm_params = pack_qwen3_params(self.llm_params)
            if keep_q and self.config.fuse_projections:
                # q8_0 perm-space megacall decode (one Pallas call per
                # layer; sandwich norms + gelu gate ride the kernel for
                # gemma). Archs the fuse cannot express (MoE experts,
                # qwen2-family biases) keep the per-projection scan path.
                from ..models.qwen3 import fuse_qwen3_params_q8
                try:
                    if self.hybrid_cfg.llm.residual_scale != 1.0:
                        # granite: the megacall bakes plain residual
                        # adds into the kernel — scan path only
                        raise ValueError(
                            "residual_scale != 1 (granite) is not "
                            "expressible in the perm-space megacall")
                    self.llm_params = fuse_qwen3_params_q8(self.llm_params)
                except ValueError as e:
                    logger.info("q8_0 megacall fuse unavailable: %s", e)
            if fmt == "int8":
                from ..models.qwen3 import quantize_qwen3_params_int8
                # donate: free each bf16 source as it quantizes (multi-GB
                # decoders would otherwise OOM holding both copies)
                self.llm_params = quantize_qwen3_params_int8(
                    self.llm_params, donate=True)
            elif fmt == "int4":
                # experimental w4a16 (group-32 RTN): half the weight
                # bytes of int8 — see Int4Weight
                from ..models.qwen3 import quantize_qwen3_params_int4
                self.llm_params = quantize_qwen3_params_int4(
                    self.llm_params, donate=True)

            if self.config.mesh_shape:
                # Multi-chip serving: place the decoder on a ('dp','tp')
                # mesh with Megatron-TP shardings; every jitted program
                # below takes params as arguments, so GSPMD partitions the
                # prefill/decode/verify compute and inserts the ICI
                # collectives. Activations/KV inherit shardings by
                # propagation (parity: tests/test_parallel.py,
                # tests/test_engine_e2e.py::TestShardedEngine).
                from ..parallel.mesh import (make_mesh,
                                             validate_mesh_shape)
                dp, tp = validate_mesh_shape(self.config.mesh_shape, fmt)
                n_need = dp * tp
                n_avail = len(jax.devices())
                if n_need > n_avail:
                    raise ValueError(
                        f"mesh_shape dp{dp}xtp{tp} needs {n_need} devices; "
                        f"only {n_avail} visible")
                from ..parallel.sharding import shard_llm_params
                self.mesh = make_mesh(dp=dp, tp=tp,
                                      devices=jax.devices()[:n_need])
                self.llm_params = shard_llm_params(self.llm_params,
                                                   self.mesh)
                vprint(f"[1b/6] 张量并行: 解码器已切分到 dp{dp}xtp{tp} "
                       "网格", verbose)
            self.audio_cfg = AudioEncoderConfig(
                encoder=self.hybrid_cfg.encoder,
                adaptor=self.hybrid_cfg.adaptor)
            self.frontend_consts = jax.tree_util.tree_map(
                jnp.asarray, make_frontend_constants(self.audio_cfg))

            vprint("[2/6] 加载 Tokenizer...", verbose)
            tok_path = self.config.tokenizer_path or ckpt
            self.tokenizer = load_tokenizer(tok_path)
            self.eos_token = self.tokenizer.eos_token
            stop = set(self.tokenizer.stop_tokens) | {self.eos_token}
            self.stop_tokens = tuple(sorted(
                t for t in stop if t < self.hybrid_cfg.llm.vocab_size))

            vprint("[3/6] 加载 CTC 词表与 Prompt 构建器...", verbose)
            tokens_path = self.config.tokens_path or str(
                Path(ckpt) / "tokens.txt")
            self.ctc_id2token = load_ctc_tokens(tokens_path)
            probe = self.tokenizer.encode("语音转写：<|im_end|>")
            if probe and max(probe) >= self.embedding_table.shape[0]:
                raise ValueError(
                    f"tokenizer emits ids up to {max(probe)} but the "
                    f"decoder embedding table has only "
                    f"{self.embedding_table.shape[0]} rows — the "
                    "checkpoint is missing a matching tokenizer.json "
                    "(byte-tokenizer fallback needs vocab_size >= ~260)")
            self.prompt_builder = PromptBuilder(self.tokenizer,
                                                self.embedding_table)

            if self.config.warmup:
                vprint("[4/6] 编译 TPU 程序 (warm-up)...", verbose)
                self._warmup()
            else:
                vprint("[4/6] 跳过 warm-up (warmup=False): 程序首次调用时"
                       "编译", verbose)

            vprint("[5/6] 初始化热词管理器...", verbose)
            hw_path = self.config.hotwords_path
            if not hw_path:
                hw_path = str(Path(ckpt) / "hot.txt")
            self.hotword_manager = get_hotword_manager(
                hotword_file=Path(hw_path),
                threshold=1.0,
                similar_threshold=self.config.similar_threshold)
            self.hotword_manager.load()
            self.hotword_manager.start_file_watcher()
            self.corrector = self.hotword_manager.get_corrector()
            self.corrector.correct("热个身")

            # opt-in regex rule correction on the final transcript (the
            # reference ships RuleCorrector unwired, hot_rule.py; here a
            # rules_path wires it in with the same live-reload behavior
            # as hot.txt)
            from ..hotword.manager import (PollingWatcher,
                                           read_or_create_text)
            if self.config.rules_path:
                from ..hotword.hot_rule import RuleCorrector
                rules_file = Path(self.config.rules_path)
                self.rule_corrector = RuleCorrector()

                def _load_rules():
                    content = read_or_create_text(
                        rules_file, "# 每行一条规则: pattern = replacement\n")
                    if content is None:
                        # transient read error: keep current rules (same
                        # retention policy as the rectify-history reload)
                        return
                    n = self.rule_corrector.update_rules(content)
                    logger.info("rule corrections loaded: %d", n)

                _load_rules()
                self._rules_watcher = PollingWatcher(rules_file,
                                                     _load_rules)
                self._rules_watcher.start()

            # opt-in correction-history RAG (reference ships it unwired,
            # hot_rectification.py): retrieved "wrong => right" entries
            # join the LLM context per request
            if self.config.rectify_path:
                from ..hotword.hot_rectification import RectificationRAG
                self.rectification = RectificationRAG(
                    self.config.rectify_path)
                self._rectify_watcher = PollingWatcher(
                    Path(self.config.rectify_path),
                    self.rectification.load_history)
                self._rectify_watcher.start()

            vprint("[6/6] 完成。", verbose)
            self._initialized = True
            vprint(f"✓ 模型加载完成 (耗时: {time.perf_counter() - t_start:.2f}s)",
                   verbose)
            return True
        except Exception as e:
            logger.exception("initialization failed")
            vprint(f"✗ 初始化失败: {e}", verbose)
            # don't leak already-started rules/rectify watcher threads:
            # create_asr_engine raises without calling cleanup() on a
            # failed init. The hotword watcher belongs to the process
            # singleton and may serve other engines — leave it running.
            self._stop_private_watchers()
            return False

    # -- compiled entry points ----------------------------------------------

    def put_batch(self, arr, dtype=None):
        """Device-put a batch-major array, sharded over the mesh's 'dp'
        axis when one is configured and the row count divides — batched
        decoding then scales out over data-parallel chips while the 'tp'
        axis keeps sharding the weights. Falls back to an unsharded
        (replicated) array otherwise."""
        x = jnp.asarray(arr, dtype) if dtype is not None else jnp.asarray(arr)
        if self.mesh is None or x.ndim == 0:
            return x
        dp = self.mesh.shape.get("dp", 1)
        if dp <= 1:
            return x
        if x.shape[0] % dp != 0:
            # replicated fallback: no data parallelism for this batch —
            # say so once instead of silently duplicating all compute
            if not getattr(self, "_warned_dp_fallback", False):
                self._warned_dp_fallback = True
                logger.warning(
                    "batch of %d rows does not divide the dp=%d mesh "
                    "axis; running replicated (no data-parallel "
                    "speedup). Pad the batch to a multiple of %d.",
                    x.shape[0], dp, dp)
            return x
        from jax.sharding import NamedSharding, PartitionSpec as P
        spec = P(*(("dp",) + (None,) * (x.ndim - 1)))
        return jax.device_put(x, NamedSharding(self.mesh, spec))

    def encode_audio(self, audio: np.ndarray):
        """audio [n] float → (audio_embd [T_llm,llm_dim] f32 np,
        enc_output [1,T_lfr,d] device array). Mirrors
        ``nano_onnx.encode_audio`` semantics incl. the valid-length trim."""
        embd, enc, target_len = self.encode_audio_device(audio)
        audio_embd = np.asarray(embd[0, :target_len, :], dtype=np.float32)
        return audio_embd, enc

    def encode_audio_device(self, audio: np.ndarray):
        """Like :meth:`encode_audio`, but keeps the window embedding ON
        DEVICE: (embd [1, T, h] device, enc_output device, target_len).
        The streaming partial tick assembles its extension chunk on
        device, so fetching the multi-MB embedding to host (and
        re-uploading it) would be pure tunnel waste."""
        n = len(audio)
        window = self.pad_window_samples(n)
        buf = np.zeros(window, dtype=np.float32)
        buf[:n] = audio
        enc, embd, _mask = audio_encoder_forward(
            {"encoder": self.encoder_params, "adaptor": self.adaptor_params},
            self.frontend_consts,
            jnp.asarray(buf[None]), jnp.asarray([n], jnp.int32),
            cfg=self.audio_cfg, compute_dtype=self._compute_dtype)
        return embd, enc, audio_token_length(n, self.audio_cfg.frontend)

    def ctc_indices(self, enc_output) -> np.ndarray:
        """enc_output [1,T,d] → argmax indices [T] (int32, host)."""
        idx = self._ctc_fn(self.ctc_params, enc_output)
        return np.asarray(idx[0])

    def ctc_topk(self, enc_output):
        """Per-frame top-k CTC log-probs + argmax for prefix beam search:
        (vals [1,T,k], ids [1,T,k], blank_lp [1,T], argmax [1,T]) as host
        arrays — one device program covers beam candidates AND the greedy
        path (the [T, vocab] projection runs once per segment)."""
        if self._ctc_topk_cache is None:
            from ..models.adaptor import ctc_topk_forward
            self._ctc_topk_cache = jax.jit(partial(
                ctc_topk_forward, cfg=self.hybrid_cfg.ctc,
                k=self.config.ctc_beam_topk))
        vals, ids, blank, argmax = self._ctc_topk_cache(self.ctc_params,
                                                        enc_output)
        return (np.asarray(vals), np.asarray(ids), np.asarray(blank),
                np.asarray(argmax))

    @property
    def beam_recall_enabled(self) -> bool:
        """Beam search is worth running only when hotwords exist to bias
        toward / recall from (its output feeds hotword recall only)."""
        return (self.config.ctc_beam_size > 1 and self.corrector is not None
                and bool(self.corrector.hotwords))

    def prefill(self, full_embd: np.ndarray, rng_seed: int):
        """Left-pad the prompt into its bucket and run prefill."""
        p_len = full_embd.shape[0]
        bucket = self.prompt_bucket(p_len)
        llm_dim = full_embd.shape[1]
        buf = np.zeros((1, bucket, llm_dim), dtype=np.float32)
        buf[0, bucket - p_len:] = full_embd
        mask = np.zeros((1, bucket), dtype=np.float32)
        mask[0, bucket - p_len:] = 1.0
        max_len = bucket + self.config.n_predict
        if self.config.speculative:
            # every verify round writes spec_k+1 entries starting at the
            # next free slot; rejected entries need headroom to land in
            max_len += self.config.spec_k + 1
        state = prefill_init(
            self.llm_params,
            jnp.asarray(buf, self._compute_dtype),
            jnp.asarray(mask),
            jax.random.PRNGKey(rng_seed),
            self.hybrid_cfg.llm, max_len=max_len,
            kv_int8=(self.config.kv_cache_dtype == "int8"))
        return state

    def generate(self, state, temperature: float, top_p: float, top_k: int,
                 chunk_len: int, limit: Optional[int] = None):
        return generate_chunk(
            self.llm_params, state, self.hybrid_cfg.llm,
            jnp.asarray(temperature, jnp.float32),
            jnp.asarray(top_p, jnp.float32),
            top_k, chunk_len=chunk_len, stop_tokens=self.stop_tokens,
            limit=jnp.asarray(limit if limit is not None else chunk_len,
                              jnp.int32),
            greedy=(temperature <= 0))

    def make_draft_ids(self, draft_text: str) -> Optional[np.ndarray]:
        """Tokenize a CTC transcript into the static [1, D] draft buffer."""
        if not draft_text or self.tokenizer is None:
            return None
        ids = self.tokenizer.encode(draft_text)
        d = self.config.spec_draft_len
        buf = np.full((1, d), -1, dtype=np.int32)
        buf[0, :min(len(ids), d)] = ids[:d]
        return buf

    def spec_prepare(self, state):
        """GenState (from :meth:`prefill`) → speculative carry."""
        return spec_init(state)

    def spec_generate(self, state, draft_ids: np.ndarray, temperature: float,
                      top_p: float, top_k: int, chunk_len: int,
                      limit: Optional[int] = None):
        return spec_generate_chunk(
            self.llm_params, state, jnp.asarray(draft_ids),
            self.hybrid_cfg.llm,
            jnp.asarray(temperature, jnp.float32),
            jnp.asarray(top_p, jnp.float32),
            top_k, spec_k=self.config.spec_k, chunk_len=chunk_len,
            stop_tokens=self.stop_tokens,
            limit=jnp.asarray(limit if limit is not None else chunk_len,
                              jnp.int32),
            greedy=(temperature <= 0))

    # -- internals -----------------------------------------------------------

    @property
    def _ctc_fn(self):
        if self._ctc_fn_cache is None:
            self._ctc_fn_cache = jax.jit(partial(
                ctc_head_forward, cfg=self.hybrid_cfg.ctc))
        return self._ctc_fn_cache

    def _warmup(self):
        """Compile the hot programs once with representative shapes."""
        sr = self.config.sample_rate
        window = int(self.config.segment_pad_seconds * sr)
        dummy = np.zeros(min(window, sr), dtype=np.float32)
        _embd, enc = self.encode_audio(dummy)
        if self.config.enable_ctc:
            self.ctc_indices(enc)
            if self.config.ctc_beam_size > 1:
                self.ctc_topk(enc)      # compile the beam-path program too
        buckets = sorted(self.config.prefill_buckets)
        if not self.config.warmup_all_buckets:
            buckets = buckets[:1]     # fastest init; larger buckets
                                      # compile on first use
        llm_dim = self.hybrid_cfg.llm.hidden
        for bucket in buckets:
            # a bucket-length prompt compiles that bucket's prefill AND
            # its generate programs (max_len = bucket + n_predict). The
            # greedy and sampled modes are SEPARATE static jit
            # specializations (ops/sampling: static `greedy`), so warm
            # both — temperature 0.0 and the sampled default 0.4 — or the
            # first real request (default T=0.4) would pay the compile
            fake = np.zeros((bucket, llm_dim), dtype=np.float32)
            for temp in (0.0, 0.4):
                state = self.prefill(fake, rng_seed=0)
                if self.config.speculative and self.config.enable_ctc:
                    draft = np.full((1, self.config.spec_draft_len), -1,
                                    dtype=np.int32)
                    sstate, _tokens = self.spec_generate(
                        self.spec_prepare(state), draft, temperature=temp,
                        top_p=1.0, top_k=50,
                        chunk_len=self._default_chunk_len(), limit=1)
                    jax.block_until_ready(sstate.logits)
                    # the acceptance guardrail continues a spec state with
                    # the PLAIN chunk program (bigger KV buffer than the
                    # plain prefill below) — warm that specialization too
                    from ..models.speculative import spec_to_gen
                    gstate, _tokens = self.generate(
                        spec_to_gen(sstate), temperature=temp, top_p=1.0,
                        top_k=50, chunk_len=self._default_chunk_len(),
                        limit=1)
                    jax.block_until_ready(gstate.logits)
                    state = self.prefill(fake, rng_seed=0)  # spec donated it
                state, _tokens = self.generate(
                    state, temperature=temp, top_p=1.0, top_k=50,
                    chunk_len=self._default_chunk_len())
                jax.block_until_ready(state.logits)

    def _default_chunk_len(self) -> int:
        # compile cost grows superlinearly with the chunk program's buffer;
        # 64 balances dispatch amortization vs compile time
        return min(64, self.config.n_predict)

    def _stop_private_watchers(self):
        if self._rules_watcher:
            self._rules_watcher.stop()
            self._rules_watcher = None
        if self._rectify_watcher:
            self._rectify_watcher.stop()
            self._rectify_watcher = None

    def _stop_watchers(self):
        if self.hotword_manager:
            self.hotword_manager.stop_file_watcher()
        self._stop_private_watchers()

    # -- opt-in text-correction hooks (shared by the single-stream and
    #    batched decoders so the two paths cannot drift) -------------------

    def augment_context(self, context, draft_text):
        """Join retrieved correction-history entries (rectify_path) to the
        per-request LLM context; no-op when the RAG is off or finds
        nothing."""
        if self.rectification is None or not draft_text:
            return context
        block = self.rectification.format_prompt(draft_text)
        if not block:
            return context
        return f"{context}\n{block}" if context else block

    def apply_rules(self, text: str) -> str:
        """Apply regex rule corrections (rules_path) to a final
        transcript; identity when the corrector is off."""
        if self.rule_corrector is None:
            return text
        return self.rule_corrector.substitute(text)

    def cleanup(self):
        self._stop_watchers()
        self.encoder_params = None
        self.adaptor_params = None
        self.ctc_params = None
        self.llm_params = None
        self._initialized = False
        print("[ASR] 资源已释放")
