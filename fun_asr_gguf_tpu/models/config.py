"""Model architecture configs.

Shapes are taken from the reference model definitions (see
``fun_asr_gguf/model_definition.py:191-229`` for the encoder stack and
``03-Export-Decoder-GGUF.py`` + HF Qwen3-0.6B for the decoder); every config
has a ``tiny()`` constructor so the full pipeline is testable on CPU without
model artifacts.
"""

from dataclasses import dataclass, field


@dataclass(frozen=True)
class EncoderConfig:
    """SenseVoiceEncoderSmall (``model_definition.py:191-214``)."""
    input_size: int = 560
    d_model: int = 512
    heads: int = 4
    ffn_dim: int = 2048
    num_blocks: int = 50        # 1 input block (560->512) + 49 at 512
    tp_blocks: int = 20
    kernel_size: int = 11
    ln_eps: float = 1e-5
    # Pallas online-softmax attention: None = auto (on TPU for batch ≥ 2,
    # where XLA's materialized [B,H,T,T] scores thrash HBM — measured
    # 113 → 52 ms for the batch-8 60 s encode on v5e — while at B=1 XLA's
    # fused attention still wins, 7.2 vs 10.0 ms: isolated per-layer
    # attention time is EQUAL, the gap is ~70 scanned Pallas call
    # overheads that only pay for themselves once score traffic
    # dominates); True/False force it.
    use_flash_attention: "bool | None" = None

    @staticmethod
    def tiny(input_size: int = 560):
        return EncoderConfig(input_size=input_size, d_model=64, heads=4,
                             ffn_dim=128, num_blocks=2, tp_blocks=1,
                             kernel_size=11)


@dataclass(frozen=True)
class AdaptorConfig:
    """CorrectTransformerAdaptor (``model_definition.py:165-185``)."""
    in_dim: int = 512
    out_dim: int = 1024
    ffn_dim: int = 2048         # projection hidden
    n_layers: int = 2
    heads: int = 8
    downsample: int = 1
    ln_eps: float = 1e-12

    @property
    def block_ffn_dim(self) -> int:
        # PositionwiseFeedForward(llm_dim, llm_dim // 4) in the blocks
        return self.out_dim // 4

    @staticmethod
    def tiny(in_dim: int = 64, out_dim: int = 96):
        return AdaptorConfig(in_dim=in_dim, out_dim=out_dim, ffn_dim=128,
                             n_layers=1, heads=4)


@dataclass(frozen=True)
class CTCHeadConfig:
    """ctc_decoder adaptor (512->512, 5 layers) + linear to vocab
    (``model_definition.py:216-229``)."""
    adaptor: AdaptorConfig = field(default_factory=lambda: AdaptorConfig(
        in_dim=512, out_dim=512, ffn_dim=2048, n_layers=5, heads=8))
    vocab_size: int = 60515

    @staticmethod
    def tiny(d: int = 64, vocab_size: int = 101):
        return CTCHeadConfig(
            adaptor=AdaptorConfig(in_dim=d, out_dim=d, ffn_dim=128,
                                  n_layers=1, heads=4),
            vocab_size=vocab_size)


@dataclass(frozen=True)
class Qwen3Config:
    """Llama-family decoder config; defaults are Qwen3-0.6B (HF config
    referenced by ``03-Export…py:14``).

    The same dataclass describes the whole GGUF "llama-class" family the
    reference's llama.dll can load (``llama.py:417`` loads any arch):
    ``arch``/``qk_norm``/``attn_bias`` select the per-arch differences —
    qwen3 (qk-RMSNorm, no biases), qwen2 (q/k/v biases, no qk-norm),
    llama/mistral (neither).
    """
    hidden: int = 1024
    n_layers: int = 28
    q_heads: int = 16
    kv_heads: int = 8
    head_dim: int = 128
    ffn_dim: int = 3072
    vocab_size: int = 151936
    rope_theta: float = 1e6
    rms_eps: float = 1e-6
    tie_embeddings: bool = True
    max_position: int = 40960
    arch: str = "qwen3"          # GGUF general.architecture on export
    qk_norm: bool = True         # per-head RMSNorm on q/k (qwen3, gemma-like)
    attn_bias: bool = False      # q/k/v projection biases (qwen2 family)
    # -- sparse MoE MLP (Qwen3-MoE family; reference converter registers
    # Qwen3MoeForCausalLM at convert_hf_to_gguf.py:4328) --
    n_experts: int = 0           # 0 = dense MLP
    n_experts_per_tok: int = 0   # router top-k
    moe_ffn_dim: int = 0         # per-expert intermediate size
    norm_topk_prob: bool = True  # renormalize the top-k routing probs
    # -- Gemma family (gemma3 text; reference converter registers
    # Gemma3Model at convert_hf_to_gguf.py:5896). Norm weights are
    # stored SHIFTED (+1, the llama.cpp GGUF convention), so rms_norm
    # stays the plain multiply everywhere. --
    post_norms: bool = False      # sandwich norms (post-attn + post-ffn)
    act: str = "silu"             # MLP gate activation; gemma: gelu_tanh
    embed_scale: float = 1.0      # gemma scales embeddings by sqrt(hidden)
    attn_scale: float = 0.0       # 0 → head_dim**-0.5; gemma3:
    #                               query_pre_attn_scalar**-0.5
    sliding_window: int = 0       # 0 = all layers attend globally
    sliding_pattern: int = 0      # every Nth layer is global (gemma3: 6)
    rope_local_theta: float = 1e4  # sliding layers' rope base
    rope_global_scale: float = 1.0  # linear position scale, global layers
    final_softcap: float = 0.0    # cap·tanh(logits/cap) when > 0

    @property
    def is_moe(self) -> bool:
        return self.n_experts > 0

    @staticmethod
    def tiny(vocab_size: int = 512):
        return Qwen3Config(hidden=64, n_layers=2, q_heads=4, kv_heads=2,
                           head_dim=16, ffn_dim=128, vocab_size=vocab_size,
                           rope_theta=1e4)

    @staticmethod
    def tiny_moe(vocab_size: int = 512, n_experts: int = 8,
                 n_experts_per_tok: int = 2):
        """Qwen3-MoE-shaped tiny config (softmax top-k router, no shared
        expert, qk-norm like dense qwen3)."""
        return Qwen3Config(hidden=64, n_layers=2, q_heads=4, kv_heads=2,
                           head_dim=16, ffn_dim=128, vocab_size=vocab_size,
                           rope_theta=1e4, arch="qwen3moe",
                           n_experts=n_experts,
                           n_experts_per_tok=n_experts_per_tok,
                           moe_ffn_dim=96)

    @staticmethod
    def tiny_qwen2(vocab_size: int = 512):
        """Qwen2/Qwen2.5-shaped tiny config (biases, no qk-norm)."""
        return Qwen3Config(hidden=64, n_layers=2, q_heads=4, kv_heads=2,
                           head_dim=16, ffn_dim=128, vocab_size=vocab_size,
                           rope_theta=1e4, arch="qwen2", qk_norm=False,
                           attn_bias=True)

    @staticmethod
    def tiny_llama(vocab_size: int = 512):
        """Llama/Mistral-shaped tiny config (no biases, no qk-norm)."""
        return Qwen3Config(hidden=64, n_layers=2, q_heads=4, kv_heads=2,
                           head_dim=16, ffn_dim=128, vocab_size=vocab_size,
                           rope_theta=1e4, arch="llama", qk_norm=False,
                           attn_bias=False)

    # -- stretch decoder presets (BASELINE.json configs[4]: larger
    # Qwen-class audio-LLM decoders with int8 TP across a TPU mesh) --

    @staticmethod
    def qwen3_1_7b():
        return Qwen3Config(hidden=2048, n_layers=28, q_heads=16, kv_heads=8,
                           head_dim=128, ffn_dim=6144, vocab_size=151936)

    @staticmethod
    def qwen3_4b():
        return Qwen3Config(hidden=2560, n_layers=36, q_heads=32, kv_heads=8,
                           head_dim=128, ffn_dim=9728, vocab_size=151936)

    @staticmethod
    def qwen3_30b_a3b():
        """Qwen3-30B-A3B MoE decoder (128 experts, top-8, 3B active) —
        the expert-parallel stretch config."""
        return Qwen3Config(hidden=2048, n_layers=48, q_heads=32, kv_heads=4,
                           head_dim=128, ffn_dim=6144, vocab_size=151936,
                           arch="qwen3moe", n_experts=128,
                           n_experts_per_tok=8, moe_ffn_dim=768)

    @staticmethod
    def gemma3_1b():
        """Gemma3-1B text decoder (HF google/gemma-3-1b-pt hparams)."""
        return Qwen3Config(
            hidden=1152, n_layers=26, q_heads=4, kv_heads=1, head_dim=256,
            ffn_dim=6912, vocab_size=262144, rope_theta=1e6,
            max_position=32768, arch="gemma3", qk_norm=True,
            post_norms=True, act="gelu_tanh", embed_scale=1152.0 ** 0.5,
            attn_scale=256.0 ** -0.5, sliding_window=512,
            sliding_pattern=6, rope_local_theta=1e4)

    @staticmethod
    def gemma3_4b():
        """Gemma3-4B text decoder (HF google/gemma-3-4b-pt text tower;
        global layers use 8x linear rope scaling)."""
        return Qwen3Config(
            hidden=2560, n_layers=34, q_heads=8, kv_heads=4, head_dim=256,
            ffn_dim=10240, vocab_size=262208, rope_theta=1e6,
            max_position=131072, arch="gemma3", qk_norm=True,
            post_norms=True, act="gelu_tanh", embed_scale=2560.0 ** 0.5,
            attn_scale=256.0 ** -0.5, sliding_window=1024,
            sliding_pattern=6, rope_local_theta=1e4,
            rope_global_scale=8.0)


@dataclass(frozen=True)
class HybridConfig:
    """Full Fun-ASR-Nano stack (``model_definition.py:223-229``)."""
    encoder: EncoderConfig = field(default_factory=EncoderConfig)
    adaptor: AdaptorConfig = field(default_factory=AdaptorConfig)
    ctc: CTCHeadConfig = field(default_factory=CTCHeadConfig)
    llm: Qwen3Config = field(default_factory=Qwen3Config)

    @staticmethod
    def tiny(ctc_vocab: int = 101, llm_vocab: int = 512):
        enc = EncoderConfig.tiny()
        llm = Qwen3Config.tiny(vocab_size=llm_vocab)
        return HybridConfig(
            encoder=enc,
            # adaptor output dim must match the LLM embedding width
            adaptor=AdaptorConfig.tiny(in_dim=enc.d_model, out_dim=llm.hidden),
            ctc=CTCHeadConfig.tiny(d=enc.d_model, vocab_size=ctc_vocab),
            llm=llm)
