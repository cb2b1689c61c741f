"""Model components: SANM encoder, transformer adaptor, CTC head, Qwen3 LLM."""

from .config import (AdaptorConfig, CTCHeadConfig, EncoderConfig,
                     HybridConfig, Qwen3Config)  # noqa: F401
