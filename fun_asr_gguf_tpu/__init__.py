"""fun_asr_gguf_tpu: a TPU-native JAX/XLA/Pallas ASR engine.

A from-scratch rebuild of the capabilities of Fun-ASR-GGUF (reference:
``fun_asr_gguf/__init__.py``): a local hybrid-inference ASR pipeline for
Fun-ASR-Nano (SenseVoice encoder + CTC head + Qwen3-0.6B LLM decoder).
The reference splits the model across onnxruntime and llama.cpp; here the
whole compute path is a set of jitted JAX programs with Pallas TPU kernels,
while keeping the same public API surface (sherpa-onnx compatible):

    engine = create_asr_engine(checkpoint_dir=...)
    result = engine.transcribe("audio.wav")

Logging mirrors the reference's behavior (reference
``fun_asr_gguf/__init__.py:13-48``): a package root logger writing DEBUG
logs to ``logs/latest.log``.
"""

import logging
import os

__version__ = "0.1.0"


def _ensure_tpu_compile_env():
    """Raise the TPU compiler's scoped-VMEM budget for the fused q8_0
    megacall kernels (ops/quant_matmul.py): one layer's full weight set
    (~21 MB int8 + scales) must be resident in a single Pallas grid step,
    above the 16 MB default limit. v5e has 128 MB of physical VMEM.

    Set via LIBTPU_INIT_ARGS (parsed only by libtpu) rather than
    XLA_FLAGS, which a CPU-only jaxlib would reject as an unknown flag.
    Must run before the TPU backend initializes — importing this package
    before triggering any JAX compilation is sufficient."""
    flag = "--xla_tpu_scoped_vmem_limit_kib=65536"
    args = os.environ.get("LIBTPU_INIT_ARGS", "")
    if "xla_tpu_scoped_vmem_limit_kib" not in args:
        os.environ["LIBTPU_INIT_ARGS"] = (args + " " + flag).strip()


_ensure_tpu_compile_env()


def setup_logging(level: int = logging.WARNING,
                  log_file: str = os.path.join("logs", "latest.log")):
    """Configure the package root logger (file handler at DEBUG)."""
    root_logger = logging.getLogger("fun_asr_gguf_tpu")
    root_logger.setLevel(logging.DEBUG)
    root_logger.handlers.clear()

    if log_file:
        log_dir = os.path.dirname(log_file)
        try:
            if log_dir:
                os.makedirs(log_dir, exist_ok=True)
            file_handler = logging.FileHandler(log_file, mode="w", encoding="utf-8")
        except OSError:
            return root_logger  # read-only cwd: stay handler-less
        file_handler.setLevel(logging.DEBUG)
        file_handler.setFormatter(logging.Formatter(
            fmt="%(asctime)s - %(name)s - %(levelname)s - %(message)s"))
        root_logger.addHandler(file_handler)

    return root_logger


logger = setup_logging(level=logging.WARNING)

from .datatypes import (  # noqa: E402
    RecognitionResult,
    RecognitionStream,
    TranscriptionResult,
    DecodeResult,
    LLMDecodeResult,
    Timings,
    ASREngineConfig,
    Statistics,
    CTCResult,
)
# The engine pulls in the full JAX model stack; import it lazily (PEP 562)
# so format-only consumers (gguf_split/gguf_edit/tokenize CLIs, readers)
# don't initialize a JAX backend — on this platform that dials the remote
# TPU tunnel — just to touch a file format.
_LAZY_ENGINE = {"FunASREngine", "create_asr_engine"}


def __getattr__(name):
    if name in _LAZY_ENGINE:
        from . import engine
        return getattr(engine, name)
    raise AttributeError(f"module {__name__!r} has no attribute {name!r}")


def __dir__():
    return sorted(list(globals()) + list(_LAZY_ENGINE))


__all__ = [
    "logger",
    "setup_logging",
    "FunASREngine",
    "create_asr_engine",
    "RecognitionResult",
    "RecognitionStream",
    "TranscriptionResult",
    "DecodeResult",
    "LLMDecodeResult",
    "Timings",
    "ASREngineConfig",
    "Statistics",
    "CTCResult",
]
